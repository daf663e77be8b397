"""Arbitrary stateful streaming (SURVEY.md §2.D: `applyInPandasWithState`).

Per-user running aggregates maintained in the state store across
micro-batches — the custom-operator escape hatch when windowed
built-ins can't express the state machine. The final emitted state
must equal the batch groupBy (`stream_state_running`), asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_us long"


def _fold(pdfs, n: int, total: float, last_us: int):
    """Accumulate (count, value sum, max event-time µs) over the
    Arrow batches of one key — the state-machine body shared by BOTH
    engine paths (applyInPandasWithState and transformWithState), so
    a fix to the fold can never reach only one of them."""
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(batch_max.value // 1000))
    return n, total, last_us


def _emit(user_id, n: int, total: float, last_us: int) -> pd.DataFrame:
    """One output row. ``last_us == 0`` means no non-null ts was EVER
    observed for this key — emit NULL exactly like the batch
    ``MAX(ts)`` would, not a fabricated 1970 epoch instant."""
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us else pd.NaT],
        }
    )


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    n, total, last_us = _fold(pdfs, n, total, last_us)
    state.update((n, total, last_us))
    yield _emit(user_id, n, total, last_us)


def running_user_stats(stream_events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum, last event time).

    State is one tiny tuple per user — bounded by user cardinality;
    a production deployment adds a timeout
    (GroupStateTimeout.EventTimeTimeout) to expire idle users, which
    is what bounds state at 100 TB event volume.
    """
    return (
        stream_events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _require_rocksdb(stream_events: DataFrame) -> None:
    """transformWithStateInPandas precondition, stated once for all
    three operators: it keeps each state variable in its own column
    family, which only RocksDBStateStoreProvider supports. The
    provider is a session-wide default (session.py _RUNTIME_CONFS)
    set BEFORE any streaming query starts; it is deliberately not
    mutated here — flipping it mid-session would break restore of
    checkpoints created under the previous provider — so a session
    built without it fails fast instead of silently reconfiguring
    its sibling queries."""
    provider = stream_events.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDBStateStoreProvider" not in provider:
        raise RuntimeError(
            "transformWithStateInPandas needs the RocksDB state store; "
            "set spark.sql.streaming.stateStore.providerClass to "
            "RocksDBStateStoreProvider in the session builder (before "
            "any streaming query starts), e.g. via "
            "hadoop_tools_spark.session.get_spark/ensure_session_confs."
        )


class RunningUserStats:
    """Spark 4.x-native stateful operator (`transformWithStateInPandas`,
    the successor to `applyInPandasWithState`): same per-user running
    (count, sum, last-ts) state machine, expressed as a
    StatefulProcessor with typed ValueState.

    Declared lazily as a subclass factory because importing
    StatefulProcessor at module import time would couple every batch
    query to the streaming API surface.
    """

    @staticmethod
    def build():
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class _P(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._agg = handle.getValueState("agg", STATE_SCHEMA)

            def handleInputRows(self, key, rows, timerValues):
                (user_id,) = key
                n, total, last_us = (
                    self._agg.get() if self._agg.exists() else (0, 0.0, 0)
                )
                n, total, last_us = _fold(rows, n, total, last_us)
                self._agg.update((n, total, last_us))
                yield _emit(user_id, n, total, last_us)

            def close(self) -> None:
                pass

        return _P()


def running_user_stats_tws(stream_events: DataFrame) -> DataFrame:
    """`running_user_stats` on the 4.x transformWithState engine.

    Functionally identical to the applyInPandasWithState path; kept as
    a second implementation because transformWithState is where new
    state features land (typed state, TTL, timers, initial state) and
    the RocksDB state-store backend it requires is the 100 TB choice.

    Requires ``google.protobuf`` at runtime (the Python state client
    speaks protobuf to the JVM state server — ``compat.ensure_protobuf``
    wires in a vendored runtime when pip is unavailable) and the
    RocksDB state store provider (transformWithState keeps each state
    variable in its own column family, which HDFSBackedStateStoreProvider
    doesn't support). The provider is a session-wide default
    (session.py `_RUNTIME_CONFS`) set before any streaming query
    starts; it is deliberately NOT mutated here — flipping the provider
    mid-session would break restore of checkpoints created under the
    previous provider — so a session built without it fails fast below
    instead of silently reconfiguring its sibling queries.
    """
    _require_rocksdb(stream_events)
    return (
        stream_events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserStats.build(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


ALERT_SCHEMA = "user_id long, last_ts timestamp"

_LAST_SCHEMA = "last_us long"


class InactivityAlert:
    """Event-time TIMER stateful operator: emit (user, last_ts) once a
    user has been silent for ``gap_s`` seconds of event time.

    The timer API is the piece `transformWithState` adds over plain
    windowed aggregation: per-key expirations fire when the WATERMARK
    crosses the registered event-time instant — no busy polling and no
    per-row scan of idle keys, which is what makes 10^9-key inactivity
    detection feasible (state store holds one (key → last_ts, timer)
    pair per user; eviction happens on fire).

    Per batch: update last-seen, cancel the previous timer, register
    ``last_ts + gap_s``. On expiry: emit the alert and clear state —
    a user heard from again later starts a fresh session.
    """

    def __init__(self, gap_s: int):
        self.gap_s = gap_s

    def build(self):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        gap_us = self.gap_s * 1_000_000

        class _P(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._handle = handle
                self._last = handle.getValueState("last", _LAST_SCHEMA)

            def handleInputRows(self, key, rows, timerValues):
                last_us = (
                    self._last.get()[0] if self._last.exists() else 0
                )
                for pdf in rows:
                    mx = pdf["ts"].max()
                    if pd.notna(mx):
                        last_us = max(last_us, int(mx.value // 1000))
                if self._last.exists():
                    # materialize before deleting: mutating the timer set
                    # while the protobuf-backed iterator is open is UB
                    for t in list(self._handle.listTimers()):
                        self._handle.deleteTimer(t)
                self._last.update((last_us,))
                self._handle.registerTimer((last_us + gap_us) // 1000)
                return iter(())

            def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
                (user_id,) = key
                if self._last.exists():
                    last_us = self._last.get()[0]
                    self._last.clear()
                    yield pd.DataFrame(
                        {
                            "user_id": [user_id],
                            "last_ts": [pd.Timestamp(last_us * 1000)],
                        }
                    )

            def close(self) -> None:
                pass

        return _P()


def inactivity_alerts(
    stream_events: DataFrame,
    gap_s: int = 1800,
    delay: str = "0 seconds",
) -> DataFrame:
    """Users silent for ``gap_s`` seconds of event time (timer-fired).

    ``delay`` is the watermark lateness allowance and belongs to the
    CALLER's knowledge of source disorder, not hardcoded here: with
    the ``0 seconds`` default any event whose ts trails a previous
    micro-batch's max is dropped BEFORE the stateful operator (fine
    for in-order replays like the staged-file tests; a real disordered
    source should pass its out-of-orderness bound, e.g.
    ``"30 seconds"``, at the cost of alerts firing that much later in
    watermark time)."""
    _require_rocksdb(stream_events)
    return (
        stream_events.select("user_id", "ts")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=InactivityAlert(gap_s).build(),
            outputStructType=ALERT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


TYPECOUNT_SCHEMA = "user_id long, event_type string, n long"


class PerTypeCounts:
    """Typed MapState operator: per-user map event_type -> count.

    Complements the ValueState (RunningUserStats) and timer
    (InactivityAlert) operators with the third state primitive:
    MapState gives per-subkey point updates without rewriting the
    whole value — at 100 TB a user's map updates touch only the
    changed type's entry in RocksDB, not a serialized blob of all
    types (which a ValueState of a dict would).
    """

    @staticmethod
    def build():
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class _P(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._counts = handle.getMapState(
                    "counts", "key string", "n long"
                )

            def handleInputRows(self, key, rows, timerValues):
                (user_id,) = key
                for pdf in rows:
                    for et, cnt in pdf["event_type"].value_counts().items():
                        # getValue returns None for a missing key: one
                        # state-server round-trip per type instead of
                        # the containsKey+getValue pair
                        prev = self._counts.getValue((et,))
                        self._counts.updateValue(
                            (et,), ((prev[0] if prev else 0) + int(cnt),)
                        )
                # iterator() streams (key, value) pairs in batched
                # fetches — keys() + a getValue per key cost ~2x the
                # proto chatter for the same emission
                out = sorted(
                    (k[0], v[0]) for k, v in self._counts.iterator()
                )
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(out),
                        "event_type": [k for k, _ in out],
                        "n": [n for _, n in out],
                    }
                )

            def close(self) -> None:
                pass

        return _P()


def per_type_counts(stream_events: DataFrame) -> DataFrame:
    """Running per-(user, type) counts via MapState."""
    _require_rocksdb(stream_events)
    return (
        stream_events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=PerTypeCounts.build(),
            outputStructType=TYPECOUNT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
