"""Streaming state-store scale rehearsal (VERDICT r10 "What's missing"
#4): drive a watermarked windowed aggregation over a LARGE keyspace,
batch by batch, and record the state operator's own metrics — state
rows, state memory, rows removed — to show the watermark actually
BOUNDS state (rows plateau and eviction fires) instead of arguing it
from the docs.

Protocol: one parquet file set per micro-batch is dropped into the
watched directory, then ``processAllAvailable()`` drains it — so each
recorded progress corresponds to exactly one batch of ``STATE_KEYS``
users whose event time advances one window per batch. With watermark =
1 window, windows close one batch later; steady state carries ~2
windows of keys (the open window + the not-yet-evicted previous one)
no matter how many batches run. An unbounded-state bug shows up as a
monotone numRowsTotal ramp; eviction shows as numRowsRemoved > 0.

The session's RocksDB state-store provider (session.py) is exercised
as configured — per-batch metrics come from
``query.lastProgress["stateOperators"]``, the same numbers a
production SQL-metrics scrape would alert on.

Usage: python tools/rehearse_state.py [n_keys] [n_batches]
Prints one JSON line per batch + a summary verdict line; exit 1 if
state grows unbounded (last-batch rows > 2.5x single-batch keyspace)
or eviction never fires.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

BASE = "/tmp/hts_state_rehearsal"
T0 = 1_700_000_000  # fixed epoch anchor
WINDOW_S = 300


def main() -> int:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from hadoop_tools_spark.session import get_spark

    spark = get_spark("state-rehearsal")
    shutil.rmtree(BASE, ignore_errors=True)
    watch = os.path.join(BASE, "watch")
    os.makedirs(watch)

    def batch_df(b: int):
        # every key appears every batch; event time advances one
        # window per batch so watermark (= 1 window) closes the
        # previous batch's windows
        return spark.range(n_keys).select(
            F.col("id").alias("user_id"),
            F.to_timestamp(
                F.lit(T0 + b * WINDOW_S) + F.col("id") % 60
            ).alias("ts"),
        )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(watch)
        .withWatermark("ts", f"{WINDOW_S} seconds")
        .groupBy(F.window("ts", f"{WINDOW_S} seconds"), "user_id")
        .count()
    )
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(lambda df, _bid: df.foreachPartition(lambda it: None))
        .option("checkpointLocation", os.path.join(BASE, "ckpt"))
        .start()
    )
    rows_seen = []
    removed_total = 0
    try:
        for b in range(n_batches):
            staged = os.path.join(BASE, f"stage_{b}")
            batch_df(b).coalesce(2).write.mode("overwrite").parquet(staged)
            for fn in os.listdir(staged):
                if fn.endswith(".parquet"):
                    os.rename(
                        os.path.join(staged, fn),
                        os.path.join(watch, f"b{b:03d}-{fn}"),
                    )
            t0 = time.time()
            q.processAllAvailable()
            wall = time.time() - t0
            p = q.lastProgress
            so = (p.get("stateOperators") or [{}])[0]
            rec = {
                "batch": b,
                "wall_s": round(wall, 2),
                "state_rows": so.get("numRowsTotal"),
                "rows_updated": so.get("numRowsUpdated"),
                "rows_removed": so.get("numRowsRemoved"),
                "state_mem_mb": round(
                    (so.get("memoryUsedBytes") or 0) / 1048576, 1
                ),
                "watermark": p.get("eventTime", {}).get("watermark"),
            }
            rows_seen.append(rec["state_rows"] or 0)
            removed_total += rec["rows_removed"] or 0
            print(json.dumps(rec), flush=True)
    finally:
        q.stop()

    bounded = rows_seen[-1] <= 2.5 * n_keys
    evicted = removed_total > 0
    print(json.dumps({
        "n_keys": n_keys,
        "n_batches": n_batches,
        "max_state_rows": max(rows_seen),
        "last_state_rows": rows_seen[-1],
        "rows_removed_total": removed_total,
        "state_bounded": bounded,
        "eviction_fired": evicted,
        "provider": spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        ).rsplit(".", 1)[-1],
    }), flush=True)
    return 0 if (bounded and evicted) else 1


if __name__ == "__main__":
    sys.exit(main())
