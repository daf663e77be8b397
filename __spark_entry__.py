"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` / ``oracle_sql()`` expose every declared operator key
from SURVEY.md §2 for the driver's DuckDB hash-match at sf0.01.
Registration lives in :mod:`hadoop_tools_spark.registry`; operator
modules are pulled in via :mod:`hadoop_tools_spark.all_queries`.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_tools_spark import all_queries, registry  # noqa: E402
from hadoop_tools_spark.session import ensure_session_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _driver_verdicts() -> dict[str, bool]:
    """Latest driver verdict per key across every ``CORRECTNESS_r*.json``.

    Maps key -> True (last driver sample succeeded) or False (last sample
    FAILED: hash mismatch, row/schema mismatch, or a hard error). Keys the
    driver has never sampled are absent. Rounds are merged in filename
    order so the most recent round's verdict wins — a key that failed in
    r2 and passed in r3 counts as green, and vice versa. Rows-only keys
    (``err == "no_oracle"``) count as green when the driver got rows back.
    """
    verdicts: dict[str, bool] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue  # unreadable round file: skip, never break the driver
        for key, row in rows.items():
            if not isinstance(row, dict):
                verdicts[key] = True  # legacy shape: treat as sampled-green
                continue
            err = row.get("err")
            if err == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    err is None
                    and row.get("hash_match") is True
                    and row.get("rows_match") is True
                    and row.get("schema_match") is True
                )
            verdicts[key] = bool(ok)
    return verdicts


def _ordered_keys() -> list[str]:
    """Coverage-maximising order for the driver's capped key sample.

    Tiering (driver samples a prefix of this list): keys whose *latest*
    driver sample FAILED rank FIRST (a known-bad verdict is worse than
    no verdict — their repairs need driver re-confirmation NOW), then
    never-sampled keys (oracle'd before rows-only), then already-green
    keys. Round-4 lesson: with 60 never-sampled keys queued ahead, the
    old never-sampled-first order starved three repaired keys at
    positions 61–63 for three consecutive rounds.

    Stale-green policy: a green key whose implementing module later
    changed is NOT re-ranked here; instead every round re-verifies ALL
    oracle'd keys locally via ``tools/verify_local.py`` (same comparator
    as the driver), so regressions surface locally even when the driver
    sample misses them.
    """
    verdicts = _driver_verdicts()

    def rank(key: str) -> tuple[int, str]:
        has_oracle = key in registry.ORACLES
        if key in verdicts and not verdicts[key]:
            tier = 0  # last driver sample FAILED: re-confirm the repair
        elif key not in verdicts:
            tier = 1 if has_oracle else 2  # fresh coverage next
        elif has_oracle:
            tier = 3  # already green with oracle
        else:
            tier = 4  # already green, rows-only
        return (tier, key)

    return sorted(registry.QUERIES, key=rank)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_confs(spark)
    return registry.QUERIES[all_queries.FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {k: wrap(registry.QUERIES[k]) for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI SQL per query key (pre-registered fixture views)."""
    return dict(registry.ORACLES)
