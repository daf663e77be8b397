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

#: keys already hash-verified (or attempted) by the driver in round 1
#: (CORRECTNESS_r01.json). The driver samples the first N entries of
#: ``queries()``, so keys *not* yet driver-verified are ordered first —
#: oracle'd ones before rows-only ones — to maximise fresh coverage.
#: Later rounds are merged in dynamically from CORRECTNESS_r*.json (see
#: ``_driver_covered``) so this literal only needs to cover round 1.
R01_DRIVER_COVERED = frozenset(
    {
        "fn_string", "fn_datetime", "fn_math", "fn_cond", "fn_array",
        "fn_map", "fn_json", "fn_hash", "fn_hash_engine", "fn_bitwise",
        "udf_scalar", "udf_pandas", "udaf_grouped", "udtf_shingles",
        "agg_basic", "agg_distinct", "agg_approx_distinct",
        "agg_approx_median", "agg_stats", "agg_median", "agg_collect",
        "agg_rollup", "agg_cube", "agg_pivot",
        "fs_ls", "fs_find", "fs_du", "fs_cat_text", "fs_du_rollup",
        "join_inner", "join_outer", "join_semi", "join_anti",
        "join_broadcast", "join_theta", "join_range", "join_asof",
        "join_salted", "join_range_bucketed",
        "llm_dedup_exact", "llm_neardup_pairs", "llm_neardup_minhash",
        "llm_jaccard_ngram", "llm_neardup_lsh", "llm_dup_cluster",
        "llm_neardup_verified", "llm_knn_exact", "llm_knn_numpy",
        "llm_knn_lsh", "llm_embed_neardup",
    }
)


def _driver_covered() -> frozenset[str]:
    """Union of every key any past driver round has already sampled.

    Reads all ``CORRECTNESS_r*.json`` files next to this module so new
    rounds extend coverage automatically — no per-round literal edits.
    """
    covered = set(R01_DRIVER_COVERED)
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path, encoding="utf-8") as fh:
                covered.update(json.load(fh))
        except (OSError, ValueError):
            continue  # unreadable round file: skip, never break the driver
    return frozenset(covered)


def _ordered_keys() -> list[str]:
    """Coverage-maximising order for the driver's capped key sample."""
    driver_covered = _driver_covered()

    def rank(key: str) -> tuple[int, str]:
        covered = key in driver_covered
        has_oracle = key in registry.ORACLES
        if not covered and has_oracle:
            tier = 0  # fresh hash-matchable coverage first
        elif not covered:
            tier = 1  # fresh rows-only coverage
        elif has_oracle:
            tier = 2  # already green with oracle
        else:
            tier = 3  # already attempted, no oracle possible
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
