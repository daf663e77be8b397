"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` / ``oracle_sql()`` expose every declared operator key
from SURVEY.md §2 for the driver's DuckDB hash-match at sf0.01.
Registration lives in :mod:`hadoop_tools_spark.registry`; operator
modules are pulled in via :mod:`hadoop_tools_spark.all_queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_tools_spark import all_queries, registry  # noqa: E402
from hadoop_tools_spark.session import ensure_session_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


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

    return {k: wrap(fn) for k, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI SQL per query key (pre-registered fixture views)."""
    return dict(registry.ORACLES)
