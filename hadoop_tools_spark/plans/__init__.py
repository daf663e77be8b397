"""Physical-plan inspection (SURVEY.md §4).

The engine writes declarative plans and lets Catalyst pick the
physical strategy — these helpers make the chosen strategy visible
and assertable. `summarize` reduces an executed plan to the counts
that matter at 100 TB (shuffles, broadcast vs sort-merge joins,
scans, codegen stages); `report_all` runs it over every registered
query (tools/gen_plan_report.py renders PLANS.md from it);
tests/test_plans.py asserts the load-bearing shapes per query.
"""

from __future__ import annotations

import re

PLAN_MARKS = {
    "scans": r"FileScan parquet",
    "shuffles": r"Exchange (?:hash|range|SinglePartition|RoundRobin)",
    "broadcast_joins": r"BroadcastHashJoin",
    "sortmerge_joins": r"SortMergeJoin",
    "nested_loop_joins": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "hash_aggs": r"HashAggregate",
    "windows": r"\bWindow\b",
    "codegen_stages": r"WholeStageCodegen \(\d+\)",
    "python_eval": r"(?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)",
    "cached": r"InMemoryTableScan",
}


def plan_str(df) -> str:
    """Executed-plan string (AQE initial plan before first execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_str(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted(df) -> str:
    """`EXPLAIN FORMATTED` text — the view to iterate plans against."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(df) -> dict[str, int]:
    """Operator counts that determine scale behavior."""
    p = plan_str(df)
    return {k: len(re.findall(rx, p)) for k, rx in PLAN_MARKS.items()}


def report_all(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    """Plan summary for every registered query key (sorted)."""
    from ..registry import QUERIES

    out = {}
    for key in sorted(QUERIES):
        try:
            out[key] = summarize(QUERIES[key](spark, sf_dir))
        except Exception as e:  # surfaced, not swallowed
            out[key] = {"error": f"{type(e).__name__}: {e}"}
    spark.catalog.clearCache()
    return out
