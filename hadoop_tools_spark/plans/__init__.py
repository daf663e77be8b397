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
    # distinct codegen span ids — the simple plan string marks each
    # operator inside a span with "*(<span id>)"; "WholeStageCodegen"
    # itself never appears in toString()
    "codegen_stages": r"\*\((\d+)\)",
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


def summarize(df, execute: bool = False) -> dict[str, int]:
    """Operator counts that determine scale behavior.

    With ``execute=True`` the DataFrame is collected first so the
    summary reflects AQE's FINAL plan — runtime SMJ→BHJ conversions,
    coalesced exchanges, and whole-stage-codegen spans (which only
    appear in the plan string after execution).
    """
    if execute:
        df.collect()
    # after execution AdaptiveSparkPlan prints "== Final Plan ==" AND
    # "== Initial Plan ==" — count only the final section, else every
    # operator is counted twice
    p = plan_str(df).split("== Initial Plan ==")[0]
    out = {}
    for k, rx in PLAN_MARKS.items():
        if k == "codegen_stages":
            out[k] = len(set(re.findall(rx, p)))
        else:
            out[k] = len(re.findall(rx, p))
    return out


def report_all(
    spark, sf_dir: str, execute: bool = True
) -> dict[str, dict[str, int]]:
    """Plan summary for every registered query key (sorted)."""
    from ..registry import QUERIES

    out = {}
    for key in sorted(QUERIES):
        try:
            out[key] = summarize(QUERIES[key](spark, sf_dir), execute=execute)
        except Exception as e:  # surfaced, not swallowed
            out[key] = {"error": f"{type(e).__name__}: {e}"}
        spark.catalog.clearCache()
    return out
