"""Pipeline observability via `DataFrame.observe` (Spark Observation).

Production data pipelines need row counts, null rates, and basic
range checks per stage — computing them with separate `.count()` /
`.agg()` actions re-executes the plan. `observe` piggybacks the
metrics on the SAME job as the real action: zero extra passes, exact
values, collected on the driver after the action completes. This is
the engine's hook for data-quality dashboards over 100 TB runs —
the metrics are aggregates, so their cost is one partial state per
partition regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame, columns: list[str] | None = None, name: str = "quality"
):
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns ``(observed_df, observation)``; read
    ``observation.get`` AFTER running an action on ``observed_df``.
    """
    cols = columns or df.columns
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # coalesce: SUM over zero rows is NULL — a quality dashboard
        # reading "nulls: None" for an empty stage is itself a bug
        metrics.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"n_null_{c}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
