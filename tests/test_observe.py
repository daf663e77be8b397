"""Observation metrics ride the action's own job — exact counts with
no second pass over the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_tools_spark.observe import with_quality_metrics


def test_quality_metrics_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    observed, obs = with_quality_metrics(df)
    n = observed.filter(F.col("id") > 0).count()  # the real action
    assert n == 4
    got = obs.get
    assert got["n_rows"] == 4
    assert got["n_null_id"] == 0
    assert got["n_null_v"] == 2


def test_quality_metrics_empty_frame_reports_zero(spark):
    """Zero input rows → null counts report 0, not None (SUM over an
    empty group is NULL without the coalesce)."""
    df = spark.createDataFrame([], "id long, v string")
    observed, obs = with_quality_metrics(df)
    assert observed.count() == 0
    got = obs.get
    assert got["n_rows"] == 0
    assert got["n_null_id"] == 0 and got["n_null_v"] == 0


def test_quality_metrics_on_fixture(spark, sf_dir):
    from hadoop_tools_spark.io import load

    d = load(spark, sf_dir, "documents")
    observed, obs = with_quality_metrics(d, columns=["text", "lang"])
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == d.count()
    assert got["n_null_text"] == 0 and got["n_null_lang"] == 0
