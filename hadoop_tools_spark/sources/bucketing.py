"""Bucketed tables → co-located, shuffle-free joins (SURVEY.md §2.B
"bucketing for co-located joins"; SCALE.md Joins).

At 100 TB the dominant cost of a fact↔fact join is shuffling both
sides. Writing both tables bucketed by the join key (same bucket
count) lets Spark plan a SortMergeJoin with NO Exchange on either
side — each task reads matching bucket files directly. The write pays
one shuffle once; every subsequent join is shuffle-free. Plan-asserted
in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally removes the join-time
    sort, leaving pure merge."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # clear an orphaned managed location (e.g. from a killed run) —
    # saveAsTable refuses to adopt a pre-existing directory. The
    # managed layout is <warehouse>[/<db>.db]/<table>: a qualified
    # name or non-default current database lives under a .db dir, so
    # naive '<warehouse>/<table>' would miss the orphan entirely
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if "." in table:
        db, tbl = table.lower().rsplit(".", 1)
    else:
        db, tbl = spark.catalog.currentDatabase().lower(), table.lower()
    base = wh.removeprefix("file:")
    loc = f"{base}/{tbl}" if db == "default" else f"{base}/{db}.db/{tbl}"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(loc)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)
    # pre-partition on the bucket expression: repartition(n, col) and
    # bucketBy(n, col) share Spark's HashPartitioning, so each write
    # task owns exactly one bucket and writes one file — the sort and
    # encode parallelize across buckets instead of running inside the
    # scan's (single) input partition, and the file count stays n
    writer = (
        df.repartition(n_buckets, df[bucket_col])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
    prefix: str = "hts_bucketed",
) -> tuple[DataFrame, DataFrame]:
    """Write both sides bucketed on their join keys and return the
    bucket-aware table reads, ready for a shuffle-free join."""
    lt, rt = f"{prefix}_left", f"{prefix}_right"
    write_bucketed(left, lt, left_key, n_buckets, sort_col=left_key)
    write_bucketed(right, rt, right_key, n_buckets, sort_col=right_key)
    return spark.table(lt), spark.table(rt)
