"""MERGE INTO for plain parquet tables (upsert by key).

Spark has no `MERGE` without a table format (Delta/Iceberg); the
classic lake pattern is key-based upsert with DYNAMIC partition
overwrite: only partitions that contain a source key are read,
merged, and rewritten — untouched partition directories are not even
listed. On a date-partitioned 100 TB table a CDC batch touching two
days rewrites two directories, not the lake.

Hazard handled here: the merged frame READS the same path it is
about to OVERWRITE. Spark's lazy execution would have the write
delete input files mid-scan; `localCheckpoint` pins the merged rows
before the write starts (same discipline as the incremental dedup
indexes in operators/llm_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _partition_filter(col: Column, parts: list) -> Column:
    """Membership test for partition values that is NULL-correct.

    ``col.isin(parts)`` evaluates to NULL (→ row filtered out) when the
    row's value is NULL, even if ``None`` is in ``parts`` — so a source
    batch carrying a null partition value would silently skip the
    target's ``__HIVE_DEFAULT_PARTITION__`` rows: matched keys would be
    duplicated by the union instead of replaced, and compaction would
    silently never rewrite the null partition. Spell the NULL branch
    explicitly instead.
    """
    non_null = [p for p in parts if p is not None]
    cond = col.isin(non_null) if non_null else F.lit(False)
    if len(non_null) != len(parts):
        cond = cond | col.isNull()
    return cond


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source_df: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> int:
    """Upsert ``source_df`` into the parquet table at ``target_path``
    (partitioned by ``partition_col``): matching keys are replaced,
    new keys inserted. Returns the number of partitions rewritten.

    Requires every source row to carry its partition value — the
    standard CDC contract — so the touched-partition set is computed
    from the source alone, without scanning the target.

    **Partition-stable contract**: a key's partition value must never
    change between versions. If a source row moves a key to a new
    partition, the stale row in the OLD partition is not removed (that
    partition isn't in the touched set — removing it would require a
    full key-scan of the target, the exact cost this design avoids).
    Callers with partition-mobile keys must route deletes explicitly
    (emit a tombstone row in the old partition) or use a table format
    with a transaction log (Delta/Iceberg) instead.

    Source batches must carry at most ONE row per key (the usual
    CDC-compaction contract): with duplicates, the anti-join removes
    the target row once but the union inserts every source version.
    """
    parts = [
        r[0]
        for r in source_df.select(partition_col).distinct().collect()
    ]
    target = spark.read.parquet(target_path).filter(
        _partition_filter(F.col(partition_col), parts)
    )
    merged = (
        target.join(
            source_df.select(*key_cols), key_cols, "left_anti"
        )
        .unionByName(source_df)
        .localCheckpoint()  # pin rows BEFORE overwriting their source files
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(parts)


def compact_partitions(
    spark: SparkSession,
    target_path: str,
    partition_col: str,
    files_per_partition: int = 1,
    partitions: list | None = None,
) -> int:
    """Small-file compaction for a partitioned parquet table: rewrite
    each (selected) partition's many small files as
    ``files_per_partition`` files, content-identical.

    Small files are the chronic failure mode of incremental ingestion
    (every upsert/stream batch adds files; scan cost grows with file
    COUNT, not bytes). Compaction is the maintenance half of the
    upsert pattern above and uses the same machinery: dynamic
    partition overwrite limits the rewrite to the selected
    partitions, and `localCheckpoint` pins rows before their source
    files are replaced. Returns the number of partitions compacted.
    """
    df = spark.read.parquet(target_path)
    if partitions is None:
        partitions = [
            r[0] for r in df.select(partition_col).distinct().collect()
        ]
    # repartition by (partition value, content-derived salt): hashing by
    # partition_col alone puts each partition's rows in ONE task — one
    # output file regardless of files_per_partition. The salt spreads
    # each partition over exactly files_per_partition writer tasks.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(files_per_partition),
    )
    subset = (
        df.filter(_partition_filter(F.col(partition_col), partitions))
        .repartition(
            files_per_partition * len(partitions),
            F.col(partition_col),
            salt,
        )
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            subset.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(partitions)
