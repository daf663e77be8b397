"""File-source micro-batch execution helpers (SURVEY.md §5.3 layer 3).

Turns the fixture's ``events`` table into a real stream: rows are
staged as N parquet files in arrival order and read back with
``maxFilesPerTrigger=1`` so a `trigger(availableNow=True)` run
executes N genuine micro-batches through the state store — watermark
advancement, state eviction, and late-row dropping all behave exactly
as they would on a live source.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load


def stage_stream_files(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 5,
    late_df: DataFrame | None = None,
) -> str:
    """Write events as ordered part files simulating arrival order.

    Rows are range-partitioned by event time (file i holds an ordered
    time slice), so the source replays history in order; ``late_df``
    rows are appended as a final file — they arrive after the
    watermark has advanced past them.
    """
    ev = load(spark, sf_dir, "events")
    # deterministic time-slice file assignment
    ranked = ev.withColumn(
        "bucket", F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    ).cache()  # one global sort, not one per staged file
    for i in range(1, n_files + 1):
        (
            ranked.filter(F.col("bucket") == i)
            .drop("bucket")
            .coalesce(1)
            .write.mode("overwrite" if i == 1 else "append")
            .parquet(out_dir)
        )
    ranked.unpersist()
    if late_df is not None:
        late_df.coalesce(1).write.mode("append").parquet(out_dir)
    return out_dir


def read_event_stream(spark: SparkSession, staged_dir: str) -> DataFrame:
    ev_schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
    )


def _await_or_stop(q, timeout_s: int = 300) -> None:
    """Wait for an availableNow query to finish; on timeout STOP it
    before raising — a bare assert leaked the still-active query into
    the shared session (it kept writing to the sink and corrupted
    later tests), and asserts vanish under ``python -O``."""
    finished = q.awaitTermination(timeout_s)
    if not finished or q.isActive:
        q.stop()
        raise RuntimeError(
            f"streaming query did not terminate within {timeout_s}s"
        )


def run_to_completion(
    stream_df: DataFrame, mode: str = "update", name: str | None = None
):
    """Execute a streaming DataFrame with availableNow into a memory
    sink; returns the sink table name after termination."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_stop(q)
    return name


def run_foreach_batch_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "append",
):
    """Execute a streaming DataFrame via ``foreachBatch`` appending each
    micro-batch to a parquet sink (SURVEY.md §2.D sink row).

    The checkpoint dir carries batch ids across restarts: a re-run
    after failure replays only uncommitted batches, which combined
    with the idempotent-per-batch-id write below is Structured
    Streaming's exactly-once file-sink recipe. Each batch lands as a
    ``batch_id``-stamped subwrite so replays of a committed batch id
    overwrite rather than double-append.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # the hive-style dir name IS the batch_id column (partition
        # discovery surfaces it on read) — also storing it as a data
        # column wrote the same constant twice per row
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_stop(q)
    return out_dir
