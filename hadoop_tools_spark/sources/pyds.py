"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the engine's integration seam for feeds no built-in reader covers —
internal wire formats, REST-paged APIs, message-queue snapshots.

``SynthLogDataSource`` is the deterministic reference implementation:
it synthesizes log rows as a closed-form function of the row id, split
across N reader partitions, so the graded key can hash-match a DuckDB
``generate_series`` oracle while proving the full plumbing — source
registration, schema declaration, partition planning (one
``InputPartition`` per task → N-way parallel read), and per-partition
iteration.

Scale notes: a Python DataSource reader runs in Python workers (rows
cross to the JVM via Arrow), so it is for INTEGRATION, not the
columnar hot path — land the feed once, write parquet, and let the
vectorized reader take over (the pattern every key here follows via
scratch round trips). Partition count is the parallelism contract:
readers that can split (by offset range, page cursor, shard id) should
emit one InputPartition per split exactly as this one does.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

LEVELS = ("DEBUG", "INFO", "WARN", "ERROR")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        chunk = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(i * chunk, min((i + 1) * chunk, self.n_rows))
            for i in range(self.n_parts)
            if i * chunk < self.n_rows
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            # closed-form row so any engine can re-derive it
            yield (
                i,
                f"host{i % 7}",
                LEVELS[i % 4],
                (i * 37) % 1000,
            )


class SynthLogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthlog"

    def schema(self):
        return "log_id BIGINT, host STRING, level STRING, latency_ms BIGINT"

    def reader(self, schema):
        return SynthLogReader(self.options)


@query(
    "source_python_ds",
    oracle="""
    WITH logs AS (
        SELECT i AS log_id,
               'host' || (i % 7) AS host,
               (['DEBUG', 'INFO', 'WARN', 'ERROR'])[(i % 4) + 1] AS level,
               (i * 37) % 1000 AS latency_ms
        FROM generate_series(0, 9999) t(i)
    )
    SELECT level, host, COUNT(*) AS n,
           ROUND(AVG(latency_ms), 6) AS avg_latency
    FROM logs GROUP BY level, host
    """,
)
def source_python_ds(spark, sf_dir):
    """Read 10k synthetic log rows through the registered custom
    Python DataSource (8 reader partitions → 8 parallel tasks) and
    aggregate per (level, host). The oracle regenerates the identical
    rows from the closed form, so the hash match proves schema,
    partition planning, and row iteration end-to-end.
    """
    try:
        spark.dataSource.register(SynthLogDataSource)
    except Exception:
        pass  # already registered in this session
    logs = (
        spark.read.format("synthlog")
        .option("rows", 10000)
        .option("partitions", 8)
        .load()
    )
    return logs.groupBy("level", "host").agg(
        F.count("*").alias("n"),
        F.round(F.avg("latency_ms"), 6).alias("avg_latency"),
    )


def _log_row(i: int):
    """Closed-form synthetic log row — shared by the batch reader, the
    stream reader, and (re-derived via generate_series) the oracles."""
    return (i, f"host{i % 7}", LEVELS[i % 4], (i * 37) % 1000)


try:  # Spark 4 streaming Python DataSource API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - older Spark
    SimpleDataSourceStreamReader = object


class SynthLogStreamReader(SimpleDataSourceStreamReader):
    """Offset-based micro-batch replay of the synthetic log.

    The simple stream-reader contract: ``initialOffset`` pins the
    start, each ``read(start)`` returns (rows, nextOffset) — here a
    bounded slice of the closed form — and ``readBetweenOffsets``
    makes any batch REPLAYABLE for exactly-once recovery: because
    rows are a pure function of the offset range, a failed batch
    re-reads identically, which is the invariant a real queue source
    provides via stored offsets.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 400))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        s = int(start["offset"])
        e = min(s + self.batch_rows, self.n_rows)
        return iter([_log_row(i) for i in range(s, e)]), {"offset": e}

    def readBetweenOffsets(self, start, end):
        return iter(
            [_log_row(i) for i in range(int(start["offset"]), int(end["offset"]))]
        )


class SynthLogStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthlog_stream"

    def schema(self):
        return "log_id BIGINT, host STRING, level STRING, latency_ms BIGINT"

    def simpleStreamReader(self, schema):
        return SynthLogStreamReader(self.options)


@query(
    "source_python_stream",
    oracle="""
    WITH logs AS (
        SELECT i AS log_id,
               'host' || (i % 7) AS host,
               (['DEBUG', 'INFO', 'WARN', 'ERROR'])[(i % 4) + 1] AS level,
               (i * 37) % 1000 AS latency_ms
        FROM generate_series(0, 399) t(i)
    )
    SELECT level, COUNT(*) AS n, CAST(SUM(latency_ms) AS BIGINT)
             AS total_latency
    FROM logs GROUP BY level
    """,
)
def source_python_stream(spark, sf_dir):
    """Genuinely EXECUTE a streaming Python DataSource: 400 rows
    arrive through the offset-based stream reader in 100-row
    micro-batches into a memory sink; the key aggregates what landed.
    The hash match proves offset planning, per-batch row iteration,
    Arrow transfer and append-mode delivery end-to-end — with
    deterministic replay (`readBetweenOffsets`) making the pipeline
    exactly-once under retry, the property a production queue source
    must give the checkpoint.
    """
    import time
    import uuid

    try:
        spark.dataSource.register(SynthLogStreamDataSource)
    except Exception:
        pass  # already registered in this session
    name = f"pystream_{uuid.uuid4().hex[:8]}"
    sdf = (
        spark.readStream.format("synthlog_stream")
        .option("rows", 400)
        .option("batchRows", 100)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= 400:
                break
            time.sleep(0.05)
    finally:
        q.stop()
        q.awaitTermination(30)
    return (
        spark.table(name)
        .groupBy("level")
        .agg(
            F.count("*").alias("n"),
            F.sum("latency_ms").alias("total_latency"),
        )
    )
