"""Exactly-once streaming sinks (SURVEY.md §2.D sink row).

Structured Streaming's foreachBatch gives at-least-once delivery: a
failed micro-batch is REPLAYED with the same batch_id after recovery,
so a naive append sink duplicates rows. Exactly-once therefore needs
an idempotent commit keyed by batch_id — the pattern every
transactional Spark sink (Delta, Iceberg, JDBC-upsert) implements.

``IdempotentBatchSink`` reuses the snapshot table's manifest-pointer
commit (sources/snapshots.py): each micro-batch stages immutable
parquet files, then publishes a manifest recording the batch_id. A
replayed batch_id is detected BEFORE staging and skipped, so the
table never holds a batch twice, and a crash between staging and
publish leaves only invisible orphan files. Readers always see a
manifest-consistent prefix of the stream.

At 100 TB scale nothing here is driver-heavy: the commit log is one
tiny JSON per batch, and data files stream through executors.
"""

from __future__ import annotations


from pyspark.sql import DataFrame

from ..sources.snapshots import SnapshotTable


class IdempotentBatchSink:
    """foreachBatch target with batch_id-keyed exactly-once commits."""

    def __init__(self, path: str):
        self.table = SnapshotTable(path)
        self.path = path

    def committed_batches(self) -> set[int]:
        out = set()
        for v in self.table.versions():
            b = self.table._manifest(v).get("batch_id")
            if b is not None:
                out.add(b)
        return out

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed_batches():
            return  # replayed micro-batch: already durable, skip
        vs = self.table.versions()
        if not vs:
            files = self.table._stage(batch_df, f"{0:05d}")
            version = 0
        else:
            v = vs[-1]
            files = self.table._manifest(v)["files"] + self.table._stage(
                batch_df, f"{v + 1:05d}"
            )
            version = v + 1
        # put-if-absent publish with the batch id recorded; a streaming
        # query has one writer, so a conflict means a zombie executor
        # from a failed run beat us — surfacing it is correct
        self.table._publish(files, version, extra={"batch_id": batch_id})
