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

import os

from pyspark.sql import DataFrame

from ..sources.snapshots import SnapshotTable


class IdempotentBatchSink:
    """foreachBatch target with batch_id-keyed exactly-once commits."""

    def __init__(self, path: str):
        self.table = SnapshotTable(path)
        self.path = path
        self._committed: set[int] | None = None

    def committed_batches(self) -> set[int]:
        """Batch ids already durable. Seeded from the manifests ONCE
        and maintained in memory: re-parsing every manifest per
        micro-batch made commit-log I/O O(V²) over a stream's
        lifetime. Single-writer assumption (same as the publish
        comment below): a batch committed by a zombie writer is
        invisible to this cache, but its replay then fails the CAS
        publish loudly rather than double-committing."""
        if self._committed is None:
            out = set()
            for v in self.table.versions():
                b = self.table._manifest(v).get("batch_id")
                if b is not None:
                    out.add(b)
            self._committed = out
        return self._committed

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed_batches():
            return  # replayed micro-batch: already durable, skip
        vs = self.table.versions()
        v = vs[-1] + 1 if vs else 0
        prev = self.table._manifest(vs[-1])["files"] if vs else []
        # pid-unique staging dir (the SnapshotTable.create rule): a
        # zombie writer racing this version must never share — and
        # mode('overwrite')-clobber — the winner's staged files; the
        # CAS publish then rejects the zombie with its own files
        # intact and the committed version's data untouched
        files = prev + self.table._stage(
            batch_df, f"{v:05d}-{os.getpid()}"
        )
        # put-if-absent publish with the batch id recorded; a streaming
        # query has one writer, so a conflict means a zombie executor
        # from a failed run beat us — surfacing it is correct
        self.table._publish(files, v, extra={"batch_id": batch_id})
        self._committed.add(batch_id)
