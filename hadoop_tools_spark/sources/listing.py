"""Filesystem namespace → DataFrame (SURVEY.md §2.A, §4.3).

The reference's surface is HDFS metadata queries (``hh ls/find/du``)
answered by a native RPC client. Spark-first re-expression: materialize
the namespace as a ``FileStatus`` DataFrame and let every metadata
query be a relational query over it. The Hadoop ``FileSystem`` API is
reached through the driver JVM (py4j), so the same code paths speak
``file://`` locally and ``hdfs://``/``s3a://`` on a cluster — HA
failover, config, and auth are inherited from Spark's Hadoop client
(the reference reimplemented all three by hand).

Scale: a 10^8-entry namespace cannot be listed from one driver loop.
:func:`list_files_distributed` ships directory seeds to executors in
BFS rounds — only *directory names* return to the driver per round
(tiny); file rows stay distributed in RDDs that are unioned and only
then become a DataFrame.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: FileStatus schema (SURVEY §1.2) — mirrors HDFS protobuf fields.
FILE_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("is_dir", T.BooleanType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("owner", T.StringType(), True),
        T.StructField("group", T.StringType(), True),
        T.StructField("perm", T.StringType(), True),
        T.StructField("mtime_ms", T.LongType(), True),
        T.StructField("replication", T.IntegerType(), True),
        T.StructField("block_size", T.LongType(), True),
    ]
)


def glob_to_regex(pat: str) -> str:
    """HDFS glob → anchored regex.

    Semantics (Hadoop ``GlobFilter``): ``*`` / ``?`` match within a
    path component (never ``/``), ``[abc]``/``[a-b]``/``[^a]`` char
    classes, ``{a,b}`` alternation (nestable), ``\\`` escapes.
    Property-tested in tests/test_glob.py.
    """
    i, n, out = 0, len(pat), []
    depth = 0
    while i < n:
        c = pat[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "\\" and i + 1 < n:
            out.append(re.escape(pat[i + 1]))
            i += 1
        elif c == "[":
            k = pat.find("]", i + 2)  # ']' right after '[' is literal
            if k == -1:
                out.append(re.escape(c))
            else:
                body = pat[i + 1 : k]
                if body.startswith("!"):  # glob negation spelling
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = k
        elif c == "{":
            depth += 1
            out.append("(?:")
        elif c == "}" and depth:
            depth -= 1
            out.append(")")
        elif c == "," and depth:
            out.append("|")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _status_row(st) -> tuple:
    p = st.getPath()
    return (
        p.toUri().getPath(),
        p.getName(),
        st.isDirectory(),
        int(st.getLen()),
        st.getOwner(),
        st.getGroup(),
        st.getPermission().toString(),
        int(st.getModificationTime()),
        int(st.getReplication()),
        int(st.getBlockSize()),
    )


def list_status_df(
    spark: SparkSession,
    path: str,
    recursive: bool = False,
    glob: str | None = None,
) -> DataFrame:
    """Namespace listing via the Hadoop FileSystem API (any scheme).

    BFS from ``path``. Each directory is drained through
    ``listStatusIterator`` — Hadoop's paged listing protocol: against
    HDFS the RemoteIterator issues ``getListing`` RPCs of
    ``dfs.ls.limit`` entries (default 1000) with a startAfter cursor,
    exactly the paged ``getListing``/``remainingEntries`` loop the
    reference drives natively — so a 10^6-entry directory streams in
    pages instead of materializing one giant RPC response. Glob
    filters on entry *name*, mirroring ``hh ls GLOB`` component
    matching.
    """
    fs, jpath, _ = _hadoop_fs(spark, path)
    rx = re.compile(glob_to_regex(glob)) if glob else None
    rows, stack = [], [jpath]
    while stack:
        cur = stack.pop()
        it = fs.listStatusIterator(cur)
        while it.hasNext():
            st = it.next()
            row = _status_row(st)
            if row[2] and recursive:
                stack.append(st.getPath())
            if rx is None or rx.match(row[1]):
                rows.append(row)
    from ..io import local_rows_df

    return local_rows_df(spark, rows, FILE_STATUS_SCHEMA)


def _scan_local_dirs(paths):
    """Executor-side scandir over local paths: yields ('d'|'f') rows.

    Errors are handled PER ENTRY: a broken symlink or permission-
    denied stat() mid-directory skips that entry only — a directory-
    granular except silently dropped every remaining sibling and
    child subtree of the directory (namespace undercount, no error).
    """
    for d in paths:
        try:
            it = os.scandir(d)
        except OSError:
            continue
        with it:
            for e in it:
                try:
                    if e.is_dir(follow_symlinks=False):
                        yield ("d", e.path, 0, 0)
                    else:
                        s = e.stat()
                        yield (
                            "f", e.path, s.st_size, int(s.st_mtime * 1000)
                        )
                except OSError:
                    continue


class _SpillFrontier:
    """Driver-side BFS frontier with a hard in-memory cap.

    Up to ``cap`` directory paths live in a deque; overflow appends to
    a newline-delimited temp file on local disk. Pops drain memory
    first, then refill from the spill file in ``cap``-sized batches —
    so a 10^6-dir level costs the driver ``cap`` strings plus one open
    file handle, never ~100 MB of path strings. ``peak_mem`` records
    the high-water mark for the bounded-memory pytest.
    """

    def __init__(self, cap: int = 100_000):
        import collections

        self.cap = cap
        self.mem: "collections.deque[str]" = collections.deque()
        self.peak_mem = 0
        self.spilled = 0
        #: high-water mark of on-disk frontier lines — unlike
        #: ``spilled`` (which resets on refill) this is monotonic, so
        #: rehearsals can assert "the walk really did spill".
        self.peak_spilled = 0
        self._spill = None  # lazily-created tempfile (append handle)

    def push(self, path: str) -> None:
        if len(self.mem) < self.cap:
            self.mem.append(path)
            self.peak_mem = max(self.peak_mem, len(self.mem))
        else:
            if self._spill is None:
                import tempfile

                self._spill = tempfile.TemporaryFile(
                    mode="w+", prefix="hts-frontier-"
                )
            self._spill.write(path + "\n")
            self.spilled += 1
            self.peak_spilled = max(self.peak_spilled, self.spilled)

    def _refill(self) -> None:
        if self.mem or not self.spilled:
            return
        # stream the spill back in one cap-sized batch; rewrite the
        # remainder to a fresh spill file (sequential IO, no seeks)
        self._spill.seek(0)
        old, self._spill = self._spill, None
        self.spilled = 0
        for i, line in enumerate(old):
            if i < self.cap:
                self.mem.append(line.rstrip("\n"))
            else:
                self.push(line.rstrip("\n"))
        old.close()

    def pop_chunk(self, n: int) -> list[str]:
        self._refill()
        chunk = [self.mem.popleft() for _ in range(min(n, len(self.mem)))]
        return chunk

    def __bool__(self) -> bool:
        return bool(self.mem) or self.spilled > 0

    def close(self) -> None:
        if self._spill is not None:
            self._spill.close()
            self._spill = None


def list_files_distributed(
    spark: SparkSession,
    root: str,
    max_rounds: int = 100_000,
    frontier_cap: int = 100_000,
    include_dirs: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Distributed BFS namespace walk (the 10^8-file path).

    Each round parallelizes (a chunk of) the current directory
    frontier across executors; executors scan their directories and
    emit files + child dirs. Only child-dir *paths* return to the
    driver — streamed via ``toLocalIterator`` into a
    :class:`_SpillFrontier` that holds at most ``frontier_cap`` paths
    in memory and spills the rest to local disk, so driver RSS is
    bounded regardless of how wide a namespace level is. File rows
    remain distributed and are unioned lazily. Local-scheme
    implementation uses ``os.scandir`` on executors; an ``hdfs://``
    deployment swaps the scan function for a WebHDFS/libhdfs call —
    the orchestration is scheme-agnostic.

    ``stats``, if given, receives the walk's observability counters
    (``rounds``, ``frontier_peak_mem``, ``frontier_spilled``,
    ``rows``) — the namespace-scale rehearsal
    (tools/rehearse_listing.py) asserts bounded-driver behavior
    through these rather than by monkeypatching internals.
    """
    from pyspark import StorageLevel

    sc = spark.sparkContext
    frontier = _SpillFrontier(cap=frontier_cap)
    frontier.push(root)
    file_rdds = []
    round_rdds = []
    rounds = 0
    try:
        while frontier and rounds < max_rounds:
            rounds += 1
            chunk = frontier.pop_chunk(frontier_cap)
            rdd = sc.parallelize(chunk, max(1, min(len(chunk), 64))).mapPartitions(
                _scan_local_dirs
            )
            # MEMORY_AND_DISK, not the MEMORY_ONLY default: a wide
            # level's rows must spill, not evict-and-RESCAN (a second
            # scandir could see a changed filesystem)
            rdd = rdd.persist(StorageLevel.MEMORY_AND_DISK)
            round_rdds.append(rdd)
            # coalesce the (paths-only) dirs pull so toLocalIterator
            # costs a handful of jobs per round, not one per scan
            # partition. The Python driver never holds more than the
            # SpillFrontier cap; the JVM driver transiently holds one
            # coalesced partition (~1/4 of the round's child dirs)
            # while serving it to Python.
            dirs = (
                rdd.filter(lambda r: r[0] == "d")
                .map(lambda r: r[1])
                .coalesce(4)
            )
            for p in dirs.toLocalIterator():
                frontier.push(p)
            if include_dirs:
                file_rdds.append(rdd)
            else:
                file_rdds.append(rdd.filter(lambda r: r[0] == "f"))
    finally:
        if stats is not None:
            stats["rounds"] = rounds
            stats["frontier_peak_mem"] = frontier.peak_mem
            stats["frontier_spilled"] = frontier.peak_spilled
        frontier.close()
    if not file_rdds:
        if stats is not None:
            stats["rows"] = 0
        return spark.createDataFrame([], FILE_STATUS_SCHEMA)
    union = sc.union(file_rdds).map(
        lambda r: (
            r[1],
            r[1].rsplit("/", 1)[-1],
            r[0] == "d",
            r[2],
            None,
            None,
            None,
            r[3],
            1,
            0,
        )
    )
    # materialize the final listing to DISK_ONLY, then release every
    # round's cache deterministically — the per-round RDDs previously
    # stayed pinned in executor memory for the session's lifetime.
    # DISK_ONLY keeps a 10^8-row namespace out of executor heap; the
    # caller streams it once (find/ls) or aggregates it (du).
    out = spark.createDataFrame(union, FILE_STATUS_SCHEMA).persist(
        StorageLevel.DISK_ONLY
    )
    n = out.count()
    if stats is not None:
        stats["rows"] = n
    for rdd in round_rdds:
        rdd.unpersist(True)
    return out


def human_size(n: int) -> str:
    """`hh ls` human-readable sizes (binary units, one decimal)."""
    size = float(n)
    for unit in ("B", "K", "M", "G", "T", "P"):
        if size < 1024 or unit == "P":
            return f"{size:.1f}{unit}" if unit != "B" else f"{int(size)}B"
        size /= 1024
    return f"{size:.1f}P"
