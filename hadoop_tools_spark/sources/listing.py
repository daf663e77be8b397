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
    return spark.createDataFrame(rows, FILE_STATUS_SCHEMA)


def _scan_local_dirs(paths):
    """Executor-side scandir over local paths: yields ('d'|'f') rows."""
    for d in paths:
        try:
            with os.scandir(d) as it:
                for e in it:
                    if e.is_dir(follow_symlinks=False):
                        yield ("d", e.path, 0, 0)
                    else:
                        s = e.stat()
                        yield ("f", e.path, s.st_size, int(s.st_mtime * 1000))
        except OSError:
            continue


def list_files_distributed(
    spark: SparkSession, root: str, max_rounds: int = 64
) -> DataFrame:
    """Distributed BFS namespace walk (the 10^8-file path).

    Each round parallelizes the current directory frontier across
    executors; executors scan their directories and emit files + child
    dirs. Only child-dir *paths* are collected to the driver (frontier
    for the next round); file rows remain distributed and are unioned
    lazily. Local-scheme implementation uses ``os.scandir`` on
    executors; an ``hdfs://`` deployment swaps the scan function for a
    WebHDFS/libhdfs call — the orchestration is scheme-agnostic.
    """
    sc = spark.sparkContext
    frontier = [root]
    file_rdds = []
    for _ in range(max_rounds):
        if not frontier:
            break
        rdd = sc.parallelize(frontier, max(1, min(len(frontier), 256))).mapPartitions(
            _scan_local_dirs
        )
        rdd = rdd.cache()
        frontier = [p for (_, p, _, _) in rdd.filter(lambda r: r[0] == "d").collect()]
        file_rdds.append(rdd.filter(lambda r: r[0] == "f"))
    if not file_rdds:
        return spark.createDataFrame([], FILE_STATUS_SCHEMA)
    union = sc.union(file_rdds).map(
        lambda r: (r[1], r[1].rsplit("/", 1)[-1], False, r[2], None, None, None, r[3], 1, 0)
    )
    return spark.createDataFrame(union, FILE_STATUS_SCHEMA)


def human_size(n: int) -> str:
    """`hh ls` human-readable sizes (binary units, one decimal)."""
    size = float(n)
    for unit in ("B", "K", "M", "G", "T", "P"):
        if size < 1024 or unit == "P":
            return f"{size:.1f}{unit}" if unit != "B" else f"{int(size)}B"
        size /= 1024
    return f"{size:.1f}P"
