"""Namespace mutation + predicates (SURVEY.md §2.A: ``hh mkdir / mv /
rm / chmod / chown / test / get / put``).

These are metadata side-effects, not relational queries, so they ship
as library functions (exercised in tests/test_fsops.py) rather than
driver-graded query keys. All go through the Hadoop ``FileSystem``
JVM API, so the identical calls run against ``hdfs://`` on a cluster —
Spark's Hadoop client supplies config loading, NameNode HA failover,
and auth, which the reference implemented by hand (its
``Data.Hadoop.Configuration`` / ``Network.Hadoop.Rpc`` layer).

Data movement (``hh get`` / ``hh put``) is deliberately *DataFrame*
read/write — ``spark.read.parquet(hdfs_path)`` /
``df.write.parquet(hdfs_path)`` — per the north-star approach; the
helpers here only cover small file-level copies.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .listing import _hadoop_fs


def mkdirs(spark: SparkSession, path: str) -> bool:
    """`hh mkdir -p`: create path and missing parents."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    return bool(fs.mkdirs(jpath))


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    """`hh rm [-r]`."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    return bool(fs.delete(jpath, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """`hh mv` (namespace rename — atomic on HDFS)."""
    fs, jsrc, jvm = _hadoop_fs(spark, src)
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)))


def set_permission(spark: SparkSession, path: str, octal: str) -> None:
    """`hh chmod OCTAL PATH`."""
    fs, jpath, jvm = _hadoop_fs(spark, path)
    perm = jvm.org.apache.hadoop.fs.permission.FsPermission(
        int(octal, 8)
    )
    fs.setPermission(jpath, perm)


def set_owner(spark: SparkSession, path: str, owner: str | None, group: str | None) -> None:
    """`hh chown / chgrp` (requires superuser on real HDFS)."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    fs.setOwner(jpath, owner, group)


def exists(spark: SparkSession, path: str) -> bool:
    """`hh test -e`."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def is_dir(spark: SparkSession, path: str) -> bool:
    """`hh test -d`."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    return fs.exists(jpath) and fs.getFileStatus(jpath).isDirectory()


def is_file(spark: SparkSession, path: str) -> bool:
    """`hh test -f`."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    return fs.exists(jpath) and fs.getFileStatus(jpath).isFile()


def copy_to_local(spark: SparkSession, src: str, dst: str) -> None:
    """`hh get SRC DST` for single files (bulk data goes via
    DataFrame read/write)."""
    fs, jsrc, jvm = _hadoop_fs(spark, src)
    fs.copyToLocalFile(jsrc, jvm.org.apache.hadoop.fs.Path(dst))


def copy_from_local(spark: SparkSession, src: str, dst: str) -> None:
    """`hh put SRC DST` for single files."""
    fs, jdst, jvm = _hadoop_fs(spark, dst)
    fs.copyFromLocalFile(jvm.org.apache.hadoop.fs.Path(src), jdst)


def fs_copy(
    spark: SparkSession, src: str, dst: str, overwrite: bool = False
) -> bool:
    """`hh cp [-f] SRC DST`: copy within (or across) Hadoop
    filesystems via ``FileUtil.copy`` — the same call `hadoop fs -cp`
    issues, so recursive directory copies, scheme crossing, and
    permission propagation follow Hadoop's own semantics.

    Like `hadoop fs -cp` without ``-f``, an existing destination is an
    error (``FileExistsError``), not a silent clobber: the effective
    target (``dst``, or ``dst/basename(src)`` when ``dst`` is an
    existing directory) is checked before any byte moves, and the
    6-arg ``FileUtil.copy`` overload pins ``overwrite`` explicitly
    rather than inheriting the permissive default."""
    sfs, jsrc, jvm = _hadoop_fs(spark, src)
    dfs, jdst, _ = _hadoop_fs(spark, dst)
    if dfs.exists(jdst):
        if dfs.getFileStatus(jdst).isDirectory():
            target = jvm.org.apache.hadoop.fs.Path(jdst, jsrc.getName())
        else:
            target = jdst
        if not overwrite and dfs.exists(target):
            raise FileExistsError(f"{dst}: File exists")
    conf = spark._jsc.hadoopConfiguration()
    return bool(
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            sfs, jsrc, dfs, jdst, False, overwrite, conf
        )
    )


def getmerge(
    spark: SparkSession, src_dir: str, local_dst: str, newline: bool = False
) -> int:
    """`hh getmerge SRCDIR LOCALDST [-nl]`: concatenate every regular
    file under ``src_dir`` (non-recursive, name order — the
    `hadoop fs -getmerge` contract) into one local file; ``-nl``
    appends a newline after each part. Returns the number of parts
    merged. The read crosses the py4j bridge whole-file per part —
    the CLI parity path for small outputs; a bulk merge is a
    coalesce(1) DataFrame write."""
    fs, jdir, jvm = _hadoop_fs(spark, src_dir)
    if not fs.exists(jdir):
        raise FileNotFoundError(src_dir)
    parts = []
    if fs.getFileStatus(jdir).isDirectory():
        for st in fs.listStatus(jdir):
            if st.isFile():
                parts.append(st.getPath())
        parts.sort(key=lambda p: p.getName())
    else:
        parts.append(jdir)
    ioutils = jvm.org.apache.hadoop.io.IOUtils
    with open(local_dst, "wb") as out:
        for p in parts:
            stream = fs.open(p)
            try:
                data = bytes(ioutils.readFullyToByteArray(stream))
                if len(data) != fs.getFileStatus(p).getLen():
                    raise IOError(
                        f"short read merging {p}: {len(data)} bytes"
                    )
                out.write(data)
                if newline:
                    out.write(b"\n")
            finally:
                stream.close()
    return len(parts)


def fs_df(spark: SparkSession, path: str = "/") -> dict:
    """`hh df PATH`: filesystem capacity report via
    ``FileSystem.getStatus`` — the same numbers `hadoop fs -df`
    prints (capacity / used / remaining, bytes). On HDFS this is one
    NameNode RPC; on a local fs it reflects the backing volume."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    st = fs.getStatus(jpath)
    cap = int(st.getCapacity())
    used = int(st.getUsed())
    rem = int(st.getRemaining())
    return {
        "filesystem": fs.getUri().toString(),
        "capacity": cap,
        "used": used,
        "remaining": rem,
        "pct_used": (round(100.0 * used / cap, 2) if cap else 0.0),
    }
