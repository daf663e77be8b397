"""``hh``-style command-line interface (SURVEY.md §2.A).

The reference ships an ``hh`` executable whose subcommands (ls, find,
du, cat, get, put, mkdir, mv, rm, chmod, chown, chgrp, test, cd, pwd,
version) this module mirrors one-for-one over the engine's library
surface, so a user of the reference can run the same commands here:

    python -m hadoop_tools_spark ls '/data/*/logs'
    python -m hadoop_tools_spark du /data
    python -m hadoop_tools_spark test -e /data && echo exists

Glob expansion uses Hadoop's own ``FileSystem.globStatus`` — the
exact component-wise HDFS glob semantics (``*`` ``?`` ``[a-b]``
``{a,b}``) the reference reimplemented client-side; relative paths
resolve against the persisted working directory (``cd`` / ``pwd``),
matching the reference's dotfile behavior.

Latency note: the reference's pitch is skipping JVM startup for
metadata commands; a cold SparkSession costs seconds. The CLI is the
*surface* parity layer — scripted/interactive use should hold one
session (the functions all accept an injected ``spark``), and data
processing belongs in the DataFrame API, not subprocess calls.
"""

from __future__ import annotations

import sys

from .sources import fsops, session_state
from .sources.listing import human_size

VERSION = "hadoop-tools-spark 1.0 (hh-compatible CLI)"


def _spark(spark=None):
    if spark is not None:
        return spark
    from .session import get_spark

    return get_spark("hh")


def _norm_root(root: str) -> tuple[str, str]:
    """(display root, scheme-less URI path) for du/count grouping.

    Strips the trailing slash WITHOUT emptying the filesystem root
    (``'/'.rstrip('/')`` is ``''``, and ``Path('')`` throws), and
    returns the scheme-less path because the listing DataFrame's
    ``path`` column is ``toUri().getPath()`` — offsets computed from a
    scheme-qualified root would overrun every row.
    """
    from urllib.parse import urlparse

    stripped = root.rstrip("/") or "/"
    upath = urlparse(stripped).path or "/"
    return stripped, upath


def _glob_status(spark, pattern: str):
    """Expand an HDFS glob via FileSystem.globStatus (native
    component-wise semantics); returns a list of Java FileStatus."""
    from .sources.listing import _hadoop_fs

    fs, jpath, _ = _hadoop_fs(spark, pattern)
    matches = fs.globStatus(jpath)
    return list(matches) if matches is not None else []


def _fmt_status(st) -> str:
    perm = st.getPermission().toString()
    kind = "d" if st.isDirectory() else "-"
    size = human_size(int(st.getLen()))
    import datetime as _dt

    mtime = _dt.datetime.fromtimestamp(
        st.getModificationTime() / 1000, _dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M")
    return (
        f"{kind}{perm} {st.getOwner():<8} {st.getGroup():<8} "
        f"{size:>10} {mtime} {st.getPath().toUri().getPath()}"
    )


def cmd_ls(args, spark=None, out=sys.stdout):
    """``hh ls [-R] [GLOB]``: one line per entry, sorted by path.

    A glob argument expands first; each matched directory is listed
    (children printed; with ``-R``, recursively), each matched file
    printed directly — the reference's semantics.
    """
    from .sources.listing import _hadoop_fs

    spark = _spark(spark)
    zone, forced = posix_split(args)
    recursive = "-R" in zone
    pos = [a for a in zone if a != "-R"] + forced
    target = session_state.resolve(pos[0] if pos else ".")
    rows = []
    for st in _glob_status(spark, target):
        if st.isDirectory():
            fs, _, _ = _hadoop_fs(spark, target)
            stack = [st.getPath()]
            while stack:
                for child in fs.listStatus(stack.pop()):
                    rows.append(child)
                    if recursive and child.isDirectory():
                        stack.append(child.getPath())
        else:
            rows.append(st)
    for st in sorted(rows, key=lambda s: s.getPath().toUri().getPath()):
        print(_fmt_status(st), file=out)
    return 0


def cmd_find(args, spark=None, out=sys.stdout):
    """``hh find PATH [-name GLOB] [-type f|d]``: recursive descent,
    print matching paths.

    Filters run in the engine (same predicates as the ``fs_find``
    query key), and the sorted result streams to the terminal via
    ``toLocalIterator``. For local/file schemes the listing itself is
    the distributed BFS walk (``list_files_distributed``), so neither
    the walk nor the render ever holds the whole namespace on the
    driver — a 10^8-file tree runs in bounded memory; other schemes
    fall back to the driver-JVM walk (``list_status_df``), whose rows
    DO accumulate driver-side before the DataFrame exists."""
    from urllib.parse import urlparse

    from pyspark.sql import functions as F

    from .sources.listing import (
        glob_to_regex,
        list_files_distributed,
        list_status_df,
    )

    spark = _spark(spark)
    zone, forced = posix_split(args)
    name_glob = type_flag = None
    if "-name" in zone:
        if zone.index("-name") + 1 >= len(zone):
            print("hh find: -name: missing operand", file=sys.stderr)
            return 2
        name_glob = zone[zone.index("-name") + 1]
    if "-type" in zone:
        if zone.index("-type") + 1 >= len(zone):
            print("hh find: -type: missing operand", file=sys.stderr)
            return 2
        type_flag = zone[zone.index("-type") + 1]
    pos, skip = [], False
    for a in zone:
        if skip:
            skip = False
        elif a in ("-name", "-type"):
            skip = True
        else:
            pos.append(a)
    pos += forced
    root = session_state.resolve(pos[0] if pos else ".")
    parsed = urlparse(root)
    if parsed.scheme in ("", "file"):
        listing = list_files_distributed(
            spark, parsed.path or root, include_dirs=True
        )
    else:
        listing = list_status_df(spark, root, recursive=True)
    df = listing
    if name_glob is not None:
        df = df.filter(F.col("name").rlike(glob_to_regex(name_glob)))
    if type_flag == "f":
        df = df.filter(~F.col("is_dir"))
    elif type_flag == "d":
        df = df.filter(F.col("is_dir"))
    try:
        for r in df.select("path").orderBy("path").toLocalIterator():
            print(r.path, file=out)
    finally:
        # the distributed walk returns a persisted listing; release the
        # ROOT frame once rendered (unpersist on a filtered child is a
        # no-op for the parent's cache entry), blocking so repeated
        # invocations cannot stack pending frees
        listing.unpersist(True)
    return 0


def cmd_du(args, spark=None, out=sys.stdout):
    """``hh du [-h] [PATH]``: recursive bytes + file count per child —
    the aggregate the NameNode computes server-side for the
    reference's one getContentSummary RPC, expressed as a partial-
    aggregated groupBy over the listing DataFrame. Raw byte counts by
    default; ``-h`` renders human-readable sizes (upstream ``hh du``
    flag parity). Output stays driver-rendered: rows are bounded by
    the root's direct-child fan-out, not namespace size."""
    from pyspark.sql import functions as F

    from .sources.listing import list_status_df

    spark = _spark(spark)
    zone, forced = posix_split(args)
    human = "-h" in zone
    args = [a for a in zone if a != "-h"] + forced
    root, upath = _norm_root(session_state.resolve(args[0] if args else "."))
    df = list_status_df(spark, root, recursive=True).filter(~F.col("is_dir"))
    # child = root/<first path component below root>. The listing's
    # `path` column is the SCHEME-LESS URI path, so the offset comes
    # from the scheme-less root (an hdfs:// root's length would
    # overrun every path and collapse all files into one group).
    offset = 2 if upath == "/" else len(upath) + 2
    rel = F.expr(f"substring(path, {offset})")
    prefix = root if root.endswith("/") else root + "/"
    child = F.concat(F.lit(prefix), F.split_part(rel, F.lit("/"), F.lit(1)))
    agg = (
        df.groupBy(child.alias("child"))
        .agg(F.sum("size").alias("bytes"), F.count("*").alias("files"))
        .orderBy("child")
        .collect()
    )
    for r in agg:
        size = human_size(r.bytes) if human else str(r.bytes)
        print(f"{size:>10} {r.files:>6} {r.child}", file=out)
    return 0


def cmd_count(args, spark=None, out=sys.stdout):
    """``hh count PATH``: the ContentSummary triple — DIR_COUNT
    FILE_COUNT CONTENT_SIZE PATH, like ``hadoop fs -count`` (one
    getContentSummary RPC in the reference; one aggregated listing
    pass here)."""
    from pyspark.sql import functions as F

    from .sources.listing import list_status_df

    spark = _spark(spark)
    zone, forced = posix_split(args)
    for arg in (zone + forced) or ["."]:
        root, _ = _norm_root(session_state.resolve(arg))
        df = list_status_df(spark, root, recursive=True)
        row = df.agg(
            F.sum(F.when(F.col("is_dir"), 1).otherwise(0)).alias("dirs"),
            F.sum(F.when(~F.col("is_dir"), 1).otherwise(0)).alias("files"),
            F.sum(F.when(~F.col("is_dir"), F.col("size")).otherwise(0)).alias(
                "bytes"
            ),
        ).collect()[0]
        # ContentSummary counts the target itself as a directory only
        # when it IS one (`hadoop fs -count FILE` prints 0 dirs)
        target = _glob_status(spark, root) or []
        self_dir = 1 if any(st.isDirectory() for st in target) else 0
        print(
            f"{int(row.dirs or 0) + self_dir:>12} {int(row.files or 0):>12} "
            f"{int(row.bytes or 0):>15} {root}",
            file=out,
        )
    return 0


def cmd_cat(args, spark=None, out=None):
    """``hh cat FILE``: emit file bytes to stdout via the Hadoop
    input stream (any scheme). Reads cross the py4j bridge whole-file
    (py4j cannot fill a caller-supplied buffer in place); a
    production bulk-read is ``spark.read`` — this is the CLI parity
    path for small files."""
    from .sources.listing import _hadoop_fs

    spark = _spark(spark)
    raw = out or getattr(sys.stdout, "buffer", sys.stdout)
    jvm = spark._jvm
    rc = 0
    zone, forced = posix_split(args)
    for arg in zone + forced:
        path = session_state.resolve(arg)
        matches = _glob_status(spark, path) or []
        if not matches:
            # match `hadoop fs -cat`: a missing path is an error, not
            # silent empty output with rc 0
            print(f"cat: {arg}: No such file or directory", file=sys.stderr)
            rc = 1
        for st in matches:
            if st.isDirectory():
                # match `hadoop fs -cat` semantics: directories are an
                # error, not a crash (fs.open on a dir raises a raw
                # py4j exception otherwise)
                print(
                    f"cat: {st.getPath().toString()}: Is a directory",
                    file=sys.stderr,
                )
                rc = 1
                continue
            fs, _, _ = _hadoop_fs(spark, path)
            stream = fs.open(st.getPath())
            try:
                data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                raw.write(bytes(data))
            finally:
                stream.close()
    return rc


def cmd_tail(args, spark=None, out=None):
    """``hh tail [-c BYTES] FILE``: emit the last BYTES (default 1 KiB)
    of a file — `hadoop fs -tail` parity. Seeks straight to
    ``len - n`` on the Hadoop input stream, so only the tail block is
    read no matter how large the file is (the whole point on HDFS)."""
    from .sources.listing import _hadoop_fs

    spark = _spark(spark)
    raw = out or getattr(sys.stdout, "buffer", sys.stdout)
    zone, forced = posix_split(args)
    n = 1024
    if "-c" in zone:
        i = zone.index("-c")
        if i + 1 >= len(zone):
            print("hh tail: -c: missing operand", file=sys.stderr)
            return 2
        try:
            n = int(zone[i + 1])
        except ValueError:
            print(
                f"hh tail: -c: invalid byte count {zone[i + 1]!r}",
                file=sys.stderr,
            )
            return 2
        zone = zone[:i] + zone[i + 2:]
    args = zone + forced
    jvm = spark._jvm
    rc = 0
    for arg in args:
        path = session_state.resolve(arg)
        matches = _glob_status(spark, path) or []
        if not matches:
            print(f"tail: {arg}: No such file or directory", file=sys.stderr)
            rc = 1
        for st in matches:
            if st.isDirectory():
                print(
                    f"tail: {st.getPath().toString()}: Is a directory",
                    file=sys.stderr,
                )
                rc = 1
                continue
            fs, _, _ = _hadoop_fs(spark, path)
            stream = fs.open(st.getPath())
            try:
                start = max(0, int(st.getLen()) - n)
                stream.seek(start)
                data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                raw.write(bytes(data))
            finally:
                stream.close()
    return rc


def cmd_checksum(args, spark=None, out=sys.stdout):
    """``hh checksum PATH...``: per-file content md5 —
    `hdfs dfs -checksum` parity. The digest job runs in the engine
    (binaryFile source: one task per matched file, computed where the
    file lives); the driver only streams (path, md5, size) result
    rows, so a huge tree checksums in parallel with nothing but the
    report crossing to the client."""
    from pyspark.sql import functions as F

    spark = _spark(spark)
    rc = 0
    zone, forced = posix_split(args)
    for arg in zone + forced:
        path = session_state.resolve(arg)
        matches = _glob_status(spark, path) or []
        if not matches:
            print(
                f"checksum: {arg}: No such file or directory",
                file=sys.stderr,
            )
            rc = 1
            continue
        targets = [
            st.getPath().toString()
            for st in matches
            if not st.isDirectory()
        ]
        if not targets:
            continue
        df = (
            spark.read.format("binaryFile")
            .load(targets)
            .select(
                "path",
                F.md5(F.col("content")).alias("md5"),
                F.length(F.col("content")).cast("long").alias("size"),
            )
            .orderBy("path")
        )
        for r in df.toLocalIterator():
            print(f"{r.path}\tMD5\t{r.md5}\t{r.size}", file=out)
    return rc


def cmd_stat(args, spark=None, out=sys.stdout):
    """``hh stat [FORMAT] PATH``: print file metadata per a
    `hadoop fs -stat` format string (default ``%y``). Specifiers:
    %b size, %n name, %o block size, %r replication, %u owner,
    %g group, %y mtime (UTC), %F type."""
    import datetime as _dt

    spark = _spark(spark)
    zone, forced = posix_split(args)
    args = zone + forced
    fmt = "%y"
    # a format like 'size=%b' need not START with '%' — any first arg
    # containing a specifier (and followed by >=1 path) is the format
    if len(args) >= 2 and "%" in args[0]:
        fmt, args = args[0], args[1:]
    rc = 0
    for arg in args:
        path = session_state.resolve(arg)
        matches = _glob_status(spark, path) or []
        if not matches:
            print(f"stat: {arg}: No such file or directory", file=sys.stderr)
            rc = 1
        for st in matches:
            mtime = _dt.datetime.fromtimestamp(
                st.getModificationTime() / 1000, _dt.timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S")
            subs = {
                "%b": str(int(st.getLen())),
                "%n": st.getPath().getName(),
                "%o": str(int(st.getBlockSize())),
                "%r": str(int(st.getReplication())),
                "%u": st.getOwner(),
                "%g": st.getGroup(),
                "%y": mtime,
                "%F": "directory" if st.isDirectory() else "regular file",
            }
            line = fmt
            for k, v in subs.items():
                line = line.replace(k, v)
            print(line, file=out)
    return rc


def cmd_get(args, spark=None, **_):
    """``hh get SRC [DST]``: copy to local filesystem."""
    zone, forced = posix_split(args)
    pos = zone + forced
    src = session_state.resolve(pos[0])
    dst = pos[1] if len(pos) > 1 else src.rsplit("/", 1)[-1]
    fsops.copy_to_local(_spark(spark), src, dst)
    return 0


def cmd_put(args, spark=None, **_):
    """``hh put SRC DST``: copy from local filesystem."""
    zone, forced = posix_split(args)
    pos = zone + forced
    fsops.copy_from_local(_spark(spark), pos[0], session_state.resolve(pos[1]))
    return 0


def cmd_mkdir(args, spark=None, **_):
    """``hh mkdir [-p] PATH`` (always -p, like the reference)."""
    zone, forced = posix_split(args)
    paths = [a for a in zone if a != "-p"] + forced
    ok = all(fsops.mkdirs(_spark(spark), session_state.resolve(p)) for p in paths)
    return 0 if ok else 1


def cmd_mv(args, spark=None, **_):
    """``hh mv SRC DST``."""
    zone, forced = posix_split(args)
    pos = zone + forced
    ok = fsops.rename(
        _spark(spark),
        session_state.resolve(pos[0]),
        session_state.resolve(pos[1]),
    )
    return 0 if ok else 1


def cmd_rm(args, spark=None, **_):
    """``hh rm [-r] PATH...``."""
    zone, forced = posix_split(args)
    recursive = "-r" in zone
    ok = True
    for p in [a for a in zone if a != "-r"] + forced:
        ok = fsops.delete(_spark(spark), session_state.resolve(p), recursive) and ok
    return 0 if ok else 1


def cmd_chmod(args, spark=None, **_):
    """``hh chmod OCTAL PATH``."""
    zone, forced = posix_split(args)
    pos = zone + forced
    fsops.set_permission(_spark(spark), session_state.resolve(pos[1]), pos[0])
    return 0


def cmd_chown(args, spark=None, **_):
    """``hh chown OWNER[:GROUP] PATH``."""
    zone, forced = posix_split(args)
    pos = zone + forced
    owner, _, group = pos[0].partition(":")
    fsops.set_owner(
        _spark(spark), session_state.resolve(pos[1]), owner or None, group or None
    )
    return 0


def cmd_chgrp(args, spark=None, **_):
    """``hh chgrp GROUP PATH``."""
    zone, forced = posix_split(args)
    pos = zone + forced
    fsops.set_owner(_spark(spark), session_state.resolve(pos[1]), None, pos[0])
    return 0


def cmd_test(args, spark=None, **_):
    """``hh test -e|-d|-f PATH``: predicate via exit code."""
    preds = {"-e": fsops.exists, "-d": fsops.is_dir, "-f": fsops.is_file}
    zone, forced = posix_split(args)
    pos = zone[1:] + forced
    if not zone or zone[0] not in preds or not pos:
        print("hh test: expected -e|-d|-f PATH", file=sys.stderr)
        return 2
    flag, path = zone[0], session_state.resolve(pos[0])
    spark = _spark(spark)
    return 0 if preds[flag](spark, path) else 1


def cmd_cd(args, **_):
    """``hh cd PATH``: persist the working directory."""
    zone, forced = posix_split(args)
    pos = zone + forced
    session_state.cd(pos[0] if pos else "/")
    return 0


def cmd_pwd(args, out=sys.stdout, **_):
    """``hh pwd``."""
    print(session_state.pwd(), file=out)
    return 0


def cmd_cp(args, spark=None, **_):
    """``hh cp [-f] SRC DST``: filesystem-side copy (FileUtil.copy —
    the `hadoop fs -cp` call), recursive for directories. Without
    ``-f`` an existing destination is an error, as in `hadoop fs
    -cp`."""
    zone, forced = posix_split(args)
    pos = [a for a in zone if not a.startswith("-")] + forced
    try:
        ok = fsops.fs_copy(
            _spark(spark),
            session_state.resolve(pos[0]),
            session_state.resolve(pos[1]),
            overwrite="-f" in zone,
        )
    except FileExistsError as e:
        print(f"cp: {e}", file=sys.stderr)
        return 1
    return 0 if ok else 1


def cmd_getmerge(args, spark=None, **_):
    """``hh getmerge [-nl] SRCDIR LOCALDST``: concatenate a dir's
    files (name order) into one local file; ``-nl`` newline-separates
    parts."""
    zone, forced = posix_split(args)
    newline = "-nl" in zone
    pos = [a for a in zone if not a.startswith("-")] + forced
    try:
        fsops.getmerge(
            _spark(spark), session_state.resolve(pos[0]), pos[1],
            newline=newline,
        )
    except FileNotFoundError as e:
        print(f"getmerge: {e}: No such file or directory",
              file=sys.stderr)
        return 1
    return 0


def cmd_df(args, spark=None, out=sys.stdout, **_):
    """``hh df [-h] [PATH]``: filesystem capacity report (the
    `hadoop fs -df` columns); ``-h`` human-readable units."""
    zone, forced = posix_split(args)
    human = "-h" in zone
    pos = [a for a in zone if not a.startswith("-")] + forced
    path = session_state.resolve(pos[0]) if pos else "/"
    d = fsops.fs_df(_spark(spark), path)

    def fmt(n: int) -> str:
        if not human:
            return str(n)
        for unit in ("", "K", "M", "G", "T", "P"):
            if abs(n) < 1024:
                return f"{n:.1f}{unit}" if unit else str(n)
            n /= 1024.0
        return f"{n:.1f}E"

    print("Filesystem  Size  Used  Available  Use%", file=out)
    print(
        f"{d['filesystem']}  {fmt(d['capacity'])}  {fmt(d['used'])}  "
        f"{fmt(d['remaining'])}  {d['pct_used']:.0f}%",
        file=out,
    )
    return 0


def cmd_version(args, out=sys.stdout, **_):
    print(VERSION, file=out)
    return 0


COMMANDS = {
    "ls": cmd_ls,
    "find": cmd_find,
    "du": cmd_du,
    "count": cmd_count,
    "cat": cmd_cat,
    "tail": cmd_tail,
    "stat": cmd_stat,
    "checksum": cmd_checksum,
    "get": cmd_get,
    "put": cmd_put,
    "cp": cmd_cp,
    "getmerge": cmd_getmerge,
    "mkdir": cmd_mkdir,
    "mv": cmd_mv,
    "rm": cmd_rm,
    "chmod": cmd_chmod,
    "chown": cmd_chown,
    "chgrp": cmd_chgrp,
    "test": cmd_test,
    "cd": cmd_cd,
    "pwd": cmd_pwd,
    "df": cmd_df,
    "version": cmd_version,
}


#: Per-command option SPEC — the one place a verb's surface is
#: declared: ``flags`` are boolean options, ``value_opts`` consume the
#: NEXT argv token as a value (which must not count as an operand, or
#: ``hh tail -c 100`` with no path passes the gate and silently exits
#: 0), ``min_operands`` is the minimum non-option token count
#: (validated up front so a genuine IndexError inside a handler
#: surfaces as the bug it is). The parser derives operand counting
#: from this spec, so a new verb or option cannot silently regress
#: the missing-operand gate the way the old hand-kept pair of tables
#: could (one table knew about -c, the other didn't).
CLI_SPEC = {
    "ls": {"flags": {"-R"}, "value_opts": set(), "min_operands": 0},
    "find": {"flags": set(), "value_opts": {"-name", "-type"},
             "min_operands": 0},
    "du": {"flags": {"-h"}, "value_opts": set(), "min_operands": 0},
    "count": {"flags": set(), "value_opts": set(), "min_operands": 0},
    "cat": {"flags": set(), "value_opts": set(), "min_operands": 1},
    "tail": {"flags": set(), "value_opts": {"-c"}, "min_operands": 1},
    "stat": {"flags": set(), "value_opts": set(), "min_operands": 1},
    "checksum": {"flags": set(), "value_opts": set(), "min_operands": 1},
    "get": {"flags": set(), "value_opts": set(), "min_operands": 1},
    "put": {"flags": set(), "value_opts": set(), "min_operands": 2},
    "cp": {"flags": {"-f"}, "value_opts": set(), "min_operands": 2},
    "getmerge": {"flags": {"-nl"}, "value_opts": set(),
                 "min_operands": 2},
    "mkdir": {"flags": {"-p"}, "value_opts": set(), "min_operands": 1},
    "mv": {"flags": set(), "value_opts": set(), "min_operands": 2},
    "rm": {"flags": {"-r"}, "value_opts": set(), "min_operands": 1},
    "chmod": {"flags": set(), "value_opts": set(), "min_operands": 2},
    "chown": {"flags": set(), "value_opts": set(), "min_operands": 2},
    "chgrp": {"flags": set(), "value_opts": set(), "min_operands": 2},
    # test's predicate (-e/-d/-f/-z) is an option, not an operand
    "test": {"flags": {"-e", "-d", "-f", "-z"}, "value_opts": set(),
             "min_operands": 1},
    "cd": {"flags": set(), "value_opts": set(), "min_operands": 1},
    "pwd": {"flags": set(), "value_opts": set(), "min_operands": 0},
    "df": {"flags": {"-h"}, "value_opts": set(), "min_operands": 0},
    "version": {"flags": set(), "value_opts": set(), "min_operands": 0},
}


def posix_split(args: list[str]) -> tuple[list[str], list[str]]:
    """POSIX end-of-options split: ``(option_zone, forced_operands)``.
    The first literal ``--`` terminates option parsing — every token
    after it is an operand even if it starts with '-' (so a file
    literally named ``-x`` is reachable as ``hh rm -- -x``, matching
    POSIX/hadoop-fs convention). Without ``--`` the whole argv is the
    option zone, exactly as before."""
    if "--" in args:
        i = args.index("--")
        return args[:i], args[i + 1 :]
    return args, []


def count_operands(cmd: str, args: list[str]) -> tuple[int, list[str]]:
    """(non-option token count, unknown options) of ``args`` per the
    command's CLI_SPEC (a value_opt swallows its following token). An
    option token not in the verb's declared flags|value_opts is
    UNKNOWN — rejected up front, so a typo'd `-C` can't be silently
    swallowed while its intended value is miscounted as the operand.
    `stat`'s %-format and chmod's octal mode don't start with '-', so
    they count as operands as before. Tokens after a ``--`` terminator
    all count as operands (posix_split)."""
    spec = CLI_SPEC[cmd]
    zone, forced = posix_split(args)
    n, skip, unknown = len(forced), False, []
    for a in zone:
        if skip:
            skip = False
        elif a in spec["value_opts"]:
            skip = True
        elif not a.startswith("-"):
            n += 1
        elif a not in spec["flags"]:
            unknown.append(a)
    return n, unknown


def main(argv=None, spark=None, out=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print(
            "usage: python -m hadoop_tools_spark "
            f"{{{'|'.join(COMMANDS)}}} [ARGS]",
            file=out or sys.stderr,
        )
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    n_ops, unknown = count_operands(argv[0], argv[1:])
    if unknown:
        print(
            f"hh {argv[0]}: unknown option {unknown[0]!r}",
            file=out or sys.stderr,
        )
        return 2
    if n_ops < CLI_SPEC[argv[0]]["min_operands"]:
        print(f"hh {argv[0]}: missing operand", file=out or sys.stderr)
        return 2
    kwargs = {}
    if spark is not None:
        kwargs["spark"] = spark
    if out is not None:
        kwargs["out"] = out
    return COMMANDS[argv[0]](argv[1:], **kwargs)


if __name__ == "__main__":
    raise SystemExit(main())
