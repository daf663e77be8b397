"""hh-compatible CLI (`python -m hadoop_tools_spark CMD`): every
subcommand of the reference's executable driven end-to-end against a
local namespace, with the pytest session's SparkSession injected so
tests don't pay per-command JVM startup."""

from __future__ import annotations

import io
import os

import pytest

from hadoop_tools_spark import cli


@pytest.fixture()
def ns(spark, tmp_path, monkeypatch):
    """A small namespace + isolated cwd state file."""
    monkeypatch.setenv("HTS_CWD_FILE", str(tmp_path / ".cwd"))
    base = tmp_path / "ns"
    (base / "logs").mkdir(parents=True)
    (base / "data").mkdir()
    (base / "logs" / "a.log").write_text("alpha\n")
    (base / "logs" / "b.log").write_text("beta\n")
    (base / "data" / "x.bin").write_bytes(b"\x00\x01\x02")
    return str(base)


def run(spark, *argv):
    out = io.StringIO()
    rc = cli.main(list(argv), spark=spark, out=out)
    return rc, out.getvalue()


def test_ls_glob_and_format(spark, ns):
    rc, txt = run(spark, "ls", f"{ns}/logs/*.log")
    assert rc == 0
    lines = txt.strip().splitlines()
    assert len(lines) == 2
    assert lines[0].endswith("a.log") and lines[1].endswith("b.log")
    assert lines[0].startswith("-rw")  # perm string rendered


def test_ls_directory_lists_children(spark, ns):
    rc, txt = run(spark, "ls", ns)
    names = [l.rsplit("/", 1)[-1] for l in txt.strip().splitlines()]
    assert names == ["data", "logs"]


def test_find_name_glob(spark, ns):
    rc, txt = run(spark, "find", ns, "-name", "*.log")
    assert rc == 0
    assert [p.rsplit("/", 1)[-1] for p in txt.strip().splitlines()] == [
        "a.log",
        "b.log",
    ]


def test_du_per_child_totals(spark, ns):
    rc, txt = run(spark, "du", ns)
    assert rc == 0
    by_child = {
        l.split()[-1].rsplit("/", 1)[-1]: int(l.split()[1])
        for l in txt.strip().splitlines()
    }
    assert by_child == {"data": 1, "logs": 2}


def test_cat_bytes(spark, ns):
    buf = io.BytesIO()
    rc = cli.main(["cat", f"{ns}/logs/a.log"], spark=spark, out=buf)
    assert rc == 0 and buf.getvalue() == b"alpha\n"


def test_mkdir_mv_rm_test_roundtrip(spark, ns):
    assert cli.main(["mkdir", f"{ns}/new/deep"], spark=spark) == 0
    assert cli.main(["test", "-d", f"{ns}/new/deep"], spark=spark) == 0
    assert cli.main(["mv", f"{ns}/new/deep", f"{ns}/new/moved"], spark=spark) == 0
    assert cli.main(["test", "-e", f"{ns}/new/deep"], spark=spark) == 1
    assert cli.main(["test", "-d", f"{ns}/new/moved"], spark=spark) == 0
    assert cli.main(["rm", "-r", f"{ns}/new"], spark=spark) == 0
    assert cli.main(["test", "-e", f"{ns}/new"], spark=spark) == 1


def test_get_put_roundtrip(spark, ns, tmp_path):
    local = tmp_path / "local.txt"
    local.write_text("roundtrip")
    assert cli.main(["put", str(local), f"{ns}/data/up.txt"], spark=spark) == 0
    assert cli.main(["test", "-f", f"{ns}/data/up.txt"], spark=spark) == 0
    dst = tmp_path / "fetched.txt"
    assert cli.main(["get", f"{ns}/data/up.txt", str(dst)], spark=spark) == 0
    assert dst.read_text() == "roundtrip"


def test_chmod(spark, ns):
    path = f"{ns}/logs/a.log"
    assert cli.main(["chmod", "600", path], spark=spark) == 0
    assert (os.stat(path).st_mode & 0o777) == 0o600
    assert cli.main(["chmod", "644", path], spark=spark) == 0


def test_cd_pwd_relative_resolution(spark, ns):
    assert cli.main(["cd", ns], spark=spark) == 0
    rc, txt = run(spark, "pwd")
    assert rc == 0 and txt.strip() == ns
    # relative path resolves against persisted cwd
    rc, txt = run(spark, "find", "logs", "-name", "*.log")
    assert len(txt.strip().splitlines()) == 2


def test_version_and_usage(spark):
    rc, txt = run(spark, "version")
    assert rc == 0 and "hh" in txt
    assert cli.main(["definitely-not-a-cmd"], out=io.StringIO()) == 2


def test_ls_recursive_flag(spark, ns):
    rc, txt = run(spark, "ls", "-R", ns)
    names = [l.rsplit("/", 1)[-1] for l in txt.strip().splitlines()]
    assert names == ["data", "x.bin", "logs", "a.log", "b.log"]


def test_find_type_filter(spark, ns):
    rc, txt = run(spark, "find", ns, "-type", "d")
    names = [p.rsplit("/", 1)[-1] for p in txt.strip().splitlines()]
    assert names == ["data", "logs"]
    rc, txt = run(spark, "find", ns, "-type", "f")
    assert all(
        p.rsplit("/", 1)[-1] in {"a.log", "b.log", "x.bin"}
        for p in txt.strip().splitlines()
    )

def test_cmd_count_content_summary(spark):
    """`hh count` prints DIR_COUNT FILE_COUNT CONTENT_SIZE PATH with
    totals matching an independent os.walk."""
    import os

    from hadoop_tools_spark.cli import cmd_count

    import io

    root = "/root/testdata/sf0.001"
    buf = io.StringIO()
    rc = cmd_count([root], spark=spark, out=buf)
    assert rc == 0
    out = buf.getvalue().strip().split()
    n_files = sum(len(fs) for _, _, fs in os.walk(root))
    n_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(root)
        for f in fs
    )
    assert int(out[0]) >= 1          # at least the root dir itself
    assert int(out[1]) == n_files
    assert int(out[2]) == n_bytes
    assert out[3] == root


def test_tail_last_bytes(spark, ns):
    import io as _io

    buf = _io.BytesIO()
    rc = cli.main(["tail", "-c", "3", f"{ns}/logs/a.log"], spark=spark, out=buf)
    assert rc == 0 and buf.getvalue() == b"ha\n"
    # n larger than the file: whole file, no error
    buf = _io.BytesIO()
    rc = cli.main(["tail", "-c", "999", f"{ns}/logs/b.log"], spark=spark, out=buf)
    assert rc == 0 and buf.getvalue() == b"beta\n"
    # directory is an error like hadoop fs -tail
    buf = _io.BytesIO()
    rc = cli.main(["tail", f"{ns}/logs"], spark=spark, out=buf)
    assert rc == 1


def test_stat_format_specifiers(spark, ns):
    import io as _io

    out = _io.StringIO()
    rc = cli.main(
        ["stat", "%n %b %F", f"{ns}/logs/a.log"], spark=spark, out=out
    )
    assert rc == 0
    assert out.getvalue().strip() == "a.log 6 regular file"
    out = _io.StringIO()
    rc = cli.main(["stat", "%F", f"{ns}/logs"], spark=spark, out=out)
    assert rc == 0 and out.getvalue().strip() == "directory"
    out = _io.StringIO()
    rc = cli.main(["stat", "%n", f"{ns}/nope"], spark=spark, out=out)
    assert rc == 1


def test_checksum_matches_hashlib(spark, ns):
    import hashlib
    import io as _io

    out = _io.StringIO()
    rc = cli.main(["checksum", f"{ns}/logs/a.log"], spark=spark, out=out)
    assert rc == 0
    path, algo, digest, size = out.getvalue().strip().split("\t")
    raw = open(path.replace("file:", ""), "rb").read()
    assert algo == "MD5"
    assert digest == hashlib.md5(raw).hexdigest()
    assert int(size) == len(raw)
    # glob expands engine-side; missing path is rc 1
    out = _io.StringIO()
    rc = cli.main(["checksum", f"{ns}/logs/*.log"], spark=spark, out=out)
    assert rc == 0 and len(out.getvalue().strip().splitlines()) >= 2
    assert cli.main(["checksum", f"{ns}/nope"], spark=spark) == 1


def test_du_trailing_slash_and_count_file(spark, ns):
    """`du dir/` must not strip the root to '' (Path('') throws), and
    `count FILE` reports 0 directories like `hadoop fs -count`."""
    rc, txt = run(spark, "du", ns + "/")
    assert rc == 0
    children = {l.split()[-1].rsplit("/", 1)[-1] for l in txt.strip().splitlines()}
    assert children == {"data", "logs"}
    rc, txt = run(spark, "count", f"{ns}/logs/a.log")
    assert rc == 0
    dirs, files, _bytes, _path = txt.split()
    assert (dirs, files) == ("0", "1")


def test_cat_missing_path_is_an_error(spark, ns):
    rc, _ = run(spark, "cat", f"{ns}/no/such/file")
    assert rc == 1


def test_stat_format_with_literal_prefix(spark, ns):
    rc, txt = run(spark, "stat", "size=%b", f"{ns}/logs/a.log")
    assert rc == 0
    assert txt.strip() == "size=6"


def test_missing_operand_rc2(spark):
    assert run(spark, "put", "onearg")[0] == 2
    assert run(spark, "mv", "only")[0] == 2
    assert run(spark, "test")[0] == 2
    rc, _ = run(spark, "find", "/tmp", "-name")
    assert rc == 2
    # an option VALUE must not satisfy the operand count: `tail -c 100`
    # has no path and must be rc 2, not a silent rc-0 no-op
    assert run(spark, "tail", "-c", "100")[0] == 2
    assert run(spark, "cat")[0] == 2


def test_scan_local_dirs_skips_broken_entry_not_siblings(tmp_path):
    """One broken symlink must not hide its siblings or subtrees."""
    from hadoop_tools_spark.sources.listing import _scan_local_dirs

    d = tmp_path / "walk"
    d.mkdir()
    # scandir order is arbitrary; name the symlink to sort first in
    # most filesystems and rely on per-entry handling either way
    (d / "0broken").symlink_to(d / "missing-target")
    (d / "real.dat").write_bytes(b"x" * 7)
    (d / "sub").mkdir()
    rows = list(_scan_local_dirs([str(d)]))
    kinds = {(k, p.rsplit("/", 1)[-1]) for k, p, *_ in rows}
    assert ("f", "real.dat") in kinds
    assert ("d", "sub") in kinds


def test_distributed_walk_include_dirs_and_cache_release(spark, ns):
    from hadoop_tools_spark.sources.listing import list_files_distributed

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = list_files_distributed(spark, ns, include_dirs=True)
    rows = {(r.name, r.is_dir) for r in df.collect()}
    assert ("a.log", False) in rows and ("logs", True) in rows
    # every per-round RDD was released; only the final DISK_ONLY
    # listing remains cached beyond the baseline
    assert jsc.getPersistentRDDs().size() <= before + 1
    df.unpersist(True)
    # cmd_find releases its walk once rendered: no net new cache
    rc, _ = run(spark, "find", ns, "-name", "*.log")
    assert rc == 0
    assert jsc.getPersistentRDDs().size() <= max(before, 1)


def test_cli_spec_covers_every_command():
    """CLI_SPEC and COMMANDS must stay in lockstep — a new verb without
    a spec entry would bypass the operand gate."""
    assert set(cli.CLI_SPEC) == set(cli.COMMANDS)


def test_every_verb_missing_operand_is_rc2(spark):
    """Property over ALL verbs: any argv consisting only of the verb's
    declared options (flags, and each value_opt WITH its value) has
    zero operands, so every verb with min_operands >= 1 must return
    rc 2 — the class fix for the old hand-kept-tables regression where
    `tail -c 100` silently exited 0."""
    for verb, spec in cli.CLI_SPEC.items():
        if spec["min_operands"] < 1:
            continue
        variants = [[]]
        variants += [[f] for f in sorted(spec["flags"])]
        variants += [[v, "123"] for v in sorted(spec["value_opts"])]
        if spec["flags"] or spec["value_opts"]:
            variants.append(
                sorted(spec["flags"])
                + [t for v in sorted(spec["value_opts"]) for t in (v, "9")]
            )
        for extra in variants:
            rc, _ = run(spark, verb, *extra)
            assert rc == 2, (verb, extra, rc)


def test_one_missing_of_two_operands_is_rc2(spark):
    """Verbs needing two operands must reject exactly-one even when
    options pad the argv."""
    for verb in ("put", "mv", "chmod", "chown", "chgrp"):
        assert cli.CLI_SPEC[verb]["min_operands"] == 2
        rc, _ = run(spark, verb, "only-one")
        assert rc == 2, verb


def test_unknown_option_is_rc2_not_swallowed(spark):
    """A typo'd option must be rejected, not silently treated as a
    flag while its intended value is miscounted as an operand (the r8
    review's `hh tail -C 100` case — '100' would have become the
    path)."""
    rc, txt = run(spark, "tail", "-C", "100")
    assert rc == 2 and "unknown option" in txt
    assert run(spark, "ls", "-Q")[0] == 2
    assert run(spark, "rm", "-rf", "x")[0] == 2  # -rf is not -r


def test_double_dash_terminates_options(spark, ns, tmp_path):
    """POSIX `--` end-of-options: tokens after it are operands even if
    they start with '-', so a file literally named '-x' is reachable
    (ADVICE r8 — previously any '-'-token not in the verb's flags was
    rejected outright with no escape hatch)."""
    import io as _io

    weird = os.path.join(ns, "data", "-x")
    with open(weird, "w") as f:
        f.write("dashfile\n")

    # cat -- -x reads the file instead of rejecting an unknown option
    buf = _io.BytesIO()
    rc = cli.main(["cat", "--", weird], spark=spark, out=buf)
    assert rc == 0 and buf.getvalue() == b"dashfile\n"

    # test/rm reach it too; rm -r before `--` still parses as the flag
    assert cli.main(["test", "-f", "--", weird], spark=spark) == 0
    assert cli.main(["rm", "--", weird], spark=spark) == 0
    assert cli.main(["test", "-e", "--", weird], spark=spark) == 1

    # ls -- -R lists a literal '-R' operand (here: missing -> no rows,
    # rc 0 like a glob with no matches), NOT a recursive listing
    rc, txt = run(spark, "ls", "--", os.path.join(ns, "nope-*"))
    assert rc == 0 and txt.strip() == ""

    # the forced operands COUNT for the min_operands gate
    assert cli.main(["cat", "--"], spark=spark) == 2
    # and an unknown option BEFORE `--` is still rejected
    rc, txt = run(spark, "ls", "-Q", "--", ns)
    assert rc == 2 and "unknown option" in txt

    # count_operands unit surface: forced tokens are operands
    n, unknown = cli.count_operands("rm", ["-r", "--", "-x", "-y"])
    assert (n, unknown) == (2, [])


def test_tail_non_numeric_count_is_rc2(spark, ns):
    """`hh tail -c foo FILE` must report usage rc 2, not traceback
    out of main() with ValueError (r9 review)."""
    rc, _ = run(spark, "tail", "-c", "foo", f"{ns}/logs/a.log")
    assert rc == 2


def test_cp_copies_within_fs(spark, ns, tmp_path):
    rc, _ = run(spark, "cp", f"{ns}/logs/a.log", f"{ns}/logs/a2.log")
    assert rc == 0
    assert (
        open(f"{ns}/logs/a2.log").read() == open(f"{ns}/logs/a.log").read()
    )
    # recursive directory copy
    rc, _ = run(spark, "cp", f"{ns}/logs", f"{ns}/logs_copy")
    assert rc == 0
    rc, txt = run(spark, "ls", f"{ns}/logs_copy")
    assert rc == 0 and "a.log" in txt and "b.log" in txt
    # missing operand -> usage gate
    rc, _ = run(spark, "cp", f"{ns}/logs/a.log")
    assert rc == 2


def test_getmerge_concatenates_in_name_order(spark, ns, tmp_path):
    dst = str(tmp_path / "merged.txt")
    rc, _ = run(spark, "getmerge", f"{ns}/logs", dst)
    assert rc == 0
    a = open(f"{ns}/logs/a.log").read()
    b = open(f"{ns}/logs/b.log").read()
    assert open(dst).read() == a + b  # name order: a.log then b.log

    dst2 = str(tmp_path / "merged_nl.txt")
    rc, _ = run(spark, "getmerge", "-nl", f"{ns}/logs", dst2)
    assert rc == 0
    assert open(dst2).read() == a + "\n" + b + "\n"

    # missing source dir is an error, not a crash
    rc, _ = run(spark, "getmerge", f"{ns}/nope", str(tmp_path / "x"))
    assert rc == 1


def test_cp_refuses_existing_destination_without_f(spark, ns):
    """`hh cp` without -f must not clobber (the `hadoop fs -cp`
    contract, r10 ADVICE fix); -f overwrites."""
    src, dst = f"{ns}/logs/a.log", f"{ns}/logs/b.log"
    before = open(dst).read()
    rc, _ = run(spark, "cp", src, dst)
    assert rc == 1
    assert open(dst).read() == before  # untouched
    rc, _ = run(spark, "cp", "-f", src, dst)
    assert rc == 0
    assert open(dst).read() == open(src).read()
    # copying INTO an existing dir guards the effective target too
    rc, _ = run(spark, "cp", src, f"{ns}/logs")
    assert rc == 1


def test_df_reports_capacity(spark):
    """`hh df` prints the `hadoop fs -df` columns with sane numbers;
    -h switches to human units."""
    rc, txt = run(spark, "df", "/")
    assert rc == 0
    lines = txt.strip().splitlines()
    assert lines[0].split() == ["Filesystem", "Size", "Used",
                                "Available", "Use%"]
    parts = lines[1].split()
    cap, used, avail = int(parts[1]), int(parts[2]), int(parts[3])
    assert cap > 0 and 0 <= used <= cap and 0 <= avail <= cap
    assert parts[4].endswith("%")
    rc, txt = run(spark, "df", "-h")
    assert rc == 0 and any(
        u in txt for u in ("K", "M", "G", "T")
    )
    # operand gate: unknown option still rejected
    rc, _ = run(spark, "df", "-z")
    assert rc == 2
