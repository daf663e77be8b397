"""Unit tests for the custom Python DataSource seams (sources/pyds.py)
not reachable through the oracle-parity sweep: the writer's abort
contract and identifier validation in the federation reader."""

from __future__ import annotations

import pytest


def test_jsonl_abort_tolerates_failed_task_messages(tmp_path):
    """Per the DataSourceWriter contract a FAILED task's commit
    message arrives as None — the exact case abort() serves. It must
    skip them and still unlink the succeeded tasks' staged files."""
    from hadoop_tools_spark.sources.pyds import _JsonlCommit, JsonlWriter

    staged = tmp_path / "part-ok.jsonl"
    staged.write_text('{"x": 1}\n')
    w = JsonlWriter({"path": str(tmp_path)})
    w.abort([None, _JsonlCommit(str(staged), 1), None])
    assert not staged.exists()


def test_fed_reader_rejects_malformed_identifiers():
    """Every name that reaches the remote SQL f-string is identifier-
    validated; range bounds stay parameter-bound."""
    from hadoop_tools_spark.sources.fed import DuckFedReader

    opts = {"path": "/x.db", "lower": "0", "upper": "9"}
    ok = DuckFedReader(opts, ["l_orderkey", "l_quantity"])
    assert ok.cols == "l_orderkey, l_quantity"
    with pytest.raises(ValueError, match="identifier"):
        DuckFedReader({**opts, "table": "t; DROP TABLE x"}, ["a"])
    with pytest.raises(ValueError, match="identifier"):
        DuckFedReader(opts, ["a", "b) FROM secrets --"])


def test_scan_arrow_ipc_matches_pyarrow_direct(spark):
    """Every row the distributed Arrow-IPC scan emits must equal a
    driver-local pyarrow read of the same shard — including NULL names
    (id % 17) and negative values (id % 29)."""
    import glob

    import pyarrow as pa

    from hadoop_tools_spark.operators.multimodal import MEDIA_DIR
    from hadoop_tools_spark.sources.roundtrip import scan_arrow_ipc

    got = {
        (r.shard, r.id): (r.name, r.value)
        for r in scan_arrow_ipc(spark, "/root/testdata/sf0.001").collect()
    }
    expect = {}
    shards = sorted(glob.glob(f"{MEDIA_DIR}/tbl_*.arrow"))
    assert len(shards) == 3
    for p in shards:
        shard = p.rsplit("/", 1)[-1]
        with pa.ipc.open_file(p) as r:
            t = r.read_all()
            for rid, name, val in zip(
                t["id"].to_pylist(), t["name"].to_pylist(),
                t["value"].to_pylist(),
            ):
                expect[(shard, rid)] = (name, val)
    assert got == expect
    assert any(n is None for n, _ in expect.values())
    assert any(v < 0 for _, v in expect.values())
