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
