"""Delta _delta_log read interop (VERDICT r10 #2): checkpointed
replay, add/remove semantics, time travel, log-file open counts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def delta_table(spark, sf_dir, tmp_path_factory):
    from hadoop_tools_spark.sources.deltalog import build_delta_fixture

    path = str(tmp_path_factory.mktemp("delta") / "orders_table")
    return build_delta_fixture(spark, sf_dir, path)


def test_log_layout(delta_table):
    log = os.path.join(delta_table, "_delta_log")
    names = sorted(os.listdir(log))
    assert f"{0:020d}.json" in names
    assert f"{1:020d}.json" in names
    assert f"{2:020d}.json" in names
    assert f"{1:020d}.checkpoint.parquet" in names
    with open(os.path.join(log, "_last_checkpoint")) as fh:
        lc = json.load(fh)
    assert lc["version"] == 1
    # v0 carries protocol + metaData (protocol "first commit" rule)
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh]
    assert any("protocol" in a for a in acts)
    assert any("metaData" in a for a in acts)
    assert sum(1 for a in acts if "add" in a) == 2


def test_checkpointed_replay_skips_old_commits(delta_table):
    from hadoop_tools_spark.sources.deltalog import DeltaLogReader

    rd = DeltaLogReader(delta_table)
    assert rd.latest == 2
    state = rd.plan()  # latest
    assert rd.last_plan_stats == {
        "checkpoint_used": 1, "json_commits_read": 1,  # only v2.json
    }
    assert set(state) == {"a2.parquet", "b.parquet", "c.parquet"}
    # pre-checkpoint version: pure JSON replay
    state0 = rd.plan(0)
    assert rd.last_plan_stats == {
        "checkpoint_used": 0, "json_commits_read": 1,
    }
    assert set(state0) == {"a1.parquet", "a2.parquet"}
    with pytest.raises(KeyError):
        rd.plan(99)


def test_remove_action_and_timetravel(spark, sf_dir, delta_table):
    from hadoop_tools_spark.sources.deltalog import DeltaLogReader

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    rd = DeltaLogReader(delta_table)
    assert rd.read(spark, 0).count() == orders.filter(k % 3 != 0).count()
    v1 = rd.read(spark, 1)
    # a1 (even, %3<>0) was removed at v1
    assert v1.filter((k % 3 != 0) & (k % 2 == 0)).count() == 0
    assert v1.count() == orders.filter(
        ((k % 3 != 0) & (k % 2 == 1)) | (k % 3 == 0)
    ).count()
    # latest re-adds the %50 slice on top (multiset duplicates)
    latest = rd.read(spark)
    dup = latest.groupBy("o_orderkey").count().filter("count = 2").count()
    assert dup == orders.filter(
        (k % 50 == 0) & (((k % 3 != 0) & (k % 2 == 1)) | (k % 3 == 0))
    ).count()


def test_delta_write_read_interop(spark, sf_dir, tmp_path):
    """r11 write path: create/append/checkpoint/overwrite through
    DeltaTable, replay through DeltaLogReader — the overwrite is
    metadata-only (adds + removes in one commit) and the post-
    checkpoint replay opens exactly one JSON commit."""
    from hadoop_tools_spark.sources.deltalog import (
        DeltaLogReader,
        DeltaTable,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    path = str(tmp_path / "written_delta")
    tbl = DeltaTable.create(spark, path, orders.filter(k % 3 != 0))
    tbl.append(spark, orders.filter(k % 3 == 0))
    tbl.checkpoint()
    tbl.overwrite_with(spark, orders.filter(k % 7 == 0))

    rd = DeltaLogReader(path)
    assert rd.read(spark).count() == orders.filter(k % 7 == 0).count()
    assert rd.last_plan_stats == {
        "checkpoint_used": 1, "json_commits_read": 1,
    }
    assert rd.read(spark, 1).count() == orders.count()
    # overwrite removed every pre-existing live path
    state2 = rd.plan(2)
    assert all(p.startswith("s0002/") for p in state2)
    # schema for an empty state comes from the log's metaData
    assert "o_totalprice" in rd._log_schema_string()


def test_timestamp_time_travel(spark, delta_table):
    from hadoop_tools_spark.sources.deltalog import (
        DeltaLogReader,
        version_as_of,
    )

    rd = DeltaLogReader(delta_table)
    # fixture commits are 60 s apart starting at the fixed anchor
    t0 = 1700000000000
    assert version_as_of(rd, t0) == 0
    assert version_as_of(rd, t0 + 90000) == 1
    assert version_as_of(rd, t0 + 10**9) == 2
    with pytest.raises(ValueError, match="created later"):
        version_as_of(rd, t0 - 1)


def test_protocol_gate_refuses_newer_reader_versions(tmp_path):
    """r12 (VERDICT #3 / ADVICE): a table whose protocol demands a
    reader this code does not implement must raise, not silently
    replay adds it cannot honor (deletion vectors, column mapping)."""
    import json
    import os

    from hadoop_tools_spark.sources.deltalog import DeltaLogReader

    log_dir = tmp_path / "t" / "_delta_log"
    os.makedirs(log_dir)

    def write_commit(v, actions):
        with open(log_dir / f"{v:020d}.json", "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    meta = {"metaData": {
        "id": "x", "format": {"provider": "parquet"},
        "schemaString": json.dumps(
            {"type": "struct",
             "fields": [{"name": "k", "type": "long",
                         "nullable": True, "metadata": {}}]}),
        "partitionColumns": [], "configuration": {}, "createdTime": 0,
    }}
    add = {"add": {"path": "a.parquet", "partitionValues": {},
                   "size": 1, "modificationTime": 0, "dataChange": True}}

    # minReaderVersion 3 + deletionVectors feature → refuse at plan
    write_commit(0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        meta, add,
    ])
    rd = DeltaLogReader(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="minReaderVersion"):
        rd.plan()

    # an add action carrying a deletionVector is refused even if the
    # protocol row lies about it
    write_commit(0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta,
        {"add": {**add["add"],
                 "deletionVector": {"storageType": "u", "pathOrInlineDv":
                                    "x", "offset": 1, "sizeInBytes": 1,
                                    "cardinality": 1}}},
    ])
    rd = DeltaLogReader(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="deletion vectors"):
        rd.plan()

    # a later protocol UPGRADE commit gates too
    write_commit(0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta, add,
    ])
    write_commit(1, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
    ])
    rd = DeltaLogReader(str(tmp_path / "t"))
    assert rd.plan(0)  # old version still readable
    with pytest.raises(ValueError, match="minReaderVersion"):
        rd.plan(1)


def test_protocol_gate_supported_table_still_reads(delta_table, spark):
    """The gate must not break the supported (v1) fixture — protocol
    rows in both the JSON commits and the checkpoint are parsed."""
    from hadoop_tools_spark.sources.deltalog import DeltaLogReader

    rd = DeltaLogReader(delta_table)
    assert rd.plan() and rd.plan(0)
