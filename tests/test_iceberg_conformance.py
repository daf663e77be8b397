"""Foreign-tree conformance properties (r12, VERDICT #4): randomized
spec-valid-but-adversarial Iceberg v2 metadata trees — the shapes a
FOREIGN writer may legally produce and our own fixture never does —
must plan correctly or fail closed.

Adversarial dimensions drawn per example:
- split manifests (one snapshot's files across several manifests)
- empty manifests and manifests holding only DELETED entries
- mixed specs in one manifest list (partitioned + unpartitioned)
- null partition values with contains_null summaries / null bounds
- WIDENED (but still correct) partition bounds — pruning is an
  optimization, never a correctness lever
- absent optional "partitions" summaries (null)
- EXISTING entries with explicit sequence numbers next to ADDED
  entries relying on inheritance
- unknown metadata keys, extra snapshot summary fields, extra table
  properties, re-ordered manifest-list rows

The model is recomputed in plain Python from the generated structure;
``IcebergReader.plan`` (driver metadata walk, no Spark needed) must
match it exactly, and opened+pruned must account for every manifest.
No example writes data files — planning never touches them.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ADDED, _EXISTING, _DELETED = 1, 0, 2


ENTRY = st.fixed_dictionaries({
    "status": st.sampled_from([_ADDED, _ADDED, _ADDED, _EXISTING,
                               _DELETED]),
    "part": st.one_of(st.integers(min_value=0, max_value=5), st.none()),
    "explicit_seq": st.booleans(),
})

MANIFEST = st.fixed_dictionaries({
    "spec_id": st.sampled_from([0, 0, 0, 1]),
    # spec: a manifest holds EITHER data files OR delete files
    "kind": st.sampled_from([0, 0, 0, 2]),  # data-heavy, some eq-del
    "entries": st.lists(ENTRY, min_size=0, max_size=4),
    "widen_lo": st.integers(min_value=0, max_value=2),
    "widen_hi": st.integers(min_value=0, max_value=2),
    "omit_summary": st.booleans(),
})

TREE = st.fixed_dictionaries({
    "commits": st.lists(
        st.lists(MANIFEST, min_size=0, max_size=3),
        min_size=1, max_size=3,
    ),
    "extra_meta_keys": st.booleans(),
    "shuffle_list": st.booleans(),
    "filter_value": st.integers(min_value=0, max_value=6),
})


def _build_tree(tmpdir: str, tree: dict) -> tuple[str, list[dict]]:
    """Write the adversarial metadata tree; return (table_path,
    manifest_model) where manifest_model mirrors what a correct
    reader must produce for the FINAL snapshot."""
    from hadoop_tools_spark.sources.iceberg import (
        MANIFEST_LIST_SCHEMA,
        _manifest_entry_schema,
        _part_value_bytes,
        write_ocf_generic,
    )

    path = os.path.join(tmpdir, "t")
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    schema = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "p", "required": False, "type": "int"},
        ],
    }
    part_avro = [{"name": "p", "type": ["null", "int"], "field-id": 1000}]
    specs = [
        {"spec-id": 0, "fields": [
            {"name": "p", "transform": "identity", "source-id": 2,
             "field-id": 1000},
        ]},
        {"spec-id": 1, "fields": []},
    ]

    manifest_rows: list[dict] = []   # manifest-list rows, cumulative
    model: list[dict] = []           # per manifest: spec, seq, entries
    snapshots = []
    file_no = 0
    for seq, commit in enumerate(tree["commits"], start=1):
        sid = 9000 + seq
        for mi, m in enumerate(commit):
            rows = []
            kept = []
            for e in m["entries"]:
                file_no += 1
                p = e["part"] if m["spec_id"] == 0 else None
                fpath = f"file://{path}/data/f{file_no:05d}.parquet"
                rows.append({
                    "status": e["status"],
                    "snapshot_id": sid,
                    "sequence_number": (
                        seq if (e["explicit_seq"]
                                or e["status"] != _ADDED) else None),
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": m["kind"],
                        "file_path": fpath,
                        "file_format": "PARQUET",
                        "partition": (
                            {"p": p} if m["spec_id"] == 0 else {}),
                        "record_count": 1,
                        "file_size_in_bytes": 10,
                        "equality_ids": (
                            [1] if m["kind"] == 2 else None),
                        "sort_order_id": None,
                    },
                })
                if e["status"] != _DELETED:
                    kept.append({
                        "path": fpath.replace("file://", ""),
                        "seq": seq,
                        "part": p,
                        "spec_id": m["spec_id"],
                        "content": m["kind"],
                    })
            mpath = os.path.join(meta_dir, f"m-{seq}-{mi}.avro")
            length = write_ocf_generic(
                mpath,
                _manifest_entry_schema(
                    part_avro if m["spec_id"] == 0 else []),
                rows,
                extra_meta={
                    "format-version": "2",
                    "schema": json.dumps(schema),
                    "partition-spec-id": str(m["spec_id"]),
                    "x-unknown-writer-key": "adversarial",
                },
            )
            summaries = None
            if m["spec_id"] == 0 and not m["omit_summary"]:
                vals = [e["part"] for e in m["entries"]]
                nn = [v for v in vals if v is not None]
                summaries = [{
                    "contains_null": any(v is None for v in vals),
                    "contains_nan": False,
                    # widened bounds stay spec-valid: they may only
                    # keep MORE manifests, never lose rows
                    "lower_bound": (_part_value_bytes(
                        min(nn) - m["widen_lo"], "int") if nn else None),
                    "upper_bound": (_part_value_bytes(
                        max(nn) + m["widen_hi"], "int") if nn else None),
                }]
            manifest_rows.append({
                "manifest_path": "file://" + mpath,
                "manifest_length": length,
                "partition_spec_id": m["spec_id"],
                "content": 1 if m["kind"] == 2 else 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": sid,
                "added_files_count": len(rows),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": len(rows),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": summaries,
            })
            model.append({"entries": kept})
        list_rows = list(manifest_rows)
        if tree["shuffle_list"]:
            list_rows = list(reversed(list_rows))
        ml_path = os.path.join(meta_dir, f"snap-{sid}.avro")
        write_ocf_generic(ml_path, MANIFEST_LIST_SCHEMA, list_rows,
                          extra_meta={"format-version": "2"})
        snapshots.append({
            "snapshot-id": sid,
            "sequence-number": seq,
            "timestamp-ms": 1700000000000 + seq,
            "manifest-list": "file://" + ml_path,
            "summary": {"operation": "append",
                        "x-engine": "foreign-writer",
                        "added-data-files": str(len(commit))},
            "schema-id": 0,
        })
    md = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": "file://" + path,
        "last-sequence-number": len(tree["commits"]),
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": specs,
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.foreign.custom": "yes",
                       "commit.retry.num-retries": "4"},
        "current-snapshot-id": snapshots[-1]["snapshot-id"],
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"],
             "timestamp-ms": s["timestamp-ms"]} for s in snapshots
        ],
        "metadata-log": [],
    }
    if tree["extra_meta_keys"]:
        md["x-unknown-top-level"] = {"nested": [1, 2, 3]}
        md["statistics"] = []
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return path, model


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=TREE)
def test_foreign_tree_planning_matches_model(tmp_path_factory, tree):
    from hadoop_tools_spark.sources.iceberg import IcebergReader

    tmpdir = str(tmp_path_factory.mktemp("conf"))
    path, model = _build_tree(tmpdir, tree)
    rd = IcebergReader(path)
    plan = rd.plan()

    flat = [e for m in model for e in m["entries"]]
    want_data = sorted(e["path"] for e in flat if e["content"] == 0)
    want_eq = sorted(e["path"] for e in flat if e["content"] == 2)
    assert sorted(d["path"] for d in plan["data"]) == want_data
    assert sorted(d["path"] for d in plan["eq_deletes"]) == want_eq
    # sequence-number inheritance: every surviving entry carries its
    # manifest's sequence number whether or not it was explicit
    by_path = {e["path"]: e for e in flat}
    for d in plan["data"] + plan["eq_deletes"]:
        assert d["seq"] == by_path[d["path"]]["seq"]
    st_ = rd.last_plan_stats
    assert st_["manifests_opened"] + st_["manifests_pruned"] == (
        st_["manifests_total"])

    # a partition filter must return EXACTLY the matching data files:
    # unpartitioned-spec files always survive (their manifests cannot
    # exclude the value), widened bounds must not lose rows
    v = tree["filter_value"]
    fplan = rd.plan(part_filter={"p": v})
    want_f = sorted(
        e["path"] for e in flat
        if e["content"] == 0 and (e["spec_id"] == 1 or e["part"] == v)
    )
    assert sorted(d["path"] for d in fplan["data"]) == want_f
    # NULL filter: only null-partition + unpartitioned files remain
    nplan = rd.plan(part_filter={"p": None})
    want_n = sorted(
        e["path"] for e in flat
        if e["content"] == 0 and (e["spec_id"] == 1 or e["part"] is None)
    )
    assert sorted(d["path"] for d in nplan["data"]) == want_n


def test_foreign_tree_fails_closed_on_bad_inheritance(tmp_path):
    """A null sequence_number on a non-ADDED entry is NOT legal
    inheritance — the reader must raise, not guess."""
    from hadoop_tools_spark.sources.iceberg import IcebergReader

    tree = {
        "commits": [[{
            "spec_id": 1, "omit_summary": True,
            "widen_lo": 0, "widen_hi": 0,
            "kind": 0,
            "entries": [{"status": _EXISTING, "part": None,
                         "explicit_seq": True}],
        }]],
        "extra_meta_keys": False, "shuffle_list": False,
        "filter_value": 0,
    }
    path, _ = _build_tree(str(tmp_path), tree)
    # corrupt: rewrite the manifest with a null seq on the EXISTING row
    from hadoop_tools_spark.sources.iceberg import (
        _manifest_entry_schema,
        read_ocf_generic,
        write_ocf_generic,
    )

    meta_dir = os.path.join(path, "metadata")
    mpath = os.path.join(meta_dir, "m-1-0.avro")
    with open(mpath, "rb") as fh:
        schema, rows = read_ocf_generic(fh.read())
    rows[0]["sequence_number"] = None
    write_ocf_generic(mpath, _manifest_entry_schema([]), rows,
                      extra_meta={"format-version": "2"})
    rd = IcebergReader(path)
    with pytest.raises(ValueError, match="non-ADDED"):
        rd.plan()


def test_foreign_tree_format_version_gate(tmp_path):
    from hadoop_tools_spark.sources.iceberg import IcebergReader

    tree = {
        "commits": [[]], "extra_meta_keys": False,
        "shuffle_list": False, "filter_value": 0,
    }
    path, _ = _build_tree(str(tmp_path), tree)
    mdp = os.path.join(path, "metadata", "v1.metadata.json")
    md = json.load(open(mdp))
    md["format-version"] = 3
    json.dump(md, open(mdp, "w"))
    with pytest.raises(ValueError, match="format-version"):
        IcebergReader(path)
