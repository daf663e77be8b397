"""Semantic invariants for the round-10 keys (oracle hash parity is
the driver's job; these pin the properties a hash can't see)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_dq_drift_psi_terms_nonnegative_and_counts_cover(spark, sf_dir):
    """Every PSI term is ≥ 0 by construction ((p−q) and ln(p/q) share
    sign), NULL only when a bucket misses a side, and the per-feature
    counts add back to the corpus split."""
    from hadoop_tools_spark.operators.analytics import dq_drift_psi

    rows = dq_drift_psi(spark, sf_dir).collect()
    feats = {r["feature"] for r in rows}
    assert feats == {"n_chars", "lang"}
    for r in rows:
        if r["psi_term"] is not None:
            assert r["psi_term"] >= 0, r
        else:
            assert r["n_ref"] == 0 or r["n_cur"] == 0, r
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_ref = docs.filter(F.col("doc_id") % 2 == 0).count()
    n_cur = docs.count() - n_ref
    for feat in feats:
        fr = [r for r in rows if r["feature"] == feat]
        assert sum(r["n_ref"] for r in fr) == n_ref
        assert sum(r["n_cur"] for r in fr) == n_cur


def test_sft_render_md5_and_truncation_flag(spark, sf_dir):
    """The surfaced md5 is the md5 of the locally re-rendered template
    for a sampled doc, and `truncated` is exactly n_tokens > budget."""
    from hadoop_tools_spark.operators.llm_text import (
        _SFT_BUDGET,
        _SFT_PROMPT_WORDS,
        llm_sft_render,
    )

    out = {r["doc_id"]: r for r in llm_sft_render(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).collect()
    assert docs
    for d in docs:
        ws = d["text"].split(" ")
        rendered = (
            "<|user|>\n"
            + " ".join(ws[:_SFT_PROMPT_WORDS])
            + "\n<|assistant|>\n"
            + " ".join(ws[_SFT_PROMPT_WORDS:])
        )
        r = out[d["doc_id"]]
        assert r["rendered_md5"] == hashlib.md5(
            rendered.encode()
        ).hexdigest(), d["doc_id"]
        assert r["n_tokens"] == len(rendered.split(" "))
        assert r["truncated"] == int(r["n_tokens"] > _SFT_BUDGET)


def test_win_ntile_balanced_and_monotone(spark, sf_dir):
    """Per segment: deciles are 1..10, sizes differ by ≤ 1 (the NTILE
    contract), and balance ranges are non-overlapping and ascending."""
    from hadoop_tools_spark.operators.windows import win_ntile

    rows = win_ntile(spark, sf_dir).collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    assert by_seg
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r["decile"])
        assert [r["decile"] for r in rs] == list(range(1, len(rs) + 1))
        sizes = [r["n_customers"] for r in rs]
        assert max(sizes) - min(sizes) <= 1, (seg, sizes)
        for a, b in zip(rs, rs[1:]):
            assert a["max_bal_c"] <= b["min_bal_c"], (seg, a, b)


def test_ohlc_bars_bounds_and_totals(spark, sf_dir):
    """low ≤ open, close ≤ high per bar; bar event counts add back to
    the non-null-value event total."""
    from hadoop_tools_spark.operators.timeseries import ts_ohlc_bars

    rows = ts_ohlc_bars(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low_c"] <= r["open_c"] <= r["high_c"], r
        assert r["low_c"] <= r["close_c"] <= r["high_c"], r
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.filter(
        F.col("value").isNotNull()
    ).count()


def test_kn_probs_exact_against_python_recount(spark, sf_dir):
    """Recompute the full KN statistics in plain Python (Counter over
    the corpus bigrams) and check every reported probability EXACTLY
    (same IEEE expression shape, so equality after the key's ROUND(8))
    — this is what pins that the discount and the continuation mass
    are both actually applied, not just that values look plausible."""
    from collections import Counter

    from hadoop_tools_spark.operators.llm_text import _KN_D, llm_ngram_kn

    rows = llm_ngram_kn(spark, sf_dir).collect()
    assert rows
    c12: Counter = Counter()
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        ws = d["text"].split(" ")
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    n1: Counter = Counter()
    fanout: Counter = Counter()
    n_prec: Counter = Counter()
    for (a, b), c in c12.items():
        n1[a] += c
        fanout[a] += 1
        n_prec[b] += 1
    n_types = len(c12)
    for r in rows:
        c = c12[(r["w1"], r["w2"])]
        assert c == r["n12"], r
        expect = (
            max(c - _KN_D, 0.0)
            + _KN_D * fanout[r["w1"]] * (n_prec[r["w2"]] / n_types)
        ) / n1[r["w1"]]
        assert round(expect, 8) == r["kn_prob"], (r, expect)
        # discounted MLE alone strictly underestimates: continuation
        # mass is positive for every observed bigram
        assert r["kn_prob"] > round(
            max(c - _KN_D, 0.0) / n1[r["w1"]] - 1e-12, 8
        ) or r["kn_prob"] == round(expect, 8)
    # the top-K cut rides the documented total order
    pairs = [(-r["n12"], r["w1"], r["w2"]) for r in rows]
    assert pairs == sorted(pairs)


def test_rouge_f1_bounds(spark, sf_dir):
    """0 ≤ F1 ≤ 1 and overlap ≤ min(n_a, n_b) for every pair; pair
    count = docs − distinct sources (one chain per source)."""
    from hadoop_tools_spark.operators.llm_text import llm_rouge_f1

    rows = llm_rouge_f1(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rouge1_f1"] <= 1.0, r
        assert r["overlap"] <= min(r["n_a"], r["n_b"]), r
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_docs - n_sources


def test_quantile_disc_membership_and_order(spark, sf_dir):
    """Discrete quantiles are actual cents-scaled member prices and
    p50 ≤ p90 ≤ p99 per group."""
    from hadoop_tools_spark.operators.aggregates import agg_quantile_disc

    rows = agg_quantile_disc(spark, sf_dir).collect()
    assert rows
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    member = {
        (r["o_orderpriority"], r["c"])
        for r in orders.select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("c"),
        ).collect()
    }
    for r in rows:
        assert r["p50_c"] <= r["p90_c"] <= r["p99_c"], r
        for col in ("p50_c", "p90_c", "p99_c"):
            assert (r["o_orderpriority"], r[col]) in member, (col, r)


def test_avro_ocf_codec_roundtrip_units(tmp_path):
    """Pure-codec unit check (no Spark): nullable mixed-type rows
    survive write_ocf → read_ocf under both codecs, including an
    empty-block tail and non-ASCII strings."""
    import io

    from pyspark.sql import types as T

    from hadoop_tools_spark.sources.avro import read_ocf, write_ocf

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("y", T.BinaryType()),
        ]
    )
    rows = [
        (-(2**62), "héllo ünïcode", 1.5e308, True, b"\x00\xff"),
        (None, None, None, None, None),
        (7, "", -0.0, False, b""),
    ] * 100
    for codec in ("null", "deflate"):
        buf = io.BytesIO()
        n = write_ocf(buf, schema, rows, codec=codec, block_rows=7)
        names, back = read_ocf(buf.getvalue())
        assert n == len(rows)
        assert names == ["a", "s", "d", "b", "y"]
        assert back == rows


def test_avro_spark_roundtrip_preserves_null_vs_nan(spark, tmp_path):
    """Distributed write_avro/read_avro must keep NULL distinct from a
    genuine NaN double and carry NULL longs/strings — the exact trap
    the mapInArrow form exists for (pandas would collapse nullable
    numerics to NaN). Also pins retry-safe naming: files are
    part-<partitionId>, so a rewrite lands on the same names."""
    import math
    import os

    from pyspark.sql import types as T

    from hadoop_tools_spark.sources.avro import read_avro, write_avro

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = [
        (1, float("nan"), "a"),
        (2, None, "b"),
        (None, 3.5, None),
        (4, -0.0, ""),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    path = str(tmp_path / "avro_nulls")
    write_avro(df, path, codec="deflate")
    back = {
        r["s"]: r for r in read_avro(spark, path, schema).collect()
    }
    assert math.isnan(back["a"]["x"])  # NaN stayed a VALUE
    assert back["b"]["x"] is None  # NULL stayed NULL
    assert back[None]["k"] is None
    assert back[""]["x"] == 0.0
    # deterministic per-partition names: a second write overwrites,
    # and the sweep also clears a stale tmp orphan from a dead
    # attempt (ADVICE r10)
    names1 = sorted(f for f in os.listdir(path) if f.endswith(".avro"))
    orphan = os.path.join(path, "part-00099.avro.tmp-12345")
    with open(orphan, "wb") as fh:
        fh.write(b"dead attempt")
    write_avro(df, path, codec="deflate")
    assert not os.path.exists(orphan)
    names2 = sorted(f for f in os.listdir(path) if f.endswith(".avro"))
    assert names1 == names2


def test_upsert_sink_accepts_map_payload(spark, tmp_path):
    """A MapType payload column must not brick the sink's tie-break
    hash (xxhash64 rejects maps) — unhashable columns drop out of the
    tie-break, hashable ones still pin the winner."""
    from pyspark.sql import types as T

    from hadoop_tools_spark.streaming.sinks import IdempotentUpsertSink

    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("payload", T.StringType()),
            T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    rows = [
        ("u1", 5, "first", {"a": 1}),
        ("u1", 5, "second", {"b": 2}),
    ]
    sink = IdempotentUpsertSink(
        str(tmp_path / "map_tbl"), ["user_id"], ["ts"]
    )
    sink(spark.createDataFrame(rows, schema), 0)  # must not raise
    got = sink.table.read(spark).collect()
    assert len(got) == 1 and got[0]["user_id"] == "u1"


def test_fourier_power_exact_against_python_recount(spark, sf_dir):
    """Recompute the periodogram in plain Python with the SAME pinned
    2π literal and fixed-point term flooring; every BIGINT sum must
    match exactly and the power must equal the identical IEEE
    expression (pins that the angle convention, the grid origin, and
    the fixed-point contract all survived the Spark plan)."""
    import math
    from collections import Counter

    from hadoop_tools_spark.operators.timeseries import (
        _FOURIER_K,
        _TAU,
        ts_fourier_power,
    )

    rows = ts_fourier_power(spark, sf_dir).collect()
    assert rows and len(rows) % _FOURIER_K == 0
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    epoch = None
    counts: Counter = Counter()
    for e in ev:
        idx = int(
            (e["ts"] - __import__("datetime").datetime(1970, 1, 1))
            .total_seconds() // 3600
        )
        counts[(e["event_type"], idx)] += 1
    mn = min(i for _, i in counts)
    n = max(i for _, i in counts) - mn + 1
    sc: Counter = Counter()
    ss: Counter = Counter()
    for (et, idx), x in counts.items():
        for k in range(1, _FOURIER_K + 1):
            th = _TAU * k * (idx - mn) / n
            sc[(et, k)] += int(math.floor(x * math.cos(th) * 1_000_000 + 0.5))
            ss[(et, k)] += int(math.floor(x * math.sin(th) * 1_000_000 + 0.5))
    for r in rows:
        key = (r["event_type"], r["k"])
        assert r["sc6"] == sc[key], (key, r["sc6"], sc[key])
        assert r["ss6"] == ss[key], (key, r["ss6"], ss[key])
        expect = round(
            (sc[key] / 1_000_000) * (sc[key] / 1_000_000)
            + (ss[key] / 1_000_000) * (ss[key] / 1_000_000),
            6,
        )
        assert r["power"] == expect, (key, r["power"], expect)


def test_snapshot_restore_roundtrip_and_history(spark, sf_dir, tmp_path):
    """restore(v) makes the head read EQUAL the restored version
    (exceptAll empty both ways), keeps the bad version time-travelable,
    records restored_from in the manifest, and is itself undoable."""
    from hadoop_tools_spark.sources.snapshots import SnapshotTable

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    ).limit(60)
    from pyspark.sql import functions as F

    bad = orders.withColumn("o_orderstatus", F.lit("CORRUPT"))
    tbl = SnapshotTable(str(tmp_path / "restore_tbl"))
    tbl.create(orders)
    tbl.overwrite(bad)
    v2 = tbl.restore(0)
    head = tbl.read(spark)
    v0 = tbl.read(spark, version=0)
    assert head.exceptAll(v0).count() == 0
    assert v0.exceptAll(head).count() == 0
    assert tbl._manifest(v2)["restored_from"] == 0
    # the bad version is still reachable
    assert tbl.read(spark, version=1).filter(
        F.col("o_orderstatus") == "CORRUPT"
    ).count() == 60
    # undo = restore the bad version again, as another commit
    v3 = tbl.restore(1)
    assert tbl._manifest(v3)["restored_from"] == 1
    assert tbl.read(spark).filter(
        F.col("o_orderstatus") == "CORRUPT"
    ).count() == 60
    assert tbl.versions() == [0, 1, 2, 3]


def test_blocklist_hits_match_python_recount(spark, sf_dir):
    """Hit counts equal a plain-Python non-overlapping scan and the
    first_hit term is the leftmost match (NULL when clean)."""
    import re

    from hadoop_tools_spark.operators.llm_text import (
        _BLOCK_RE,
        llm_blocklist_filter,
    )

    rows = {r["doc_id"]: r for r in llm_blocklist_filter(spark, sf_dir).collect()}
    pat = re.compile(_BLOCK_RE)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    blocked = 0
    for d in docs:
        hits = pat.findall(d["text"])
        r = rows[d["doc_id"]]
        assert r["n_hits"] == len(hits), d["doc_id"]
        assert r["first_hit"] == (hits[0] if hits else None)
        blocked += r["blocked"]
    assert 0 < blocked < len(docs)  # the fixture exercises both sides


def test_apply_changes_atomic_and_rejects_bad_ops(spark, sf_dir, tmp_path):
    """apply_changes lands updates+deletes at ONE version (atomicity),
    routes ops correctly, raises on unknown op codes, and an
    all-delete change set works (empty upsert stage)."""
    import pytest
    from pyspark.sql import functions as F

    from hadoop_tools_spark.sources.snapshots import SnapshotTable

    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    ).limit(40)
    keys = [r["o_orderkey"] for r in base.collect()]
    tbl = SnapshotTable(str(tmp_path / "cdc_apply"))
    tbl.create(base)
    ch = spark.createDataFrame(
        [(keys[0], "X", "U"), (keys[1], None, "D")],
        "o_orderkey long, o_orderstatus string, op string",
    )
    v = tbl.apply_changes(ch, ["o_orderkey"])
    assert tbl.versions()[-1] == v  # one commit for the whole batch
    got = {r["o_orderkey"]: r["o_orderstatus"]
           for r in tbl.read(spark).collect()}
    assert got[keys[0]] == "X"
    assert keys[1] not in got
    assert len(got) == len(keys) - 1
    with pytest.raises(ValueError, match="unknown change ops"):
        tbl.apply_changes(
            spark.createDataFrame(
                [(keys[2], "Y", "Z")],
                "o_orderkey long, o_orderstatus string, op string",
            ),
            ["o_orderkey"],
        )
    # NULL op must hit the SAME designed error, not a sorted()
    # None-vs-str TypeError (ADVICE r10)
    with pytest.raises(ValueError, match="unknown change ops"):
        tbl.apply_changes(
            spark.createDataFrame(
                [(keys[2], "Y", None)],
                "o_orderkey long, o_orderstatus string, op string",
            ),
            ["o_orderkey"],
        )
    # all-delete batch: no data rows staged, still one clean commit
    v2 = tbl.apply_changes(
        spark.createDataFrame(
            [(keys[2], None, "D")],
            "o_orderkey long, o_orderstatus string, op string",
        ),
        ["o_orderkey"],
    )
    assert tbl.versions()[-1] == v2
    assert keys[2] not in {
        r["o_orderkey"] for r in tbl.read(spark).collect()
    }
