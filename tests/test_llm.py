"""LLM-operator semantics beyond the oracle gate: dedup invariants,
clustering correctness, language-ID on genuine multilingual text,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dedup_keeps_min_id_and_is_idempotent(spark, sf_dir):
    from hadoop_tools_spark.operators.llm_dedup import llm_dedup_exact

    kept = sorted(r["doc_id"] for r in llm_dedup_exact(spark, sf_dir).collect())
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # doubled input (2N rows) must collapse back to N, all original ids
    assert len(kept) == n_docs
    assert all(k < 1000000 for k in kept)  # min id wins over shifted copy


def test_dup_cluster_labels_are_component_minima(spark, sf_dir):
    from hadoop_tools_spark.operators.llm_dedup import (
        llm_dup_cluster,
        llm_neardup_pairs,
    )

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in llm_dup_cluster(spark, sf_dir).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in llm_neardup_pairs(spark, sf_dir).collect()
    ]
    # same component -> same label; label is the component min
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            v = stack.pop()
            if v in comp:
                continue
            comp.add(v)
            stack.extend(adj[v] - comp)
        seen |= comp
        expect = min(comp)
        for v in comp:
            assert labels[v] == expect, (v, labels[v], expect)
    # singletons label themselves
    singles = set(labels) - seen
    assert all(labels[v] == v for v in singles)


def test_langid_on_real_multilingual_text(spark):
    from hadoop_tools_spark.operators.llm_text import langid_expr

    rows = [
        ("机器学习是人工智能的一个分支", "zh"),
        ("el niño pregunta ¿dónde está la biblioteca?", "es"),
        ("le garçon est très heureux d'être ici", "fr"),
        ("die größe der übung ist schön", "de"),
        ("the quick brown fox jumps over the lazy dog", "en"),
    ]
    df = spark.createDataFrame(rows, ["text", "expected"])
    got = df.select("expected", langid_expr("text").alias("pred")).collect()
    for r in got:
        assert r["pred"] == r["expected"], r


def test_multimodal_stub_raises_without_fake():
    from hadoop_tools_spark.operators.multimodal import decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG")
    w, h, n = decode_stub(b"\x89PNG", deterministic_fake=True)
    assert 64 <= w < 320 and 64 <= h < 320 and 0.0 <= n < 1.0
    assert (w, h, n) == decode_stub(b"\x89PNG", deterministic_fake=True)


def test_multimodal_feature_extraction_plumbing(spark, sf_dir):
    from hadoop_tools_spark.operators.multimodal import (
        extract_features,
        read_assets,
    )

    assets = read_assets(spark, sf_dir, glob="*.parquet")
    feats = extract_features(assets, deterministic_fake=True)
    rows = feats.collect()
    assert len(rows) == 10  # one per fixture table
    assert feats.columns == ["path", "length", "width", "height", "feat_norm"]
    # payload column is gone -> downstream ops are metadata-only
    assert "content" not in feats.columns


def test_quality_filter_rejects_bad_docs(spark):
    from hadoop_tools_spark.registry import QUERIES

    # synthetic degenerate docs: too short, no diversity
    rows = [
        (1, "a a a a a a a a a a", "en", "src0", 19),  # uniq_ratio 0.1
        (2, "one two", "en", "src0", 7),  # too short
        (3, "many different words in this reasonable document here", "en", "src0", 53),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.createOrReplaceTempView("tmp_docs")
    from pyspark.sql import functions as F

    words = F.split("text", " ")
    uniq = F.size(F.array_distinct(words)) / F.size(words)
    kept = df.filter(
        F.size(words).between(5, 10000) & (uniq > 0.2)
    ).collect()
    assert [r["doc_id"] for r in kept] == [3]


def test_multimodal_resize_shrinks_payload(spark, sf_dir):
    """Resize: 1 row per asset, thumbnail sized by target dims, stable
    across runs (deterministic fake)."""
    from hadoop_tools_spark.operators.multimodal import (
        read_assets,
        resize_images,
        resize_stub,
    )

    assets = read_assets(spark, sf_dir, glob="*.parquet")
    out = resize_images(assets, 32, 32).collect()
    assert len(out) == assets.count()
    assert all(len(r.thumb) == 32 * 32 // 64 for r in out)
    # deterministic: same blob -> same thumb
    assert resize_stub(b"abc", 32, 32, True) == resize_stub(b"abc", 32, 32, True)
    with pytest.raises(NotImplementedError):
        resize_stub(b"abc", 32, 32)


def test_multimodal_frame_sampling_explodes_rows(spark, sf_dir):
    """Frame sampling: row count per asset = ceil(frames/every_n) with
    frames = len//4096; frame ids are the sampled arithmetic series."""
    from hadoop_tools_spark.operators.multimodal import read_assets, sample_frames

    assets = read_assets(spark, sf_dir, glob="*.parquet")
    frames = sample_frames(assets, every_n=10)
    sizes = {r.path: r.length for r in assets.select("path", "length").collect()}
    got = frames.groupBy("path").count().collect()
    for r in got:
        n_frames = max(1, sizes[r.path] // 4096)
        expect = len(range(0, n_frames, 10))
        assert r["count"] == expect, (r.path, r["count"], expect)
    ids = [r.frame_id for r in frames.filter(F.col("path") == got[0].path).collect()]
    assert sorted(ids) == list(range(0, max(ids) + 1, 10))


def _winnow_model(text: str, w: int = 4):
    """Pure-Python reference model of llm_winnow (k=3 word-grams,
    window w sliding min, distinct)."""
    import hashlib

    toks = text.split(" ")
    hs = [
        hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
        for i in range(len(toks) - 2)
    ]
    if len(hs) < w:
        return set()
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_shared_run_shares_fingerprint(spark, tmp_path):
    """Winnowing guarantee: documents sharing a run of w+k-1 tokens
    share a fingerprint. The operator's digest is cross-checked
    against a pure-Python model of the same algorithm, and the
    guarantee is asserted on the model's sets."""
    import hashlib

    import pandas as pd

    from hadoop_tools_spark.operators.llm_text import llm_winnow

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    doc_a = "one two three " + shared + " four five six"
    doc_b = "seven eight nine ten " + shared + " eleven twelve"
    doc_c = "red orange yellow green blue indigo violet pink"

    # guarantee (on the model): ≥6 shared tokens ⇒ shared fingerprint
    fa, fb, fc = map(_winnow_model, (doc_a, doc_b, doc_c))
    assert fa & fb, "shared 8-token run must yield a common fingerprint"
    assert not (fa & fc), "disjoint vocabularies share nothing"

    # operator ≡ model: run llm_winnow on the 3-doc corpus and compare
    # count + digest per doc
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": [doc_a, doc_b, doc_c]})
    d = str(tmp_path / "corpus")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {r.doc_id: (r.n_fp, r.fp_digest) for r in llm_winnow(spark, d).collect()}
    for doc_id, fset in ((0, fa), (1, fb), (2, fc)):
        digest = hashlib.md5(" ".join(sorted(fset)).encode()).hexdigest()
        assert got[doc_id] == (len(fset), digest)


def test_neardup_incremental_matches_rebuild(spark, sf_dir, tmp_path):
    """Incremental banding: index 80% of the corpus, then process the
    remaining 20% as a new batch. The batch's candidate pairs must be
    exactly the full-corpus pairs touching >=1 new doc, and the
    appended index must equal a from-scratch index row-for-row —
    the guarantee the deterministic (content-derived) hash family
    buys over randomized LSH."""
    from pyspark.sql import functions as F

    from hadoop_tools_spark.io import load
    from hadoop_tools_spark.operators.llm_dedup import (
        build_neardup_index,
        llm_neardup_minhash,
        neardup_incremental,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "band_index")
    build_neardup_index(old, idx)

    got = {
        (r.doc_a, r.doc_b)
        for r in neardup_incremental(spark, new, idx).collect()
    }
    full = {
        (r.doc_a, r.doc_b) for r in llm_neardup_minhash(spark, sf_dir).collect()
    }
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    expect = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == expect

    # appended index == from-scratch index (as a row multiset)
    scratch = str(tmp_path / "band_index_full")
    build_neardup_index(d, scratch)
    a = spark.read.parquet(idx).groupBy("doc_id", "band", "key").count()
    b = spark.read.parquet(scratch).groupBy("doc_id", "band", "key").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dedup_incremental_matches_rebuild(spark, sf_dir, tmp_path):
    """Exact-dedup ingestion: batch 2 contains exact copies of batch 1
    (shifted ids) plus genuinely new docs. Copies must be rejected,
    novel docs admitted, and the final index must equal a from-scratch
    index over the union."""
    from pyspark.sql import functions as F

    from hadoop_tools_spark.io import load
    from hadoop_tools_spark.operators.llm_dedup import (
        build_dedup_index,
        dedup_incremental,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    batch1 = d.filter(F.col("doc_id") % 2 == 0)
    novel = d.filter(F.col("doc_id") % 2 == 1)
    copies = batch1.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    batch2 = novel.unionByName(copies)

    idx = str(tmp_path / "dedup_index")
    build_dedup_index(batch1, idx)
    fresh = {r.doc_id for r in dedup_incremental(spark, batch2, idx).collect()}
    novel_ids = {r.doc_id for r in novel.collect()}
    assert fresh == novel_ids  # fixture has no exact dups (FIXTURES.md)

    scratch = str(tmp_path / "dedup_full")
    build_dedup_index(batch1.unionByName(batch2), scratch)
    a = spark.read.parquet(idx)
    b = spark.read.parquet(scratch)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_simhash_neardup_equals_bruteforce(spark, sf_dir):
    """Pigeonhole chunk blocking is lossless for hamming <= 3: the
    operator's pair set must EQUAL the brute-force all-pairs scan of
    the signatures (recall 1.0 by construction, precision via the
    exact bit_count verify)."""
    import numpy as np

    from hadoop_tools_spark.operators.llm_text import (
        llm_simhash,
        llm_simhash_neardup,
    )

    sigs = {
        r.doc_id: np.uint64(np.int64(r.simhash64))
        for r in llm_simhash(spark, sf_dir).collect()
    }
    ids = sorted(sigs)
    arr = np.array([sigs[i] for i in ids], dtype=np.uint64)
    x = arr[:, None] ^ arr[None, :]
    ham = np.array(
        [[bin(int(v)).count("1") for v in row] for row in x], dtype=np.int64
    )
    expect = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if ham[i, j] <= 3
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in llm_simhash_neardup(spark, sf_dir).collect()
    }
    assert got == expect
