"""Recall / error bounds for approximate operators (SURVEY.md §5.3
layer 4) — these can't hash-match an oracle, so their contract is
proximity to the exact twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    from hadoop_tools_spark.operators.aggregates import (
        agg_approx_distinct,
        agg_distinct,
    )

    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in agg_distinct(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["n_parts_approx"]
        for r in agg_approx_distinct(spark, sf_dir).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) / v < 0.1  # rsd=0.02, generous bound


def test_knn_numpy_matches_exact_bitwise(spark, sf_dir):
    """r11: llm_knn_numpy rescoring with the sequential cumsum fold
    makes its cosines bitwise-equal to llm_knn_exact's on any BLAS
    build — pin full-row equality, not just neighbor-set overlap."""
    from hadoop_tools_spark.operators.llm_knn import llm_knn_exact, llm_knn_numpy

    def rows(df):
        return sorted(
            (r["q_id"], r["rn"], r["neighbor_id"], r["cosine"])
            for r in df.collect()
        )

    exact = rows(llm_knn_exact(spark, sf_dir))
    numpy_ = rows(llm_knn_numpy(spark, sf_dir))
    assert exact == numpy_


def test_knn_numpy_blas_margin(spark, sf_dir):
    """Loud pre-hash guard (ADVICE r10): every returned cosine must sit
    ≥1e-9 from both its ROUND(6) boundary and the next rank's cosine —
    the distances a BLAS-build ulp shift could ever need to flip."""
    from hadoop_tools_spark.operators.llm_knn import llm_knn_numpy

    by_q = {}
    for r in llm_knn_numpy(spark, sf_dir).collect():
        by_q.setdefault(r["q_id"], []).append((r["rn"], r["cosine"]))
    assert by_q
    for q, ranked in by_q.items():
        ranked.sort()
        for rn, cos in ranked:
            frac = abs(cos * 1e6 - round(cos * 1e6))
            assert abs(frac - 0.5) > 1e-3, (q, rn, cos)  # 1e-9 abs margin
        for (_, hi), (_, lo) in zip(ranked, ranked[1:]):
            assert hi == lo or hi - lo > 1e-9, (q, hi, lo)


def test_knn_lsh_recall(spark, sf_dir):
    from hadoop_tools_spark.operators.llm_knn import llm_knn_exact, llm_knn_lsh

    exact = {}
    for r in llm_knn_exact(spark, sf_dir).collect():
        exact.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    lsh = {}
    for r in llm_knn_lsh(spark, sf_dir).collect():
        lsh.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & lsh.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"LSH recall {hits}/{total}"


def test_minhash_lsh_recall_vs_seeded_pairs(spark, sf_dir):
    """Both LSH variants must recover most seeded prefix near-dups."""
    from hadoop_tools_spark.operators.llm_dedup import (
        llm_neardup_lsh,
        llm_neardup_minhash,
        llm_neardup_pairs,
    )

    truth = {
        (r["doc_a"], r["doc_b"])
        for r in llm_neardup_pairs(spark, sf_dir).collect()
    }
    if not truth:
        pytest.skip("fixture has no seeded near-dup pairs at this sf")
    det = {
        (r["doc_a"], r["doc_b"])
        for r in llm_neardup_minhash(spark, sf_dir).collect()
    }
    ml = {
        (r["doc_a"], r["doc_b"])
        for r in llm_neardup_lsh(spark, sf_dir).collect()
    }
    assert len(truth & det) / len(truth) >= 0.6, "deterministic minhash recall"
    assert len(truth & ml) / len(truth) >= 0.6, "ml MinHashLSH recall"


def test_simhash_separates_neardups_from_random(spark, sf_dir):
    from hadoop_tools_spark.operators.llm_dedup import llm_neardup_pairs
    from hadoop_tools_spark.operators.llm_text import llm_simhash

    sig = {r["doc_id"]: r["simhash64"] for r in llm_simhash(spark, sf_dir).collect()}
    pairs = [(r["doc_a"], r["doc_b"]) for r in llm_neardup_pairs(spark, sf_dir).collect()]
    if not pairs:
        pytest.skip("no seeded pairs")

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    near = [ham(sig[a], sig[b]) for a, b in pairs]
    ids = sorted(sig)
    rand = [ham(sig[ids[i]], sig[ids[-(i + 1)]]) for i in range(20)]
    assert sum(near) / len(near) < sum(rand) / len(rand), (near, rand)


def test_knn_ivf_recall(spark, sf_dir):
    from hadoop_tools_spark.operators.llm_knn import llm_knn_exact, llm_knn_ivf

    exact = {}
    for r in llm_knn_exact(spark, sf_dir).collect():
        exact.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    ivf = {}
    for r in llm_knn_ivf(spark, sf_dir).collect():
        ivf.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & ivf.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"


def test_embed_pq_recall_and_compression(spark, sf_dir):
    """PQ (ADC shortlist + exact refine) must reach ≥ 0.8 recall of the
    exact top-k — the bar VERDICT set for the memory-bound ANN rung —
    report exact cosines for its survivors, and actually compress:
    m uint8 codes per vector vs dim float64s (64× at dim 64 / m 8)."""
    import numpy as np

    from hadoop_tools_spark.operators.llm_knn import (
        _PQ_M,
        _fit_pq_codebooks,
        llm_embed_pq,
        llm_knn_exact,
        pq_encode,
    )
    from pyspark.sql import functions as F

    exact_rows = llm_knn_exact(spark, sf_dir).collect()
    exact, cosmap = {}, {}
    for r in exact_rows:
        exact.setdefault(r["q_id"], set()).add(r["neighbor_id"])
        cosmap[(r["q_id"], r["neighbor_id"])] = r["cosine"]
    pq = {}
    for r in llm_embed_pq(spark, sf_dir).collect():
        pq.setdefault(r["q_id"], set()).add(r["neighbor_id"])
        # refined cosines match the exact key's to float tolerance —
        # NOT bit-exact: the exact key deliberately cumsum-orders its
        # reductions while the PQ refine uses BLAS order, so the two
        # doubles can differ in the last ulp and 6-dp rounding can
        # split on a boundary (r9 review)
        if (r["q_id"], r["neighbor_id"]) in cosmap:
            assert abs(
                r["cosine"] - cosmap[(r["q_id"], r["neighbor_id"])]
            ) <= 1e-6
    hits = sum(len(exact[q] & pq.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.8, f"PQ recall {hits}/{total}"

    # compression pin: codes are (n, m) uint8 — m bytes/vector
    from hadoop_tools_spark.io import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("u")
    )
    books = _fit_pq_codebooks(e)
    U = np.array([r.u for r in e.limit(50).collect()])
    U = U / np.linalg.norm(U, axis=1, keepdims=True)
    codes = pq_encode(U, books)
    assert codes.dtype == np.uint8 and codes.shape == (len(U), _PQ_M)
    dim = U.shape[1]
    assert dim * 8 // codes.shape[1] >= 64  # ≥64× smaller than raw


def test_approx_median_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=1000) lands within 1% of the exact
    interpolated quantiles per group."""
    from hadoop_tools_spark.operators.aggregates import agg_approx_median, agg_median

    exact = {
        r.l_returnflag: (r.median_price, r.p90_price)
        for r in agg_median(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: (r.median_approx, r.p90_approx)
        for r in agg_approx_median(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) / e < 0.01, (k, e, a)


def test_ivf_index_partition_pruned_search(spark, sf_dir, tmp_path):
    """The persisted IVF index: corpus written partitioned by cell,
    search scans ONLY probed cell directories (PartitionFilters in the
    plan), and recall vs exact stays >= 0.5 (same bound as the
    in-memory IVF key)."""
    import re

    from pyspark.sql import functions as F

    from hadoop_tools_spark.io import load
    from hadoop_tools_spark.operators.llm_knn import (
        _QUERY_MOD,
        _unit,
        build_ivf_index,
        ivf_search,
        llm_knn_exact,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, sf_dir, idx)

    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            _unit(F.col("embedding").cast("array<double>")).alias("q_u"),
        )
    )
    res = ivf_search(spark, idx, queries)

    # partition pruning visible in the scan
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*\]", plan)
    assert m, plan

    got = {}
    for r in res.collect():
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    exact = {}
    for r in llm_knn_exact(spark, sf_dir).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"indexed IVF recall {hits}/{total}"


def test_hll_is_partitioning_invariant(spark, sf_dir):
    """approx_count_distinct must give the SAME estimate whatever the
    partitioning: HLL add/merge is commutative, so task layout —
    retries, speculative execution, AQE re-splits — cannot change the
    answer. (This is what makes sketches safe to use at scale.)"""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    vals = []
    for n in (1, 4, 32):
        got = (
            li.repartition(n)
            .groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", 0.02).alias("d"))
            .collect()
        )
        vals.append(sorted((r.l_returnflag, r.d) for r in got))
    assert vals[0] == vals[1] == vals[2]


def test_embed_neardup_lsh_recall_vs_exact(spark, sf_dir):
    """The LSH-bucketed embedding near-dup must recover most exact
    cos>0.4 pairs (4 hash tables; randomized, so bounded not exact)
    and report accurate cosines for the pairs it finds. This recall
    floor is the gate for trimming numHashTables — don't lower the
    table count without re-running this test."""
    from hadoop_tools_spark.operators.llm_knn import (
        llm_embed_neardup,
        llm_embed_neardup_lsh,
    )

    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in llm_embed_neardup(spark, sf_dir).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cosine
        for r in llm_embed_neardup_lsh(spark, sf_dir).collect()
    }
    assert exact, "exact key found no pairs — fixture drifted"
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= 0.8, f"LSH embed near-dup recall {recall:.2f}"
    for k in hits:
        assert abs(exact[k] - approx[k]) < 1e-4, (k, exact[k], approx[k])
    spark.catalog.clearCache()


def test_embed_pca_matches_numpy(spark, sf_dir):
    """The distributed-Gram PCA must reproduce full-data numpy PCA:
    per-vector projections equal up to component sign, and PC1 must
    carry at least as much variance as PC2. This is the correctness
    backing for the rows-only `llm_embed_pca` key."""
    import numpy as np

    from hadoop_tools_spark.io import load
    from hadoop_tools_spark.operators.llm_knn import llm_embed_pca

    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    C = (X.T @ X) / len(X) - np.outer(X.mean(axis=0), X.mean(axis=0))
    vals, vecs = np.linalg.eigh(C)
    ref = {1: Xc @ vecs[:, -1], 2: Xc @ vecs[:, -2]}

    got = {
        r.vec_id: (r.pc1, r.pc2)
        for r in llm_embed_pca(spark, sf_dir).collect()
    }
    order = np.argsort(ids)
    for comp in (1, 2):
        mine = np.array([got[int(i)][comp - 1] for i in ids[order]])
        theirs = ref[comp][order]
        # sign is a convention; fixed-point Gram rounding costs ~1e-3
        err = min(
            np.abs(mine - theirs).max(), np.abs(mine + theirs).max()
        )
        assert err < 5e-3, (comp, err)
    assert ref[1].var() >= ref[2].var()
    spark.catalog.clearCache()


def test_embed_neardup_refuses_above_size_gate(spark, sf_dir):
    """The exact O(n²) anchor is a declared permanent seam (r7): above
    max_rows it must refuse with a pointer at the LSH scale path, not
    silently schedule an unbounded all-pairs job."""
    import pytest as _pytest

    from hadoop_tools_spark.operators.llm_knn import llm_embed_neardup

    with _pytest.raises(ValueError, match="llm_embed_neardup_lsh"):
        llm_embed_neardup(spark, sf_dir, max_rows=3)


def test_image_phash_banded_equals_anchor(spark, sf_dir):
    """Multi-Index-Hashing guarantee: with 8 bands of 8 bits and a
    radius-⌊24/8⌋=3 probe ball, every pair within Hamming 24 shares an
    expanded band by pigeonhole, so the banded twin must EQUAL the
    all-pairs anchor — recall 1.0 by construction, and the verify step
    makes precision 1.0 too."""
    from hadoop_tools_spark.operators.multimodal import (
        llm_image_phash,
        llm_image_phash_lsh,
    )

    anchor = {(r.a, r.b, r.hamming)
              for r in llm_image_phash(spark, sf_dir).collect()}
    banded = {(r.a, r.b, r.hamming)
              for r in llm_image_phash_lsh(spark, sf_dir).collect()}
    assert anchor, "fixture must produce near-dup pairs"
    assert banded == anchor
    spark.catalog.clearCache()


def test_image_phash_pigeonhole_ball_covers_threshold():
    """The mask ball radius must satisfy the MIH bound: 8 bands ×
    (radius 3 + 1) > 24 ⇒ a 24-bit difference cannot hit every band
    with more than 3 bits. Pins the 93-mask count so a future edit to
    the ball or band split fails loudly here, not as silent recall
    loss."""
    masks = [m for m in range(256) if bin(m).count("1") <= 3]
    assert len(masks) == 93
    # adversarial worst case: spread 24 differing bits as evenly as
    # possible over 8 bands -> 3 per band, exactly the ball radius
    assert 24 // 8 == 3


def test_image_phash_refuses_above_size_gate(spark, sf_dir, monkeypatch):
    """The anchor's refuse gate must point at the REAL registered scale
    twin (VERDICT r7: a refuse gate naming vapor is an anti-pattern)."""
    import pytest as _pytest

    from hadoop_tools_spark.operators import multimodal as mm
    from hadoop_tools_spark.registry import QUERIES

    monkeypatch.setattr(mm, "IMAGE_PHASH_MAX_ROWS", 1)
    with _pytest.raises(ValueError, match="llm_image_phash_lsh"):
        mm.llm_image_phash(spark, sf_dir)
    assert "llm_image_phash_lsh" in QUERIES
    spark.catalog.clearCache()

def test_knn_ivfpq_recall_and_refine(spark, sf_dir):
    """IVF-PQ recall decomposes: vs plain IVF (same probing, exact
    scoring) the residual-ADC shortlist + refine must lose almost
    nothing (>= 0.9); vs exact brute force it inherits IVF's
    nprobe/ncells probing ceiling (>= 0.5 at this fixture scale, the
    same bar test_knn_ivf_recall pins). Refined cosines match the
    exact key's to float tolerance (BLAS vs cumsum reduction order)."""
    from hadoop_tools_spark.operators.llm_knn import (
        llm_knn_exact,
        llm_knn_ivf,
        llm_knn_ivfpq,
    )

    def top(df):
        d = {}
        for r in df.collect():
            d.setdefault(r["q_id"], set()).add(r["neighbor_id"])
        return d

    exact_rows = llm_knn_exact(spark, sf_dir).collect()
    exact, cosmap = {}, {}
    for r in exact_rows:
        exact.setdefault(r["q_id"], set()).add(r["neighbor_id"])
        cosmap[(r["q_id"], r["neighbor_id"])] = r["cosine"]
    ivf = top(llm_knn_ivf(spark, sf_dir))
    got = {}
    for r in llm_knn_ivfpq(spark, sf_dir).collect():
        got.setdefault(r["q_id"], set()).add(r["neighbor_id"])
        if (r["q_id"], r["neighbor_id"]) in cosmap:
            assert abs(
                r["cosine"] - cosmap[(r["q_id"], r["neighbor_id"])]
            ) <= 1e-6

    def rec(a, b):
        hits = sum(len(a[q] & b.get(q, set())) for q in a)
        return hits / sum(len(v) for v in a.values())

    assert rec(ivf, got) >= 0.9, f"IVF-PQ lost vs IVF: {rec(ivf, got)}"
    assert rec(exact, got) >= 0.5, f"IVF-PQ vs exact: {rec(exact, got)}"


def test_ivfpq_residual_codes_carry_signal(spark, sf_dir):
    """Quantized residuals must reconstruct residuals far better than
    the zero-code baseline (coding carries signal), pinning that the
    ADC term contributes beyond the coarse q.C[cell] scalar. (On this
    isotropic synthetic corpus residuals are NOT tighter than raw
    vectors -- near-uniform unit vectors sit far from every coarse
    centroid -- so no raw-vs-residual superiority is claimed; IVFADC
    keeps the residual form because that is the published composition
    and real, clustered corpora are where it pays.)"""
    import numpy as np

    from hadoop_tools_spark.operators.llm_knn import (
        _fit_pq_residual_books,
        _fit_quantizer,
        pq_encode,
    )
    from hadoop_tools_spark.io import load, materialize
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("u")
    )
    e = materialize(e)
    C = _fit_quantizer(e)
    books = _fit_pq_residual_books(e, C)

    samp = e.orderBy("vec_id").limit(512).collect()
    X = np.array([r.u for r in samp])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    m = books.shape[0]
    cells = np.argmax(X @ C.T, axis=1)
    R = X - C[cells]
    codes = pq_encode(R, books)
    recon = np.concatenate(
        [books[mi][codes[:, mi]] for mi in range(m)], axis=1
    )
    err_coded = np.linalg.norm(R - recon, axis=1).mean()
    err_zero = np.linalg.norm(R, axis=1).mean()
    # ~27% error reduction measured on this corpus; 0.8 leaves margin
    assert err_coded < 0.8 * err_zero, (err_coded, err_zero)
