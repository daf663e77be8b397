"""Semantic invariants for the retrieval-stack operators
(llm_inverted_index / llm_bm25 / llm_chunk_rag / llm_embed_quantize)
beyond the oracle-parity layer."""

from __future__ import annotations

import hashlib

from hadoop_tools_spark.operators.llm_retrieval import (
    _CHUNK,
    _STRIDE,
    llm_bm25,
    llm_chunk_rag,
    llm_embed_quantize,
    llm_inverted_index,
)


def test_inverted_index_postings(spark, sf_dir):
    """Postings (comma-joined string per the driver-hashable-output
    convention) are sorted, duplicate-free, df == len(postings), and
    every listed doc really contains the term."""
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = llm_inverted_index(spark, sf_dir).collect()
    assert rows
    n = len(docs)
    for r in rows:
        assert isinstance(r.postings, str)  # scalar cell, never a list
        posts = [int(p) for p in r.postings.split(",")]
        assert posts == sorted(set(posts))
        assert r.df == len(posts)
        assert r.total_tf >= r.df
        assert 2 <= r.df and r.df * 5 <= n * 4
        for doc_id in posts[:5]:
            assert r.term in docs[doc_id]


def test_bm25_ranking(spark, sf_dir):
    """Two 3-term queries, 5 ranked hits each, ranks dense from 1,
    scores non-increasing in rank, and every hit contains at least one
    query term."""
    rows = llm_bm25(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2}
    for hits in by_q.values():
        hits.sort(key=lambda r: r.rank)
        assert [h.rank for h in hits] == [1, 2, 3, 4, 5]
        scores = [h.bm25 for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_chunking_covers_every_token(spark, sf_dir):
    """Chunk windows tile each document: starts advance by the stride,
    the union of [start, start+n_tokens) covers 1..n_words with the
    configured overlap, and the md5 matches the real chunk text."""
    texts = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = llm_chunk_rag(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        words = texts[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        covered = set()
        for i, c in enumerate(chunks):
            assert c.chunk_id == i
            assert c.start_token == i * _STRIDE + 1
            expect = words[c.start_token - 1 : c.start_token - 1 + _CHUNK]
            assert c.n_tokens == len(expect)
            assert (
                c.chunk_md5
                == hashlib.md5(" ".join(expect).encode()).hexdigest()
            )
            covered.update(range(c.start_token, c.start_token + c.n_tokens))
        assert covered == set(range(1, len(words) + 1))
        # last chunk must reach the end; an extra chunk would be empty
        assert chunks[-1].start_token + chunks[-1].n_tokens - 1 == len(words)


def test_quantize_roundtrip(spark, sf_dir):
    """Quantized values stay in int8 range and reconstruction error is
    bounded by half a quantization step per element."""
    import numpy as np

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    rows = llm_embed_quantize(spark, sf_dir).collect()
    assert len(rows) == len([v for v in vecs.values() if np.abs(v).max() > 0])
    for r in rows[:50]:
        v = vecs[r.vec_id]
        amax = np.abs(v).max()
        scale = 127.0 / amax
        q = np.floor(v * scale + 0.5)
        assert np.abs(q).max() <= 127
        assert r.q_sum == int(q.sum())
        assert r.q_l1 == int(np.abs(q).sum())
        # SSE bound: each |v_i - q_i/scale| <= 0.5/scale
        assert r.sse12 / 1e12 <= len(v) * (0.5 / scale) ** 2 + 1e-9
        assert abs(r.scale6 - scale) <= 5e-7


def test_count_min_never_underestimates(spark, sf_dir):
    from hadoop_tools_spark.operators.analytics import agg_count_min

    rows = agg_count_min(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.true_cnt
        assert r.overcount == r.cms_est - r.true_cnt


def test_triangles_match_bruteforce(spark):
    """Oriented-wedge count equals the O(n^3) brute force on sf0.001."""
    from itertools import combinations

    from hadoop_tools_spark.operators.analytics import graph_triangles

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf}/part.parquet")
    ip = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .filter("p_size <= 10")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = {}
    for r in ip:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        edges.update(
            (a, b) for a, b in combinations(sorted(parts), 2)
        )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b
    )
    row = graph_triangles(spark, sf).collect()[0]
    assert row.n_triangles == brute
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(adj)
    assert row.n_wedges == sum(
        len(v) * (len(v) - 1) // 2 for v in adj.values()
    )


def test_ewma_recurrence(spark, sf_dir):
    """EWMA rows satisfy s_i = 0.75*s_{i-1} + 0.25*x_i exactly (up to
    the 6-dp pin) and start at the first daily amount."""
    from hadoop_tools_spark.operators.timeseries import ts_ewma

    rows = ts_ewma(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    import math

    for series in list(by_user.values())[:50]:
        series.sort(key=lambda r: r.day)
        acc = series[0].amount
        assert series[0].ewma6 == math.floor(acc * 1e6 + 0.5) / 1e6
        for r in series[1:]:
            acc = acc * 0.75 + r.amount * 0.25
            assert abs(r.ewma6 - acc) < 2e-6


def test_hll_merge_accuracy(spark):
    """Region-level sketch-union estimates stay within 5% of exact,
    and the union estimate is >= the max single-nation estimate."""
    from hadoop_tools_spark.operators.aggregates import agg_sketch_hll_merge

    rows = agg_sketch_hll_merge(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.est_ndv - r.exact_ndv) <= 0.05 * r.exact_ndv


def test_containment_matches_bruteforce(spark):
    """Every reported containment pair matches a brute-force shingle
    computation, and no qualifying pair is missed (modulo the
    stop-shingle cap, mirrored here)."""
    from hadoop_tools_spark.operators.llm_dedup import llm_containment

    sf = "/root/testdata/sf0.001"
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    sh = {
        d: {tuple(w[i : i + 3]) for i in range(len(w) - 2)}
        for d, w in docs.items()
        if len(w) >= 3
    }
    dfreq = {}
    for gs in sh.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    cap = len(docs) // 10
    kept = {d: {g for g in gs if dfreq[g] <= cap} for d, gs in sh.items()}
    want = {}
    for a, ga in kept.items():
        for b, gb in kept.items():
            if a == b:
                continue
            shared = len(ga & gb)
            if shared and shared * 2 >= len(sh[a]):
                want[(a, b)] = (shared, len(sh[a]))
    rows = llm_containment(spark, sf).collect()
    got = {(r.doc_a, r.doc_b): (r.shared, r.n_a) for r in rows}
    assert got == want
    for r in rows:
        assert 0.5 <= r.containment6 <= 1.0


def test_minhash_estimate_accuracy(spark, sf_dir):
    """MinHash estimates stay within 3/sqrt(k) of exact Jaccard
    (≈3 standard errors) and both scores live in [0, 1]."""
    from hadoop_tools_spark.operators.llm_dedup import (
        _MH_K,
        llm_minhash_estimate,
    )

    rows = llm_minhash_estimate(spark, sf_dir).collect()
    assert rows
    bound = 3.0 / (_MH_K**0.5)
    for r in rows:
        assert 0.0 <= r.jaccard_est6 <= 1.0
        assert 0.0 <= r.jaccard_exact6 <= 1.0
        assert abs(r.jaccard_est6 - r.jaccard_exact6) <= bound


def test_cusum_recurrence_and_alarm(spark, sf_dir):
    """CUSUM rows satisfy s_i = max(0, s_{i-1} + x_i - k) exactly
    (integer arithmetic) and alarms fire iff s_i > 3k."""
    from hadoop_tools_spark.operators.timeseries import ts_cusum

    rows = ts_cusum(spark, sf_dir).collect()
    # recover k from any alarm boundary: recompute from the data
    daily = {}
    for r in rows:
        daily.setdefault(r.user_id, []).append(r)
    total = sum(r.cents for r in rows)
    n = len(rows)
    k = total * 12 // (n * 10)
    for series in list(daily.values())[:50]:
        series.sort(key=lambda r: r.day)
        acc = 0
        for r in series:
            acc = max(0, acc + r.cents - k)
            assert r.cusum_cents == acc
            assert r.alarm == (acc > 3 * k)


def test_split_assign_disjoint_complete(spark, sf_dir):
    """Split counts cover every document exactly once and the ratios
    are near 80/10/10."""
    from hadoop_tools_spark.operators.llm_text import llm_split_assign

    rows = llm_split_assign(spark, "/root/testdata/sf0.01").collect()
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).count()
    total = sum(r.n_docs for r in rows)
    assert total == n_docs  # complete + disjoint (each doc counted once)
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "valid", "test"}
    assert 0.7 <= by_split["train"] / n_docs <= 0.9
    assert 0.05 <= by_split["valid"] / n_docs <= 0.15
    assert 0.05 <= by_split["test"] / n_docs <= 0.15


def test_partition_evolution_prunes_and_time_travels(spark, sf_dir, tmp_path):
    """After a partition-spec change: (a) v0 reads exactly the
    pre-evolution rows, (b) the current read sees both layouts, and
    (c) a month filter reaches the partitioned commit as a partition
    filter (directory pruning), not a row filter."""
    from pyspark.sql import functions as F

    from hadoop_tools_spark.sources.snapshots import SnapshotTable

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        )
    )
    tbl = SnapshotTable(str(tmp_path / "pe"))
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    tbl.create(odd)
    tbl.append(even, partition_by=["o_month"])

    assert tbl.read(spark, version=0).count() == odd.count()
    assert tbl.read(spark).count() == orders.count()

    filtered = tbl.read(spark).filter(F.col("o_month") == "1996-03")
    want = orders.filter(F.col("o_month") == "1996-03").count()
    assert filtered.count() == want
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_month" in plan or (
        "o_month=1996-03" in plan
    ), plan


def test_pack_sequences_tile_contiguously(spark, sf_dir):
    """Within each shard, docs tile the token stream with no gaps or
    overlaps, and seq bounds/offsets are consistent."""
    from hadoop_tools_spark.operators.llm_text import (
        _PACK_SEQ,
        llm_pack_sequences,
    )

    rows = llm_pack_sequences(spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert by_shard
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in shard_rows:
            assert r.offset_in_seq == pos % _PACK_SEQ
            assert r.seq_first == pos // _PACK_SEQ
            assert r.seq_last == (pos + r.n_tokens - 1) // _PACK_SEQ
            pos += r.n_tokens


def test_bpe_learn_matches_reference(spark, sf_dir):
    """The 3 learned merges equal a pure-Python BPE reference over the
    same word distribution (greedy left-to-right merge semantics)."""
    from collections import Counter

    from hadoop_tools_spark.operators.llm_text import llm_bpe_learn

    words = Counter()
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        for w in r.text.split(" "):
            if w:
                words[w] += 1
    seqs = {w: list(w) for w in words}

    def learn_one():
        pairs = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += words[w]
        (pa, pb), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == pa and seq[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
        return pa, pb, cnt

    expect = [learn_one() for _ in range(3)]
    rows = sorted(llm_bpe_learn(spark, sf_dir).collect(), key=lambda r: r.round)
    assert len(rows) == 3
    for r, (pa, pb, cnt) in zip(rows, expect):
        assert (r.merge_left, r.merge_right, r.cnt) == (pa, pb, cnt)
        assert r.merged == pa + pb


def test_url_canonical_collapses_variants(spark, sf_dir):
    """All four synthetic URL variants of the same (site, id) collapse
    to ONE canonical key: n distinct canonicals == n_sites * n_ids and
    every group counts all its variant urls."""
    from hadoop_tools_spark.operators.llm_dedup import llm_url_canonical

    rows = llm_url_canonical(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 350  # 50 sites x 7 id values
    assert sum(r.n_urls for r in rows) == 500
    for r in rows:
        assert r.canonical.startswith("site-")
        assert ":80" not in r.canonical and ":443" not in r.canonical
        assert "utm" not in r.canonical and "ref=" not in r.canonical
        assert "index.html" not in r.canonical


def test_holt_recurrence(spark, sf_dir):
    """Holt rows satisfy the coupled level/trend recursion exactly
    (up to the 6-dp pin): l1 = x1, b1 = 0; l_i = x_i/4 + 3(l+b)/4,
    b_i = (l_i - l_{i-1})/2 + b_{i-1}/2; forecast = l + b."""
    import math

    from hadoop_tools_spark.operators.timeseries import ts_holt

    rows = ts_holt(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user

    def pin6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    for series in list(by_user.values())[:50]:
        series.sort(key=lambda r: r.day)
        l, b = series[0].amount, 0.0
        assert series[0].level6 == pin6(l)
        assert series[0].trend6 == 0.0
        assert series[0].forecast6 == pin6(l + b)
        for r in series[1:]:
            ln = r.amount * 0.25 + (l + b) * 0.75
            b = (ln - l) * 0.5 + b * 0.5
            l = ln
            assert abs(r.level6 - l) < 2e-6
            assert abs(r.trend6 - b) < 2e-6
            assert abs(r.forecast6 - (l + b)) < 2e-6


def test_holt_tracks_linear_ramp(spark, tmp_path):
    """On a perfectly linear series the trend converges toward the
    true slope and the one-step forecast tracks the next value —
    the property flat EWMA (which lags any ramp) cannot have."""
    import datetime

    from hadoop_tools_spark.operators.timeseries import ts_holt

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(days=i), float(100 + 10 * i))
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = sorted(
        ts_holt(spark, str(tmp_path)).collect(), key=lambda r: r.day
    )
    assert len(out) == 40
    # after convergence the trend approaches the true slope (10/day)
    assert abs(out[-1].trend6 - 10.0) < 0.5
    # and the forecast anticipates the NEXT day's value
    nxt = 100 + 10 * 40
    assert abs(out[-1].forecast6 - nxt) < 1.0


def test_stl_lite_additive_identity_and_seasonal_centering(spark, sf_dir):
    """Exact decomposition: amount·10⁶ == trend + seasonal + residual
    for EVERY row (integer micro-units, no float drift), and per
    (user, weekday) the residuals center near zero (each seasonal
    term is the floor-pinned mean of its group's detrended values, so
    |mean residual| < 1 micro-unit + pin slack)."""
    from collections import defaultdict

    from hadoop_tools_spark.operators.timeseries import ts_stl_lite

    rows = ts_stl_lite(spark, sf_dir).collect()
    assert rows
    grp = defaultdict(list)
    for r in rows:
        micro = round(r.amount * 1_000_000)
        assert micro == r.trend_micro + r.seasonal_micro + r.residual_micro
        grp[(r.user_id, r.day.weekday())].append(r.residual_micro)
    for (u, _d), res in grp.items():
        assert abs(sum(res) / len(res)) <= 1.0, (u, sum(res) / len(res))
