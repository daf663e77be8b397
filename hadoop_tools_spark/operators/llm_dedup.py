"""Deduplication operators for LLM data pipelines (SURVEY.md §2.E).

The 100 TB playbook:

- exact dedup: content-hash groupBy — shuffle carries (hash, min_id)
  partials only; never the text.
- near-dup candidates: blocking on a deterministic key (prefix or
  MinHash band) turns the quadratic pair problem into equi-joins whose
  groups are tiny; only candidate pairs are verified.
- MinHash here uses an md5-derived hash family, which makes the whole
  LSH pipeline *deterministic and cross-engine reproducible* — the
  randomized `pyspark.ml` variant (llm_neardup_lsh, rows-only) is kept
  for comparison, but determinism is what lets a production pipeline
  re-run incrementally without re-bucketing history.
- duplicate clustering: iterative min-label propagation (no GraphFrames
  dependency); O(log n) rounds, lineage cut per round via
  localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load, load_spread, materialize
from ..registry import query

#: documents doubled with shifted ids — the fixture has zero exact
#: duplicates (FIXTURES.md), so dedup keys build an input where every
#: text occurs twice and the operator must keep exactly the min id.
_DOUBLED_SQL = """
    doubled AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
"""


def _doubled(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )


def _content_hash_min(df):
    """THE exact-dedup rule — sha256(text) → keep min doc_id — stated
    once: llm_dedup_exact, build_dedup_index, and dedup_incremental
    must all apply the SAME digest and keep-rule, and the incremental
    index has no oracle of its own (pytest-only), so a drifted copy
    there would silently desynchronize the register from the key."""
    return (
        df.withColumn("h", F.sha2(F.col("text").cast("binary"), 256))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )


@query(
    "llm_dedup_exact",
    oracle=f"""
    WITH {_DOUBLED_SQL}
    SELECT MIN(doc_id) AS doc_id FROM doubled GROUP BY sha256(text)
    """,
)
def llm_dedup_exact(spark, sf_dir):
    """Exact dedup: sha256(text) → keep min doc_id.

    Hash-groupBy is the exact-dedup scale pattern: the full text never
    crosses the shuffle (only the 32-byte digest + id), and partial
    aggregation collapses per-partition duplicates before the exchange.
    """
    return _content_hash_min(_doubled(spark, sf_dir)).select("doc_id")


@query(
    "llm_neardup_pairs",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM documents a JOIN documents b
      ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
     AND a.doc_id < b.doc_id
    """,
)
def llm_neardup_pairs(spark, sf_dir):
    """Deterministic near-dup candidates by normalized-prefix blocking.

    Self-equi-join on the blocking key: pairs are only generated
    *within* a block, so cost is Σ|block|², not N². The fixture seeds
    shared 40-char prefixes (FIXTURES.md) — 25 pairs at sf0.01.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("pfx")
    )
    a, b = d.alias("a"), d.alias("b")
    return a.join(
        b,
        (F.col("a.pfx") == F.col("b.pfx"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )


_N_HASHES = 4  # 2 bands × 2 rows


def _trigram_expr():
    """Distinct word-trigram shingles of ``text`` as an array column.

    Docs with <3 words yield an EMPTY array: ``sequence`` defaults to
    step -1 when start > stop, so the naive ``sequence(1, size-2)``
    would generate a DESCENDING run hitting ``element_at(w, 0)`` →
    INVALID_INDEX_OF_ZERO at runtime (latent only because the fixture's
    minimum doc length is 10 words — a real corpus has 1-word docs).
    The explicit size branch keeps every generated index in [1, size-2].
    """
    w = F.split("text", " ")
    idx = F.when(
        F.size(w) >= 3, F.sequence(F.lit(1), F.size(w) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        )
    )


def _with_minhash_sig(grams_df):
    """Add md5-derived MinHash signature columns h0..h3 to a
    ``(doc_id, grams)`` DataFrame as a PURE PROJECTION.

    ``array_min(transform(grams, g -> md5('si:' || g)))`` folds the
    min per row — no shingle explode, no groupBy, no shuffle. At
    100 TB the signature pass is embarrassingly parallel over the
    scan; the only shuffle in the whole LSH pipeline is the band-key
    equi-join. (The exploded groupBy formulation moved every gram
    through an exchange to compute the same four mins.)
    """
    cols = [
        F.array_min(
            F.transform(
                "grams",
                lambda x: F.md5(F.concat(F.lit(f"s{i}:"), x).cast("binary")),
            )
        ).alias(f"h{i}")
        for i in range(_N_HASHES)
    ]
    return grams_df.select("*", *cols)


def _band_keys(sig_df):
    """2 bands × 2 rows: (doc_id, band, key) rows from h0..h3."""
    return sig_df.select(
        "doc_id", F.lit(0).alias("band"), F.concat("h0", "h1").alias("key")
    ).unionByName(
        sig_df.select(
            "doc_id", F.lit(1).alias("band"), F.concat("h2", "h3").alias("key")
        )
    )


@query(
    "llm_neardup_minhash",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS word
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               MIN(md5('s0:' || word)) AS h0, MIN(md5('s1:' || word)) AS h1,
               MIN(md5('s2:' || word)) AS h2, MIN(md5('s3:' || word)) AS h3
        FROM w GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band, h0 || h1 AS key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band, h2 || h3 AS key FROM sig
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """,
)
def llm_neardup_minhash(spark, sf_dir):
    """Deterministic MinHash-LSH over word-trigram shingles:
    md5-derived hash family, 2 bands × 2 rows.

    Same banding structure as classic MinHash-LSH but with a content-
    derived hash family, so the candidate set is reproducible across
    engines and across incremental runs — at 100 TB you bucket new
    documents without re-hashing the corpus. Shingles are trigrams,
    not words: the fixture vocabulary is ~31 words, so word-level
    Jaccard between *random* docs is ~0.7 and word MinHash floods the
    candidate set; trigram space is sparse enough that banding
    separates the seeded near-dups from noise. Candidate generation
    is an equi-join on band keys (shuffle by band key); the signature
    itself is a shuffle-free projection (``_with_minhash_sig``).
    """
    d = load_spread(spark, sf_dir, "documents")
    # Docs with < 3 words have an empty gram array → null signature →
    # null band key, and null keys never satisfy the equi-join, so no
    # explicit filter is needed. (A filter on size(grams) would be
    # pushed below the projection and recompute the shingle expression
    # per row — measured 6× slower.)
    g = d.select("doc_id", _trigram_expr().alias("grams"))
    # materialize: both sides of the band self-join consume sig
    sig = materialize(_with_minhash_sig(g).drop("grams"))
    bands = _band_keys(sig)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@query(
    "llm_jaccard_ngram",
    oracle="""
    WITH cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM documents a JOIN documents b
          ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
         AND a.doc_id < b.doc_id
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS gram
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
        FROM cand c
        JOIN grams ga ON ga.doc_id = c.doc_a
        JOIN grams gb ON gb.doc_id = c.doc_b AND gb.gram = ga.gram
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_shared AS DOUBLE) /
                 (sa.n + sb.n - i.n_shared), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    """,
)
def llm_jaccard_ngram(spark, sf_dir):
    """Verified n-gram Jaccard over blocked candidates.

    Candidates come from prefix blocking (cheap); only those pairs pay
    the set-intersection cost — the candidate→verify split that keeps
    near-dup detection linear-ish at corpus scale.
    """
    # _trigram_expr carries the <3-word guard: the unguarded copy
    # this key once inlined crashed with INVALID_ARRAY_INDEX on any
    # short doc in a multi-member block (sequence(1, size-2) descends
    # when size < 3), where the oracle just yields an empty gram list
    gram_expr = _trigram_expr()
    # gram SETS stay as per-doc arrays: the blocked self-join carries
    # them and array_intersect computes |A∩B| JVM-side per candidate
    # pair. No gram-level explode/shuffle — the exploded formulation
    # moved ~1.5 M gram rows through three shuffles for the same
    # answer. At scale the shuffle is by blocking key and its volume
    # is docs, not grams.
    # Grams are computed ONLY for docs in non-singleton blocks: a
    # prefix shared by one doc can't form a pair, and nearly every
    # doc is such a singleton, so the semi-join against multi-member
    # prefixes removes ~99% of the shingling work. (The oracle shingles
    # everything, but its inner join discards the same rows.)
    keyed = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, 40).alias("pfx")
    )
    multi = (
        keyed.groupBy("pfx")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("pfx")
    )
    # multi-member prefix count scales with the corpus → no static
    # broadcast hint; AQE converts the semi join when it fits
    g = keyed.join(multi, "pfx", "left_semi").select(
        "doc_id", "pfx", gram_expr.alias("grams")
    )
    # materialize: the blocked self-join reads g on both sides
    g = materialize(g)
    a, b = g.alias("a"), g.alias("b")
    pair = a.join(
        b,
        (F.col("a.pfx") == F.col("b.pfx"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    n_a = F.size(F.col("a.grams"))
    n_b = F.size(F.col("b.grams"))
    n_shared = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    # the oracle's intersection join is inner: pairs sharing no gram
    # don't appear
    pair = pair.filter(n_shared > 0)
    return pair.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(n_shared.cast("double") / (n_a + n_b - n_shared), 6).alias(
            "jaccard"
        ),
    )


@query("llm_neardup_lsh")  # rows-only: randomized hash family
def llm_neardup_lsh(spark, sf_dir):
    """pyspark.ml MinHashLSH approxSimilarityJoin — the stock scale
    path. Randomized hash family ⇒ rows-only; recall vs the exact
    prefix pairs is bounded in tests/test_approx.py.

    Features come from HashingTF (fit-free, fixed 2^18-dim space, one
    distributed pass), not CountVectorizer — CountVectorizer.fit
    builds the corpus-wide n-gram vocabulary on the driver, which is
    an OOM at 100 TB. Hash collisions only *merge* shingles (slightly
    raising estimated similarity), so LSH recall is preserved.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, Tokenizer

    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    tok = Tokenizer(inputCol="text", outputCol="words")
    words = tok.transform(d)
    grams = NGram(n=3, inputCol="words", outputCol="grams").transform(words)
    tf = HashingTF(
        inputCol="grams", outputCol="features", binary=True, numFeatures=1 << 18
    )
    # drop gram-less docs: MinHashLSH requires ≥1 non-zero entry
    feats = (
        tf.transform(grams)
        .filter(F.size("grams") > 0)
        .select("doc_id", "features")
    )
    # cached: both sides of the self approxSimilarityJoin scan this;
    # uncached, tokenize+ngram+hash runs twice
    feats = materialize(feats)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    pairs = lsh.approxSimilarityJoin(feats, feats, 0.8, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query(
    "llm_dup_cluster",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM documents a JOIN documents b
          ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
         AND a.doc_id <> b.doc_id
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    """,
)
def llm_dup_cluster(spark, sf_dir):
    """Connected components over near-dup edges → canonical doc id.

    Delegates to :func:`connected_components` — min-label propagation
    with pointer-doubling, O(log diameter) rounds, raising instead of
    returning partial labels if the round budget exhausts.
    """
    d = load(spark, sf_dir, "documents")
    pfx = d.select("doc_id", F.substring("text", 1, 40).alias("pfx"))
    pairs = (
        pfx.alias("a")
        .join(
            pfx.alias("b"),
            (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    edges = edges_from_pairs(pairs, src="src", dst="dst").localCheckpoint()
    return connected_components(d, edges)


def edges_from_pairs(pairs_df, src="doc_a", dst="doc_b"):
    """Reusable: symmetric edge list from an a<b pair DataFrame."""
    fwd = pairs_df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.unionByName(
        pairs_df.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )


def connected_components(vertices_df, edges_df, id_col="doc_id", max_rounds=30):
    """Min-label propagation with pointer-doubling shortcutting.

    Each round does (a) one hop of neighbor min-label propagation and
    (b) one pointer-jump (`label(x) ← label(label(x))`), so label
    distance to the component minimum roughly halves per round:
    convergence in O(log diameter) rounds, not O(diameter) as plain
    propagation would need (a 10^6-long chain converges in ~20 rounds
    instead of 10^6). Per-round localCheckpoint cuts lineage so deep
    iteration doesn't build an unboundedly deep plan. No GraphFrames
    dependency.

    Raises ``RuntimeError`` if ``max_rounds`` is exhausted before the
    labels converge — a silent partial clustering would mis-assign
    canonical ids downstream (dedup would keep the wrong copies).
    """
    labels = vertices_df.select(
        F.col(id_col).alias("doc_id"), F.col(id_col).alias("cluster_id")
    )
    for _ in range(max_rounds):
        prop = edges_df.join(labels, edges_df.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "cluster_id"
        )
        hop = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            # materialize BEFORE the self-join below (the repo's
            # cached-self-join rule): uncached, hop's whole lineage
            # (propagation join + union + groupBy) evaluated twice
            # per round — once per join side — doubling the
            # propagation phase's shuffle work
            .localCheckpoint()
        )
        # pointer jump: follow the label one step through the mapping
        # itself; every label is a vertex id so the self-join is total
        parent = hop.select(
            F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
        )
        new_labels = (
            hop.join(parent, hop.cluster_id == F.col("p_id"))
            .select("doc_id", F.col("p_label").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "raise max_rounds (labels would be silently partial otherwise)"
    )




@query(
    "llm_neardup_verified",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS word
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               MIN(md5('s0:' || word)) AS h0, MIN(md5('s1:' || word)) AS h1,
               MIN(md5('s2:' || word)) AS h2, MIN(md5('s3:' || word)) AS h3
        FROM w GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band, h0 || h1 AS key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band, h2 || h3 AS key FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2])) AS grams
        FROM documents
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
                 (len(ga.grams) + len(gb.grams)
                  - len(list_intersect(ga.grams, gb.grams))), 6) AS jaccard
    FROM cand c
    JOIN grams ga ON ga.doc_id = c.doc_a
    JOIN grams gb ON gb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
          (len(ga.grams) + len(gb.grams)
           - len(list_intersect(ga.grams, gb.grams))) >= 0.5
    """,
)
def llm_neardup_verified(spark, sf_dir):
    """The full production near-dup pipeline in one operator:
    deterministic MinHash banding generates candidates, exact trigram
    Jaccard verifies them, pairs below 0.5 are rejected.

    This is the candidate→verify composition the 100 TB path runs:
    one materialized (doc_id, grams, signature) pass feeds banding
    AND verification — the corpus is shingled exactly once; banding
    is an equi-join whose cost is Σ|bucket|²; verification touches
    only candidate pairs (array_intersect on carried gram sets —
    JVM-side, no gram explode); and everything is deterministic, so
    incremental corpus updates re-bucket only new documents.
    """
    d = load_spread(spark, sf_dir, "documents")
    # no size(grams) filter: see llm_neardup_minhash — null band keys
    # from empty gram arrays never join, and the pushed-down filter
    # would recompute the shingle expression.
    base = materialize(
        _with_minhash_sig(d.select("doc_id", _trigram_expr().alias("grams")))
    )
    bands = _band_keys(base)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ga = base.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = base.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    n_shared = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    jac = n_shared.cast("double") / (
        F.size(F.col("ga")) + F.size(F.col("gb")) - n_shared
    )
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def build_neardup_index(docs_df, index_path: str) -> None:
    """Persist the deterministic MinHash band-key index for a corpus:
    one (doc_id, band, key) parquet row per band per document.

    Because the hash family is content-derived (md5), the index is a
    pure function of each document — the foundation of INCREMENTAL
    near-dup detection: a later batch buckets only its own documents
    and joins against this store, never re-hashing the corpus (the
    randomized pyspark.ml family cannot do this — new fits produce
    incomparable keys).
    """
    g = docs_df.select("doc_id", _trigram_expr().alias("grams"))
    bands = _band_keys(_with_minhash_sig(g).drop("grams"))
    # <3-word docs yield NULL band keys; a NULL key can never satisfy
    # the equi-join, so persisting those rows is pure index bloat
    # that grows with the corpus (real crawls have many short docs)
    bands.filter(F.col("key").isNotNull()).write.mode(
        "overwrite"
    ).parquet(index_path)


def neardup_incremental(spark, new_docs_df, index_path: str):
    """Near-dup candidate pairs for a NEW document batch against an
    indexed corpus, appending the batch to the index.

    Work is proportional to the batch: only new docs are shingled and
    hashed; the join probes the stored band keys (at scale the store
    is bucketed by key so the probe is co-located). Returns distinct
    (doc_a < doc_b) pairs where at least one side is new — the full
    pair set stays consistent with a from-scratch rebuild (asserted
    in tests/test_llm.py).
    """
    g = new_docs_df.select("doc_id", _trigram_expr().alias("grams"))
    new_bands = materialize(
        _band_keys(_with_minhash_sig(g).drop("grams")).filter(
            F.col("key").isNotNull()  # same no-dead-rows rule as build
        )
    )
    old_bands = spark.read.parquet(index_path)
    all_bands = old_bands.unionByName(new_bands)
    a, b = new_bands.alias("a"), all_bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # localCheckpoint, NOT cache: the append below writes the path the
    # pair plan reads, and Spark's post-write refresh would invalidate
    # a cached plan over it (see dedup_incremental) — the checkpoint
    # pins the result before the index mutates.
    pairs = pairs.localCheckpoint()
    new_bands.write.mode("append").parquet(index_path)
    return pairs


def build_dedup_index(docs_df, index_path: str) -> None:
    """Persist the exact-dedup content index: one (h, doc_id) row per
    distinct sha256(text), keeping the min doc_id — the canonical-
    document register a production corpus maintains."""
    _content_hash_min(docs_df).write.mode("overwrite").parquet(index_path)


def dedup_incremental(spark, new_docs_df, index_path: str):
    """Exact-dedup a NEW batch against the content index: returns the
    batch's novel canonical rows (first occurrence wins within the
    batch too) and appends them to the index.

    O(batch) work: only new texts are hashed; the anti join probes the
    store by 32-byte digest. Together with ``neardup_incremental``
    this is the streaming-corpus ingestion path — neither ever
    rescans history.
    """
    hashed = _content_hash_min(new_docs_df)
    old = spark.read.parquet(index_path)
    # localCheckpoint, NOT cache: the append below writes to the same
    # path the plan reads, and Spark's post-write refresh invalidates
    # any cached plan over that path — a cached `fresh` would silently
    # recompute against the already-updated index (returning nothing).
    # The checkpoint cuts lineage so the result is fixed first.
    fresh = hashed.join(old, "h", "left_anti").localCheckpoint()
    fresh.write.mode("append").parquet(index_path)
    return fresh.select("doc_id", "h")


_SUB_K = 40  # exact-substring window (chars), Lee et al.-style

#: shared oracle for the exact anchor and its hash-shuffled scale twin
#: (both produce identical spans; the twin only changes WHICH BYTES
#: move through the shuffle, not the result)
_SUBSTRING_ORACLE = f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, n_chars - {_SUB_K} + 1)) AS p
      FROM documents
      WHERE n_chars >= {_SUB_K}
    ),
    grams AS (
      SELECT doc_id, p, substr(text, p, {_SUB_K}) AS g FROM pos
    ),
    dup AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) > 1
    ),
    flagged AS (
      SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)
    ),
    isl AS (
      SELECT doc_id, p,
             SUM(CASE WHEN p - prev_p = 1 THEN 0 ELSE 1 END)
               OVER (PARTITION BY doc_id ORDER BY p
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (
        SELECT doc_id, p,
               LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev_p
        FROM flagged
      )
    )
    SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
           CAST(MAX(p) + {_SUB_K} - 1 AS BIGINT) AS span_end,
           CAST(MAX(p) - MIN(p) + {_SUB_K} AS BIGINT) AS span_len
    FROM isl GROUP BY doc_id, island
    """


@query(
    "llm_dedup_substring",
    oracle=_SUBSTRING_ORACLE,
)
def llm_dedup_substring(spark, sf_dir):
    """Exact cross-document substring dedup (the Lee et al. 2022
    "Deduplicating Training Data" semantics, public paper): every
    maximal span whose {k}-char windows all occur in at least one
    OTHER document, reported as (doc, start, end, len) — the spans a
    training pipeline would cut.

    Plan: explode each doc into its k-char windows (the one
    data-expanding step, ~k× corpus bytes through the first shuffle),
    keep windows seen in >1 distinct doc, semi-join back, then merge
    flagged positions into maximal spans with the gap-and-island
    window — doc-partitioned, one exchange. The >1-distinct-docs test
    is ``min(doc_id) != max(doc_id)``, not ``countDistinct``: min/max
    fully combine map-side (one row per distinct gram leaves each
    mapper, even for a degenerate hot gram repeated 10^9 times),
    where countDistinct shuffles every distinct (gram, doc) pair —
    measured 1.5 s vs 2.0 s at sf0.1 and strictly safer under skew.
    At 100 TB the window explode is the cost center: the published
    scale path is a suffix-array per shard + merge, with
    `llm_winnow`/`llm_neardup_minhash` as the approximate screens;
    this key is the exact anchor the screens are recall-tested
    against. 1-based positions, inclusive span_end, both engines.
    """
    d = load_spread(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _SUB_K
    )
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars") - _SUB_K + 1)
        ).alias("p"),
    )
    grams = pos.select(
        "doc_id", "p", F.expr(f"substr(text, p, {_SUB_K})").alias("g")
    )
    dup = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"))
        .filter(F.col("dmin") != F.col("dmax"))
        .select("g")
    )
    flagged = grams.join(dup, "g", "left_semi").select("doc_id", "p")
    # the gap-and-island merge lives ONCE in _merge_islands — the
    # hashed twin shares it, and the shared _SUBSTRING_ORACLE asserts
    # both produce identical spans, so a drifted copy here would
    # break exactly that invariant
    return _merge_islands(flagged)


def _merge_islands(flagged):
    """(doc_id, p) flagged window starts → maximal spans (shared by the
    exact anchor and the hashed twin)."""
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = flagged.withColumn(
        "island",
        F.sum(
            F.when(F.col("p") - F.lag("p").over(w) == 1, 0).otherwise(1)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("p").cast("long").alias("span_start"),
        (F.max("p") + _SUB_K - 1).cast("long").alias("span_end"),
        (F.max("p") - F.min("p") + _SUB_K).cast("long").alias("span_len"),
    ).drop("island")


@query(
    "llm_substring_dedup_hashed",
    oracle=_SUBSTRING_ORACLE,
)
def llm_substring_dedup_hashed(spark, sf_dir):
    """``llm_dedup_substring``'s 100 TB shuffle-volume twin — IDENTICAL
    spans (same oracle, hash-matched), but the k× window explode
    shuffles 8-byte ``xxhash64(gram)`` values instead of the k-char
    gram bytes, and full gram bytes move only for CANDIDATE positions.

    Three stages: (1) candidate pass — group window positions by the
    64-bit gram hash, keep hashes spanning >1 distinct doc
    (map-side-combining min/max test, same skew argument as the
    anchor); the k× data expansion through this exchange is ~20 bytes
    per window instead of k+20. (2) exactness repair — the flagged
    positions (volume ∝ duplicate mass + a ~n²/2⁶⁴ collision residue,
    zero at any real corpus fraction) join back to the documents table
    on doc_id (texts cross the wire once, not k×), re-extract the REAL
    gram, and re-run the >1-distinct-doc test on actual bytes, so a
    hash collision can never flag a false span. (3) the anchor's
    gap-and-island merge. At 100 TB stage 1 is the cost center and it
    now moves ~1/3 the bytes of the anchor's gram shuffle at k=40 —
    the suffix-array-per-shard design the anchor's docstring sketches
    buys the rest, at the price of a custom merge; this twin keeps
    everything in Catalyst-visible DataFrame ops.

    Measured trade (SCALE.md round-5): local wall is ~1.1× the anchor
    at sf0.1 and ~1.8× at constant-rate sf1 — the extra xxhash pass
    and candidate re-extraction cost CPU, which dominates while the
    exchange still fits memory. The twin wins only where the explode
    exchange is network/disk-bound (the 100 TB regime it exists for);
    the anchor stays the default at fixture scales.
    """
    d = load_spread(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _SUB_K
    )
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars") - _SUB_K + 1)
        ).alias("p"),
    )
    # (r13: tried materializing this two-consumer branch — the cache
    # write plus materialize's extra count() pass cost MORE than
    # recomputing the cheap explode+xxhash lineage, 1.1–1.3× solo.
    # The suffix-array twin's window-sort lineage is the expensive
    # kind that does pay; this one is not.)
    hashed = pos.select(
        "doc_id",
        "p",
        F.xxhash64(F.expr(f"substr(text, p, {_SUB_K})")).alias("h"),
    )
    cand_h = (
        hashed.groupBy("h")
        .agg(F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"))
        .filter(F.col("dmin") != F.col("dmax"))
        .select("h")
    )
    # the candidate-hash set scales with DUPLICATE MASS, not with any
    # fixed dimension — it may never ride a broadcast (the r7 2 GiB
    # memory rehearsal killed exactly this plan: Catalyst estimated the
    # post-agg side small, tried to build the broadcast on the driver,
    # and died with BuildAndBroadcastTableError at sf1). merge hints
    # pin the spill-safe sort-merge strategy for every join whose
    # build side grows with the corpus.
    cand_pos = hashed.join(
        cand_h.hint("merge"), "h", "left_semi"
    ).select("doc_id", "p")
    # exactness repair: re-extract true gram bytes for candidates only
    cand_g = cand_pos.join(
        d.select("doc_id", "text").hint("merge"), "doc_id"
    ).select(
        "doc_id", "p", F.expr(f"substr(text, p, {_SUB_K})").alias("g")
    )
    true_g = (
        cand_g.groupBy("g")
        .agg(F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"))
        .filter(F.col("dmin") != F.col("dmax"))
        .select("g")
    )
    flagged = cand_g.join(
        true_g.hint("merge"), "g", "left_semi"
    ).select("doc_id", "p")
    return _merge_islands(flagged)


def _class_ids(tuples):
    """Injective (equality-only) int64 ids for distinct rank tuples —
    the densification step of the quadrupling pass. Since r9 collapsed
    the construction to ONE quadrupling round, nothing downstream ever
    ORDERS by the ids (they feed a groupBy and an equi-join only), so
    the old order-preserving form's range-repartition (an extra
    boundary-sampling job) and full in-partition sort were pure fixed
    overhead — ``monotonically_increasing_id`` over the distinct
    tuples is injective on its own, which is all equality classes
    need (r10: 5.97 s → re-measured below at sf0.1).

    The result is ``localCheckpoint``-ed (lineage truncated): id
    values depend on partition order and per-partition counters, so a
    recomputation after executor loss could assign DIFFERENT ids to
    the same tuple — and the frame feeds consumers on two plan paths
    (the dup grouping and the flagged semi-join), which would silently
    disagree. With the lineage cut, losing the checkpointed blocks
    fails the job loudly instead (the documented Spark trade for
    nondeterministic ids)."""
    return (
        tuples.distinct()
        .withColumn("rid", F.monotonically_increasing_id())
        .localCheckpoint()
    )


@query(
    "llm_substring_dedup_sa",
    oracle=_SUBSTRING_ORACLE,
)
def llm_substring_dedup_sa(spark, sf_dir):
    """``llm_dedup_substring``'s suffix-array scale path — the third
    point on the trade curve the anchor's docstring names (Lee et al.
    2022 run a suffix array for exactly this reason): IDENTICAL spans
    (same oracle, hash-matched), computed WITHOUT ever shuffling gram
    bytes AND without the hashed twin's collision-repair join.

    Manber–Myers rank densification, truncated at the window length:
    positions explode once into (doc, pos, 8-char block) rows, ONE
    `_class_ids` pass turns the distinct blocks into dense rank₈ ids,
    and k = 40 = 5 × 8 makes the exact-40-char equivalence classes the
    5-tuples of rank₈ at block starts (p, p+8, .., p+32) — no
    over-comparison at 41..64 and no second densification round (r9:
    the old rank₃₂ pass was pure fixed overhead). r14 collapsed the
    base-rank construction too: ranks only feed equality tests (the
    5-tuple grouping and the semi-join), so densifying the 8-char
    substrings DIRECTLY replaces the old char explode + 2-char pack +
    windowed quadrupling — one full (doc, p) partition-sort of n char
    rows and an eager n-row cache gone, identical classes by
    injectivity (bench 5.5 → ~3.4 s at sf0.1). From there the
    anchor's own pipeline finishes: >1-distinct-doc test (map-side
    min/max), semi-join, shared `_merge_islands`.

    Exactness: ranks are ids of DISTINCT pairs, so equal 2L-prefixes
    get equal ranks and unequal ones unequal — no collisions, no
    repair pass; the oracle match is bit-exact by construction.

    Scale shape (why this is the published 100 TB path): no stage
    ever materializes more than n NARROW rows (~32 B/char), where the
    anchor's gram exchange holds n×k bytes in flight (the 2 GiB-
    rehearsal failure mode); rank densification is bounded by DISTINCT
    tuple counts, which collapse fast on natural text. Measured
    crossover (local[32]): sf0.1 → sf1 (10× chars) moves this key
    10.1 s → 26.6 s (2.6×, round overhead amortizing) while the
    anchor moves 1.3 s → 14.8 s (11×, linear in n×k) — identical
    50 000 spans both ways; the curves cross right past sf1 even
    locally, and the gap is structural at cluster scale.
    """
    d = load_spread(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _SUB_K
    )
    # Base blocks are the 8-char substrings THEMSELVES (r14): the rank
    # of a block only feeds equality tests downstream (the 5-tuple
    # grouping and the semi-join), so ANY injective id over distinct
    # blocks yields identical spans — the old 2-char pack + window-
    # lead quadrupling built the same equivalence classes while paying
    # a per-char explode, a full (doc, p) partition-sort of n char
    # rows, and an eager n-row cache (profiled r14: the two passes
    # were ~1 s of the key's 4.1 s wall). substr(text, p, 8) is
    # row-side — no exchange, no sort, and cheap enough that BOTH
    # consumers (the distinct and the join probe) just recompute it
    # (the r13 hashed-twin lesson: caching a cheap explode lineage
    # costs more than recomputing it). Doc-end tail blocks are shorter
    # strings, so they class separately — exactly what the old −1
    # sentinel packs encoded.
    pos = d.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars"))
        ).alias("p"),
        F.col("text"),
    )
    paired = pos.select(
        "doc_id", "n_chars", "p", F.expr("substr(text, p, 8)").alias("g8")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    # shuffle_hash, not merge: both joins here are equality-only, so
    # the sort-merge strategy's full sort of the n-row probe side buys
    # nothing; the build side (distinct blocks / duplicate classes) is
    # the smaller one and is hash-built per partition — still
    # spill-safe and never a driver broadcast (the r7 2 GiB-rehearsal
    # rule: corpus-scaling sides may not ride a broadcast).
    ids = _class_ids(paired.select("g8"))
    r8 = paired.join(ids.hint("shuffle_hash"), "g8").select(
        "doc_id", "n_chars", "p", F.col("rid").alias("r")
    )
    # exact-40 equivalence class = the 5-tuple of rank₈ values at
    # block starts p, p+8, .., p+32 (k = 40 = 5×8): two windows share
    # all 40 chars iff all five 8-char blocks match — identical class
    # structure to the old (rank₃₂, rank₈) pair, but grouping on five
    # longs costs one window-lead projection where the second
    # quadrupling round cost a distinct + range-repartition +
    # checkpoint + merge-join chain (the whole fixed overhead the r8
    # bench flagged: measured 8.85 s → this form re-measured below)
    rcols = ["r0", "r1", "r2", "r3", "r4"]
    # same two-consumer shape as `paired`: `windows` feeds the dup
    # grouping AND the flagged semi-join probe
    windows = materialize(
        r8.select(
            "doc_id",
            "n_chars",
            "p",
            F.col("r").alias("r0"),
            F.lead("r", 8).over(wdoc).alias("r1"),
            F.lead("r", 16).over(wdoc).alias("r2"),
            F.lead("r", 24).over(wdoc).alias("r3"),
            F.lead("r", 32).over(wdoc).alias("r4"),
        )
        .filter(F.col("p") <= F.col("n_chars") - _SUB_K + 1)
        .select("doc_id", "p", *rcols)
    )
    dup = (
        windows.groupBy(*rcols)
        .agg(F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"))
        .filter(F.col("dmin") != F.col("dmax"))
        .select(*rcols)
    )
    flagged = windows.join(
        dup.hint("shuffle_hash"), rcols, "left_semi"
    ).select("doc_id", "p")
    return _merge_islands(flagged)


#: stop-shingle guard for containment blocking: trigrams present in
#: more than 10% of documents are dropped from candidate generation
#: (boilerplate shingles block everything with everything — the same
#: viral-key rule as graph_common_neighbors' _CN_CAP). The cap is
#: corpus-RELATIVE (df·10 ≤ N): the sf1 rehearsal showed an absolute
#: cap emptying the candidate set once a 10× corpus multiplied every
#: shingle's df past it.


@query(
    "llm_containment",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 2),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM d
    ),
    nsh AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    n AS (SELECT COUNT(*) AS n_total FROM documents),
    keep AS (
        SELECT g FROM sh CROSS JOIN n
        GROUP BY g, n.n_total HAVING COUNT(*) * 10 <= n_total
    ),
    shk AS (SELECT sh.doc_id, sh.g FROM sh JOIN keep USING (g)),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM shk a JOIN shk b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.shared AS BIGINT) AS shared,
           CAST(na.n_sh AS BIGINT) AS n_a,
           floor(i.shared * 1.0 / na.n_sh * 1000000 + 0.5) / 1000000
               AS containment6
    FROM inter i JOIN nsh na ON na.doc_id = i.doc_a
    WHERE i.shared * 2 >= na.n_sh
    """,
)
def llm_containment(spark, sf_dir):
    """Directed shingle containment — |sh(A) ∩ sh(B)| / |sh(A)| ≥ 0.5:
    catches a document EMBEDDED in a larger one, which symmetric
    Jaccard misses (a snippet inside a 100× bigger doc has tiny
    Jaccard but containment ≈ 1).

    Same blocked shape as every dedup key: candidates only from
    shared-shingle equi-joins (cost Σ df²), with the corpus-relative
    stop-shingle guard (df·10 ≤ N) so boilerplate trigrams cannot go
    quadratic — and so the guard means the same thing at every corpus
    size (the sf1 rehearsal caught the absolute form emptying the
    candidate set at 10×).
    The ≥ 0.5 cut is evaluated integer-exactly (shared·2 ≥ n_a) before
    the floor-pinned 6-dp score is computed, so the cut can never
    flicker on float ulps. Denominator uses the UNCAPPED shingle
    count, keeping the score meaningful when some of A's shingles are
    boilerplate.
    """
    d = load_spread(spark, sf_dir, "documents")
    sh = materialize(
        d.select("doc_id", F.explode(_trigram_expr()).alias("g"))
    )
    nsh = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    n_total = d.agg(F.count("*").alias("n_total"))
    keep = (
        sh.groupBy("g")
        .agg(F.count("*").alias("df"))
        .join(F.broadcast(n_total))
        .filter(F.col("df") * 10 <= F.col("n_total"))
    )
    shk = sh.join(keep.select("g"), "g", "left_semi")
    a, b = shk.alias("a"), shk.alias("b")
    # shuffle_hash, not merge (r13, measured 0.65×): the join is
    # equality-on-g with a residual, so sort-merge's full sort of the
    # shingle stream buys nothing; per-partition hash build is the
    # same spill-safe, never-broadcast strategy the suffix-array twin
    # pins, and per-key build volume is capped by the stop-shingle
    # guard (df·10 ≤ N) plus AQE skew splitting.
    inter = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    na = nsh.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    return (
        inter.join(na, "doc_a")
        .filter(F.col("shared") * 2 >= F.col("n_a"))
        .select(
            "doc_a",
            "doc_b",
            "shared",
            "n_a",
            (
                F.floor(
                    F.col("shared") * 1.0 / F.col("n_a") * 1_000_000 + 0.5
                )
                / 1_000_000
            ).alias("containment6"),
        )
    )


#: MinHash signature width for the estimate-vs-truth key: 32 md5-salted
#: permutation surrogates.
_MH_K = 32


@query(
    "llm_minhash_estimate",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 2),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM d
    ),
    sig AS (
        SELECT doc_id, j,
               MIN(('0x' || CASE WHEN j % 2 = 0
                            THEN SUBSTR(MD5((j // 2)::VARCHAR || '|' || g), 1, 16)
                            ELSE SUBSTR(MD5((j // 2)::VARCHAR || '|' || g), 17, 16)
                            END)::UBIGINT) AS mh
        FROM sh, (SELECT unnest(generate_series(0, {_MH_K - 1})) AS j)
        GROUP BY doc_id, j
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM documents a JOIN documents b
          ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
         AND a.doc_id < b.doc_id
    ),
    agree AS (
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
        GROUP BY c.doc_a, c.doc_b
    ),
    exact AS (
        SELECT c.doc_a, c.doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.g = a.g
        GROUP BY c.doc_a, c.doc_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
    SELECT ag.doc_a, ag.doc_b,
           floor(ag.n_agree * 1.0 / {_MH_K} * 1000000 + 0.5) / 1000000
               AS jaccard_est6,
           floor(COALESCE(ex.n_inter, 0) * 1.0
                 / (sa.n_sh + sb.n_sh - COALESCE(ex.n_inter, 0))
                 * 1000000 + 0.5) / 1000000 AS jaccard_exact6
    FROM agree ag
    LEFT JOIN exact ex ON ex.doc_a = ag.doc_a AND ex.doc_b = ag.doc_b
    JOIN sizes sa ON sa.doc_id = ag.doc_a
    JOIN sizes sb ON sb.doc_id = ag.doc_b
    """,
)
def llm_minhash_estimate(spark, sf_dir):
    """MinHash Jaccard ESTIMATE next to exact Jaccard for the same
    pairs — the sketch-accuracy ledger, fully hash-matched because the
    "permutations" are md5-salted hashes both engines derive
    identically (unlike `MinHashLSH`'s engine-private family, which is
    why `llm_neardup_lsh` is rows-only).

    Estimate = fraction of k=32 slots whose min-hash agrees —
    E[agree/k] is exactly the Jaccard similarity. Signatures cost one
    explode×k → (doc, slot) MIN reduction (map-side combined);
    candidate pairs come from the same prefix blocking as
    `llm_neardup_pairs`, so the quadratic term never appears. The
    pytest layer asserts |est − exact| ≤ 3/sqrt(k) per pair.
    """
    d = load_spread(spark, sf_dir, "documents")
    pfx0 = d.select("doc_id", F.substring("text", 1, 40).alias("pfx"))
    ca, cb = pfx0.alias("pa"), pfx0.alias("pb")
    cand0 = ca.join(
        cb,
        (F.col("pa.pfx") == F.col("pb.pfx"))
        & (F.col("pa.doc_id") < F.col("pb.doc_id")),
    ).select(
        F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
    )
    cand = materialize(cand0)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # signatures, intersections and sizes are only ever consumed for
    # docs inside a candidate pair, so the shingle table is
    # semi-joined down to those docs BEFORE any hashing — at any scale
    # the ledger's cost tracks the blocked-candidate volume, not the
    # corpus (the oracle signs everything and filters at the join;
    # same values, since unpaired docs never reach its output either)
    sh = materialize(
        d.join(cand_docs, "doc_id", "left_semi").select(
            "doc_id", F.explode(_trigram_expr()).alias("g")
        )
    )
    # one md5 yields TWO 64-bit signature slots (its halves) — the
    # digest work halves vs hashing per slot; the oracle derives the
    # identical values with j//2 salts and j%2 slicing. The per-slot
    # MIN compares the fixed-width lowercase hex slices directly —
    # 16-char hex is lexicographically monotone with its numeric
    # value, so MIN(hex) picks the element DuckDB's ::UBIGINT MIN
    # picks, and only the docs x 32 winners pay conv() + the
    # DECIMAL(20,0) cast (16 hex digits exceed BIGINT). A no-explode
    # variant keeping the 32 slots as COLUMNS with 32 MIN aggregates
    # was measured 1.2-1.8x and rejected (r13).
    half = F.array(*[F.lit(m) for m in range(_MH_K // 2)])
    sig = (
        sh.select("doc_id", F.explode(half).alias("m"), "g")
        .select(
            "doc_id",
            F.md5(
                F.concat(F.col("m").cast("string"), F.lit("|"), "g")
            ).alias("dg"),
            "m",
        )
        .select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        (F.col("m") * 2).alias("j"),
                        F.substring("dg", 1, 16).alias("hx"),
                    ),
                    F.struct(
                        (F.col("m") * 2 + 1).alias("j"),
                        F.substring("dg", 17, 16).alias("hx"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.j").alias("j"), F.col("s.hx").alias("hx"))
        .groupBy("doc_id", "j")
        .agg(F.min("hx").alias("hx"))
        .select(
            "doc_id",
            "j",
            F.conv(F.col("hx"), 16, 10)
            .cast("decimal(20,0)")
            .alias("mh"),
        )
    )
    # NOT materialized (r13, measured both ways on two box states):
    # sig feeds both sides of the agree self-join, and caching it
    # looked 0.61-0.85x on one box — but re-measured 1.13-1.18x on a
    # re-provisioned box across three solo A/Bs (control HEAD-vs-HEAD
    # 0.98-1.05x), because the eager count() pass plus cache write
    # costs about what ONE extra signature pass costs: the lineage
    # rides the already-cached `sh`, so each side only re-pays the
    # md5 + double-explode + slot-MIN stage. Per the round's noise
    # rule (repeat A/Bs beat a single run) the cache is OFF; at
    # cluster scale `sh` staying cached is what bounds the re-compute.
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "j", F.col("mh").alias("mh_a")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "j", F.col("mh").alias("mh_b")
    )
    agree = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "j"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)
            ).alias("n_agree")
        )
    )
    ga = sh.select(F.col("doc_id").alias("doc_a"), "g")
    gb = sh.select(F.col("doc_id").alias("doc_b"), "g")
    exact = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        agree.join(exact, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(F.col("n_agree") * 1.0 / _MH_K * 1_000_000 + 0.5)
                / 1_000_000
            ).alias("jaccard_est6"),
            (
                F.floor(
                    F.coalesce("n_inter", F.lit(0))
                    * 1.0
                    / (F.col("na") + F.col("nb") - F.coalesce("n_inter", F.lit(0)))
                    * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("jaccard_exact6"),
        )
    )


@query(
    "llm_url_canonical",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'HTTP://Site-' || (doc_id % 50)
                      || '.Example.COM:80/a/b/?utm_source=x&id=' || doc_id % 7
                 WHEN 1 THEN 'http://site-' || (doc_id % 50)
                      || '.example.com/a/b?id=' || doc_id % 7
                 WHEN 2 THEN 'https://site-' || (doc_id % 50)
                      || '.example.com:443/a/b/index.html?id=' || doc_id % 7
                      || '&utm_campaign=y'
                 ELSE 'https://site-' || (doc_id % 50)
                      || '.example.com/a/b?ref=z&id=' || doc_id % 7
               END AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^[Hh][Tt][Tt][Pp][Ss]?://([^/?#]+)', 1))
                   AS hostport,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     COALESCE(NULLIF(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), ''), '/'),
                     '/index\\.html$', '/'),
                   '/+$', ''),
                 '^$', '/') AS path,
               regexp_extract(url, '\\?(.*)$', 1) AS qs
        FROM raw
    ),
    cleaned AS (
        SELECT doc_id,
               replace(replace(hostport, ':80', ''), ':443', '') AS host,
               path,
               array_to_string(
                 list_sort(list_filter(string_split(qs, '&'),
                     /* starts_with, NOT LIKE: in LIKE the '_' is a
                        single-char wildcard, so 'utm_%' also matched
                        'utmx=..' — a different predicate than the
                        Spark side's literal startswith('utm_') */
                     p -> p <> '' AND NOT (starts_with(p, 'utm_')
                                           OR starts_with(p, 'ref=')))),
                 '&') AS params
        FROM canon
    ),
    keys AS (
        SELECT doc_id,
               host || path || CASE WHEN params = '' THEN ''
                                    ELSE '?' || params END AS canonical
        FROM cleaned
    )
    SELECT canonical,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc
    FROM keys GROUP BY canonical
    """,
)
def llm_url_canonical(spark, sf_dir):
    """URL canonicalization dedup — the crawl-frontier collapse every
    web-corpus pipeline runs before fetch/dedup: lowercase the host,
    drop default ports (:80/:443), strip index.html and trailing
    slashes, remove tracking params (utm_*, ref), and SORT the
    remaining query params so equivalent URLs in any param order
    collapse to one canonical key. Four synthetic variants per
    document id fold to one canonical URL each.

    Pure codegen string work (regex + list lambdas — the param sort is
    an in-array sort, not a shuffle); the only exchange is the final
    canonical-key groupBy, which is exact dedup's hash-groupBy shape.
    """
    d = load_spread(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 4
    site = F.concat(F.lit("site-"), (F.col("doc_id") % 50).cast("string"))
    idp = (F.col("doc_id") % 7).cast("string")
    url = (
        F.when(
            m == 0,
            F.concat(
                F.lit("HTTP://Site-"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(".Example.COM:80/a/b/?utm_source=x&id="),
                idp,
            ),
        )
        .when(
            m == 1,
            F.concat(F.lit("http://"), site, F.lit(".example.com/a/b?id="), idp),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://"),
                site,
                F.lit(".example.com:443/a/b/index.html?id="),
                idp,
                F.lit("&utm_campaign=y"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), site, F.lit(".example.com/a/b?ref=z&id="), idp
            )
        )
    )
    raw = d.select("doc_id", url.alias("url"))
    hostport = F.lower(
        F.regexp_extract("url", r"^[Hh][Tt][Tt][Pp][Ss]?://([^/?#]+)", 1)
    )
    path0 = F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(F.nullif(path0, F.lit("")), F.lit("/")),
                r"/index\.html$",
                "/",
            ),
            r"/+$",
            "",
        ),
        r"^$",
        "/",
    )
    qs = F.regexp_extract("url", r"\?(.*)$", 1)
    cleaned = raw.select(
        "doc_id",
        F.replace(
            F.replace(hostport, F.lit(":80"), F.lit("")),
            F.lit(":443"),
            F.lit(""),
        ).alias("host"),
        path.alias("path"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split(qs, "&"),
                    lambda p: (p != "")
                    & ~(p.startswith("utm_") | p.startswith("ref=")),
                )
            ),
            "&",
        ).alias("params"),
    )
    keys = cleaned.select(
        "doc_id",
        F.concat(
            "host",
            "path",
            F.when(F.col("params") == "", "").otherwise(
                F.concat(F.lit("?"), F.col("params"))
            ),
        ).alias("canonical"),
    )
    return keys.groupBy("canonical").agg(
        F.count("*").alias("n_urls"), F.min("doc_id").alias("keeper_doc")
    )


@query(
    "llm_neardup_append",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM documents a JOIN documents b
      ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
     AND a.doc_id < b.doc_id
    """,
)
def llm_neardup_append(spark, sf_dir):
    """Incremental near-dup index maintenance — the operation a daily
    crawl actually runs: yesterday's corpus already has its pair set
    (the stored index); today's DELTA must only be paired against
    blocks it touches, never re-pairing the whole corpus. The key
    splits documents into base (doc_id % 5 != 0) and delta, computes
    base-internal pairs (standing in for the stored index — at
    production scale this term is a TABLE READ, not a recompute) plus
    the delta pass: delta docs joined against base∪delta on the same
    blocking key. The union hash-matches the FULL corpus pair set
    (`llm_neardup_pairs`' oracle verbatim), proving incremental
    maintenance converges to the from-scratch answer.

    Scale shape: the delta pass is |delta| rows equi-joined on the
    blocking key — cost Σ|touched block| · |delta∩block|, independent
    of corpus size given a block index; the delta side broadcasts
    under AQE when small (the common daily case). Delta-delta pairs
    appear from both join orientations, so the output normalizes to
    (least, greatest) and distincts — a |pairs|-bounded exchange.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("pfx")
    )
    base = d.filter(F.col("doc_id") % 5 != 0)
    delta = d.filter(F.col("doc_id") % 5 == 0)

    a, b = base.alias("a"), base.alias("b")
    base_pairs = a.join(
        b,
        (F.col("a.pfx") == F.col("b.pfx"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )

    dl, al = delta.alias("d"), d.alias("x")
    delta_pairs = (
        dl.join(
            al,
            (F.col("d.pfx") == F.col("x.pfx"))
            & (F.col("d.doc_id") != F.col("x.doc_id")),
        )
        .select(
            F.least("d.doc_id", "x.doc_id").alias("doc_a"),
            F.greatest("d.doc_id", "x.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return base_pairs.unionAll(delta_pairs).distinct()
