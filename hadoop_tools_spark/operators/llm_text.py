"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.E):
token stats, n-grams, TF-IDF, quality scoring, language ID,
fingerprinting.

All tokenization is JVM-side (`split`/`explode`/higher-order lambdas)
— no Python in the hot path, so a 100 TB corpus tokenizes inside
whole-stage codegen at scan speed. Word-level explodes multiply row
counts ~100×; partial aggregation collapses them again before any
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load, load_spread, local_rows_df, materialize
from ..registry import query

#: tiny function-word list present in the fixture vocabulary —
#: stands in for a per-language stopword table.
STOPWORDS = ("the", "a", "and", "of", "to")


@query(
    "llm_wordcount",
    oracle="""
    WITH w AS (
        SELECT lang, doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    SELECT lang, word, COUNT(*) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM w GROUP BY lang, word
    """,
)
def llm_wordcount(spark, sf_dir):
    """Token counts per (lang, word) with document frequency."""
    d = load_spread(spark, sf_dir, "documents")
    return (
        d.select("lang", "doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def _bigrams_expr(words):
    """Guarded word-bigram array — shared by llm_ngram and
    llm_repetition_quality so the builder (and its load-bearing
    guard placement) can never drift between them. The <2-word guard
    lives INSIDE the projection (empty array → explode drops the
    row): a row-level filter on size(split(..)) would be pushed below
    the projection and re-split every text."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)
        ),
    )
    return F.when(F.size(words) >= 2, bigrams).otherwise(
        F.array().cast("array<string>")
    )


@query(
    "llm_ngram",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i+1])) AS bigram
        FROM d
    )
    SELECT bigram, COUNT(*) AS n FROM g GROUP BY bigram
    """,
)
def llm_ngram(spark, sf_dir):
    """Word-bigram counts via a JVM-side sequence/transform — the
    n-gram generator used by shingling and language modeling."""
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return (
        d.select(F.explode(_bigrams_expr(words)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )


@query(
    "llm_tfidf",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word
    ),
    dl AS (SELECT doc_id, SUM(n) AS doc_len FROM tf GROUP BY doc_id),
    df AS (SELECT word, COUNT(*) AS n_docs FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_total FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               (CAST(tf.n AS DOUBLE) / dl.doc_len) *
               LN((n.n_total + 1.0) / (df.n_docs + 1.0)) AS tfidf
        FROM tf
        JOIN dl ON dl.doc_id = tf.doc_id
        JOIN df ON df.word = tf.word
        CROSS JOIN n
    ),
    pinned AS (
        SELECT doc_id, word,
               CAST(floor(tfidf * 1000000 + 0.5) AS BIGINT) AS t6
        FROM scored
    ),
    ranked AS (
        SELECT doc_id, word, t6,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY t6 DESC, word) AS rn
        FROM pinned
    )
    SELECT doc_id, word, t6 / 1000000.0 AS tfidf, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def llm_tfidf(spark, sf_dir):
    """Explicit-formula TF-IDF (tf = n/doc_len, idf = ln((N+1)/(df+1)))
    with top-3 terms per document.

    `HashingTF`+`IDF` from pyspark.ml uses engine-specific hashing;
    the explicit DataFrame arithmetic is reproducible anywhere and the
    formula lives in one place on both engines.

    Corpus size N is a 1-row aggregate cross-joined in (mirroring the
    oracle's ``CROSS JOIN n``) — one job, no extra driver-side
    ``count()`` pass over documents. The dfreq join is unhinted: the
    vocabulary of a web-scale corpus is unbounded, so a forced
    broadcast would pin an unbounded build side; AQE still broadcasts
    when dfreq is actually small.
    """
    d = load_spread(spark, sf_dir, "documents")
    n_total = d.agg(F.count("*").alias("n_total"))
    words = F.split("text", " ")
    # doc_len comes from the projection (size of the split array), not
    # a second aggregation over exploded words — it rides the tf
    # groupBy as a functionally-dependent key, saving a shuffle and a
    # fact-sized join. Document frequency is computed straight from
    # the distinct-words explode rather than from tf, so the two
    # branches are independent single-consumer pipelines — nothing to
    # cache (the tf-derived dfreq needed tf materialized, which cost
    # more than dfreq's own one-explode pass).
    tf = (
        d.select(
            "doc_id",
            F.size(words).cast("long").alias("doc_len"),
            F.explode(words).alias("word"),
        )
        .groupBy("doc_id", "doc_len", "word")
        .agg(F.count("*").alias("n"))
    )
    dfreq = (
        d.select(F.explode(F.array_distinct(words)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_docs"))
    )
    scored = (
        tf.join(dfreq, "word")
        .join(F.broadcast(n_total))  # 1-row cross join, like the oracle
        .select(
            "doc_id",
            "word",
            (
                (F.col("n").cast("double") / F.col("doc_len"))
                * F.log(
                    (F.col("n_total") + F.lit(1.0))
                    / (F.col("n_docs") + F.lit(1.0))
                )
            ).alias("tfidf"),
        )
    )
    # RANK on the floor-pinned integer, not the raw LN product: the
    # top-3 MEMBERSHIP must not hinge on sub-ulp agreement between
    # JVM Math.log and DuckDB's libm (the hazard llm_sample_weighted's
    # docstring names); both engines order identical BIGINTs
    pinned = scored.select(
        "doc_id",
        "word",
        F.floor(F.col("tfidf") * 1_000_000 + 0.5).cast("long").alias("t6"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("t6").desc(), "word")
    return (
        pinned.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id", "word",
            (F.col("t6") / 1_000_000.0).alias("tfidf"), "rn",
        )
    )


@query(
    "llm_quality_filter",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, lang, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS n_distinct,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains({list(STOPWORDS)}, x))) AS BIGINT)
                   AS n_stop
        FROM documents
    )
    SELECT doc_id, lang, n_chars, n_words,
           ROUND(CAST(n_distinct AS DOUBLE) / n_words, 6) AS uniq_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_ratio
    FROM feats
    WHERE n_words BETWEEN 5 AND 10000
      AND CAST(n_distinct AS DOUBLE) / n_words > 0.2
      AND CAST(n_stop AS DOUBLE) / n_words < 0.5
    """,
)
def llm_quality_filter(spark, sf_dir):
    """Heuristic quality gate: length bounds, lexical diversity,
    function-word ratio — the standard pre-training corpus filters,
    all as pushed-down columnar expressions."""
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    uniq = F.col("n_distinct").cast("double") / F.col("n_words")
    stop = F.col("n_stop").cast("double") / F.col("n_words")
    return feats.filter(
        F.col("n_words").between(5, 10000) & (uniq > 0.2) & (stop < 0.5)
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        "n_words",
        F.round(uniq, 6).alias("uniq_ratio"),
        F.round(stop, 6).alias("stop_ratio"),
    )


@query(
    "llm_langid",
    oracle="""
    SELECT doc_id,
           CASE
             WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
             WHEN regexp_matches(text, '[ñ¿¡]')                 THEN 'es'
             WHEN regexp_matches(text, '[àâçèêëîïôûœ]')         THEN 'fr'
             WHEN regexp_matches(text, '[äößü]')                THEN 'de'
             ELSE 'en'
           END AS lang_pred
    FROM documents
    """,
)
def llm_langid(spark, sf_dir):
    """Character-class language ID heuristic (script + diacritics).

    The fixture corpus is synthetic ASCII for every `lang` value
    (FIXTURES.md), so here everything predicts 'en' — the *mechanism*
    (regex character-class scoring, deterministic tie order) is what
    this key witnesses; tests/test_llm.py feeds real multilingual
    strings through the same rules and asserts correct predictions.
    """
    d = load_spread(spark, sf_dir, "documents")
    return d.select("doc_id", langid_expr("text").alias("lang_pred"))


def langid_expr(text_col):
    """The language-ID expression, reusable on arbitrary DataFrames
    (tested on genuine multilingual strings in tests/test_llm.py)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        F.when(c.rlike("[一-鿿]"), "zh")
        .when(c.rlike("[ñ¿¡]"), "es")
        .when(c.rlike("[àâçèêëîïôûœ]"), "fr")
        .when(c.rlike("[äößü]"), "de")
        .otherwise("en")
    )


@query(
    "llm_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS bag_fingerprint,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS vocab_size
    FROM documents
    """,
)
def llm_fingerprint(spark, sf_dir):
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token bag — catches shuffled/reordered duplicates that
    exact text hashing misses."""
    d = load_spread(spark, sf_dir, "documents")
    bag = F.array_sort(F.array_distinct(F.split("text", " ")))
    return d.select(
        "doc_id",
        F.md5(F.array_join(bag, " ").cast("binary")).alias("bag_fingerprint"),
        F.size(bag).cast("long").alias("vocab_size"),
    )


_WINNOW_W = 4  # window width over the rolling k-gram hash sequence


@query(
    "llm_winnow",
    oracle="""
    WITH hs AS (
        SELECT doc_id,
               list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> md5(string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2])) AS h
        FROM documents
    ),
    sel AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(4, len(h)),
                   i -> list_aggregate(h[i-3:i], 'min'))) AS fps
        FROM hs WHERE len(h) >= 4
    )
    SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
           md5(array_to_string(list_sort(fps), ' ')) AS fp_digest
    FROM sel
    """,
)
def llm_winnow(spark, sf_dir):
    """Winnowing fingerprints (the MOSS scheme): rolling k-gram
    hashes, keep the minimum of every w-hash window, fingerprint =
    the distinct selected hashes. Guarantees any shared run of
    w+k-1 tokens between two documents shares a fingerprint — the
    positional/rolling-hash complement to the bag fingerprint and
    MinHash keys.

    Entirely a projection: the hash sequence, the sliding-window
    minima, and the digest are array expressions per row — zero
    shuffles at any scale (same discipline as the MinHash signature).
    Two expression traps both cost O(n²) if ignored:

    - the word-count guard is a plain pushed-down filter on the scan;
      it must NOT test the gram array itself or pushdown would
      recompute the whole hash pipeline per row;
    - the window minima use doubling ``zip_with`` rounds
      (min(window 2ᵏ) = pairwise min of two shifted min(window 2ᵏ⁻¹)
      arrays) rather than ``transform(sequence(..), i ->
      array_min(slice(hs, i, w)))`` — a free reference to ``hs``
      inside a lambda body is re-evaluated PER ELEMENT (measured 13×
      slower at w=4; worse as docs grow). ``zip_with`` binds both
      arrays once per row.
    """
    w = _WINNOW_W
    words = F.split("text", " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    hs_expr = F.transform(tri, lambda g: F.md5(g.cast("binary")))

    def sliding_min(arr, width):
        # width must be a power of two; zip_with pads the shorter side
        # with nulls and least() skips them, so the tail holds
        # partial-window minima — trimmed by the final slice.
        m, span = arr, 1
        while span < width:
            m = F.zip_with(
                m,
                F.slice(m, span + 1, F.greatest(F.size(m) - span, F.lit(0))),
                lambda x, y: F.least(x, y),
            )
            span *= 2
        return F.slice(m, 1, F.greatest(F.size(arr) - width + 1, F.lit(0)))

    d = load_spread(spark, sf_dir, "documents")
    # Two-step projection: the hash pipeline lands as a REAL column
    # before the zip_with rounds consume it. The rounds reference
    # their input ~6× (two zip_with args per round + the trim), and
    # CollapseProject declines to inline a non-cheap alias referenced
    # more than once (SPARK-36718), so `hs` is evaluated once per row
    # here vs 6-9× when the whole thing is one expression — measured
    # 5×. Grams = words − 2, so full windows need ≥ w+2 words; that
    # guard is a cheap scan-side filter.
    base = d.filter(F.size(words) >= w + 2).select(
        "doc_id", hs_expr.alias("hs")
    )
    sel = F.array_distinct(sliding_min(F.col("hs"), w))
    return base.select(
        "doc_id",
        F.size(sel).cast("long").alias("n_fp"),
        F.md5(F.array_join(F.array_sort(sel), " ").cast("binary")).alias(
            "fp_digest"
        ),
    )


# SimHash signature CTE shared by the llm_simhash / llm_simhash_neardup
# oracles: DuckDB re-derives the md5 word-hash bit votes independently
# (hex-prefix → UBIGINT, per-bit sign sum, bit 63 re-assembled in two's
# complement so the BIGINT matches Spark's long exactly).
_SIMHASH_CTE = """
    WITH words AS (
        SELECT doc_id, w, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY doc_id, w
    ),
    hashed AS (
        SELECT doc_id, cnt,
               ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
        FROM words
    ),
    votes AS (
        SELECT doc_id, b.i,
               SUM(CASE WHEN (h >> b.i) & 1 = 1 THEN cnt ELSE -cnt END) AS v
        FROM hashed, (SELECT unnest(generate_series(0, 63)) AS i) b
        GROUP BY doc_id, b.i
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN
                     CASE WHEN i = 63 THEN -9223372036854775808
                          ELSE (1::BIGINT << i) END
                   ELSE 0 END) AS BIGINT) AS simhash64
        FROM votes GROUP BY doc_id
    )
"""


@query(
    "llm_simhash",
    oracle=_SIMHASH_CTE + "SELECT doc_id, simhash64 FROM sig ORDER BY doc_id",
)
def llm_simhash(spark, sf_dir):
    """64-bit SimHash per document via Arrow-batched mapInPandas.

    md5-derived word hashes (deterministic, engine-independent) with
    numpy bit-vote majority — near-dup docs differ in few bits, so
    hamming distance over signatures blocks candidates at scale.
    Hash-matched against a DuckDB oracle that re-derives the votes from
    md5 hex; property-tested in tests/test_llm.py (prefix-pair docs have
    much smaller hamming distance than random pairs).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def simhash_batch(batches):
        for pdf in batches:
            sigs = []
            for text in pdf["text"]:
                votes = np.zeros(64, dtype=np.int64)
                words = text.split(" ")
                for w, cnt in zip(*np.unique(words, return_counts=True)):
                    h = int.from_bytes(
                        hashlib.md5(w.encode()).digest()[:8], "big"
                    )
                    bits = (
                        (np.uint64(h) >> np.arange(64, dtype=np.uint64))
                        & np.uint64(1)
                    ).astype(np.int64)
                    votes += (2 * bits - 1) * cnt
                sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                sigs.append(np.int64(np.uint64(sig)))  # two's-complement
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash64": sigs})

    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, simhash64 long"
    return d.mapInPandas(simhash_batch, schema=schema)


def hamming64(a, b):
    """Hamming distance between two 64-bit simhash columns (JVM-side
    bit_count of xor). Each argument is coerced INDEPENDENTLY — the
    old single isinstance(a, ...) check treated a str ``b`` as a
    string LITERAL when ``a`` was a Column (every distance NULL) and
    crashed on the converse mix."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


@query(
    "llm_token_stats",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
                   AS n_bpe_tokens
        FROM documents
    )
    SELECT doc_id, n_chars, n_ws_tokens, n_bpe_tokens,
           ROUND(CAST(n_chars AS DOUBLE) / n_bpe_tokens, 6) AS chars_per_token
    FROM t WHERE n_bpe_tokens > 0
    """,
)
def llm_token_stats(spark, sf_dir):
    """Token counting two ways: whitespace split and a BPE-ish regex
    lexer ([A-Za-z]+ | digit runs | single punctuation) — the cheap
    pre-tokenizer used to budget context windows before real BPE.
    Both tokenizations are JVM regex expressions; the RE2-compatible
    pattern means Spark and DuckDB lex identically.
    """
    d = load_spread(spark, sf_dir, "documents")
    # idx=0 → whole match (Spark defaults to capture group 1; DuckDB's
    # regexp_extract_all defaults to group 0 — align on 0)
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0
    )
    t = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
    )
    return t.filter(F.col("n_bpe_tokens") > 0).select(
        "doc_id",
        "n_chars",
        "n_ws_tokens",
        "n_bpe_tokens",
        F.round(
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens"), 6
        ).alias("chars_per_token"),
    )


@query(
    "llm_pipeline_e2e",
    oracle="""
    WITH off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
    doubled AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + (SELECT o FROM off) AS doc_id, text, lang
        FROM documents
    ),
    keep AS (
        SELECT MIN(doc_id) AS doc_id FROM doubled GROUP BY sha256(text)
    ),
    docs AS (
        SELECT d.doc_id, d.text, d.lang
        FROM doubled d JOIN keep k ON d.doc_id = k.doc_id
    ),
    feats AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '),
                   w -> list_contains(['the','a','and','of','to'], w)))
                   AS n_stop
        FROM docs
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           floor(CAST(SUM(CAST(floor(CAST(n_distinct AS DOUBLE) / n_words
                                     * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                 * 1.0 / COUNT(*) + 0.5) / 1000000.0 AS avg_uniq
    FROM feats
    WHERE n_words BETWEEN 5 AND 10000
      AND CAST(n_distinct AS DOUBLE) / n_words > 0.2
      AND CAST(n_stop AS DOUBLE) / n_words < 0.5
    GROUP BY lang
    ORDER BY lang
    """,
)
def llm_pipeline_e2e(spark, sf_dir):
    """The training-data pipeline end-to-end in ONE declarative plan:
    ingest (doubled corpus) → exact dedup (sha256 keep-min-id) →
    quality gate (length / lexical-diversity / stopword-ratio) →
    per-language corpus stats.

    Because every stage is DataFrame-declarative, Catalyst fuses the
    whole pipeline: dedup's hash-agg, the quality filters, and the
    final rollup plan as one job with three shuffles total (dedup
    keys, semi-join back, final groupBy) — no materialization
    between stages. At 100 TB each shuffle carries digests, ids, or
    per-language partials, never full texts; the only full-text pass
    is the initial scan.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # clone-id offset derived from the corpus, not a constant: at
    # >= 1M documents a fixed +1000000 would alias clone ids with
    # real ones and silently corrupt the dedup semi-join
    off = d.agg(F.max("doc_id") + 1).collect()[0][0]
    doubled = d.unionByName(
        d.select((F.col("doc_id") + off).alias("doc_id"), "text", "lang")
    )
    keep = (
        doubled.withColumn("h", F.sha2(F.col("text").cast("binary"), 256))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = doubled.join(keep, "doc_id", "left_semi")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = docs.select(
        "lang",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    uniq = F.col("n_distinct").cast("double") / F.col("n_words")
    stop = F.col("n_stop").cast("double") / F.col("n_words")
    return (
        feats.filter(
            F.col("n_words").between(5, 10000) & (uniq > 0.2) & (stop < 0.5)
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            # fixed-point mean (engine convention): AVG of doubles
            # sums in partition-dependent order; each ratio is one
            # IEEE division (identical both engines), pinned to 1e-6
            # integers whose sum is order-free
            F.sum(
                F.floor(uniq * 1_000_000 + 0.5).cast("long")
            ).alias("u6"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            (
                F.floor(F.col("u6") * 1.0 / F.col("n_docs") + 0.5)
                / 1_000_000.0
            ).alias("avg_uniq"),
        )
        .orderBy("lang")
    )


@query(
    "llm_simhash_neardup",
    oracle=_SIMHASH_CTE + """
    , chunks AS (
        SELECT doc_id, simhash64, b.i AS chunk_id,
               (simhash64 >> (16 * b.i)) & 65535 AS chunk_val
        FROM sig, (SELECT unnest(generate_series(0, 3)) AS i) b
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT)
               AS hamming
    FROM chunks a JOIN chunks b
      ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3
    """,
)
def llm_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs: pigeonhole chunk blocking + exact
    hamming verify — the hamming-ball candidate filter completing the
    SimHash pipeline.

    A 64-bit signature splits into 4 chunks of 16 bits; two signatures
    within hamming distance 3 differ in at most 3 chunks, so they MUST
    agree exactly on at least one (pigeonhole) — blocking on (chunk_id,
    chunk_value) has recall 1.0 for distance ≤ 3, no probabilistic
    banding. Verification is `bit_count(xor)` on the JVM, one codegen
    expression per candidate pair. At 100 TB: 4 rows per doc shuffle
    by chunk value; candidates are Σ|bucket|², and the 16-bit chunk
    space keeps buckets tiny for non-pathological corpora.
    tests/test_llm.py proves pair-set equality with brute force.

    PROMOTED from rows-only (r9, VERDICT ask #8): the signature pass
    was already the hash-matched `llm_simhash` (its DuckDB CTE
    re-derives the md5 bit votes), and the blocking/verify layer is
    pure integer arithmetic with probe-verified identical semantics
    on both engines (arithmetic `>>` on negative BIGINT, two's-
    complement `bit_count(xor)`), so the whole pipeline now carries a
    full hash oracle — nothing about the Pandas-UDF signature blocks
    SQL reproduction.
    """
    max_dist = 3
    sig = materialize(llm_simhash(spark, sf_dir))
    chunks = sig.select(
        "doc_id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright("simhash64", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash64", "c.chunk_id", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
        # dedup AFTER the hamming filter: distinct() is a full shuffle
        # of every blocked pair (the Σ|bucket|² quantity the docstring
        # flags), while near-dup survivors are orders of magnitude
        # fewer — hamming is a pure row function, so the reorder is
        # semantics-free
        .distinct()
    )


@query(
    "llm_unigram_logprob",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    cnt AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
    tot AS (SELECT COUNT(*) AS n_total FROM w),
    v AS (SELECT COUNT(*) AS n_vocab FROM cnt),
    scored AS (
        SELECT w.doc_id,
               LN((cnt.n + 1.0) / (tot.n_total + v.n_vocab)) AS lp
        FROM w JOIN cnt USING (word) CROSS JOIN tot CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           floor(CAST(SUM(CAST(floor(lp * 1000000 + 0.5) AS BIGINT))
                      AS BIGINT) * 1.0 / COUNT(*) + 0.5) / 1000000.0
               AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def llm_unigram_logprob(spark, sf_dir):
    """Per-document mean unigram log-probability (add-one smoothed) —
    the classic cheap perplexity proxy for training-data quality
    filtering: gibberish and boilerplate both sit far from the
    corpus-typical band.

    The unigram model is the corpus itself: token counts shuffle once
    by word (vocabulary-bounded, map-side combined), the two scalar
    normalizers (total tokens, vocab size) ride the plan as 1-row
    broadcast aggregates (the llm_tfidf pattern — no eager driver
    count), and the per-doc mean is one shuffle by doc_id. Nothing
    driver-side scales with the corpus.
    """
    d = load_spread(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    w = materialize(w)  # feeds counts, totals, and the scoring join
    cnt = w.groupBy("word").agg(F.count("*").alias("n"))
    tot = w.agg(F.count("*").alias("n_total"))
    voc = cnt.agg(F.count("*").alias("n_vocab"))
    lp = F.log((F.col("n") + 1.0) / (F.col("n_total") + F.col("n_vocab")))
    return (
        w.join(cnt, "word")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            # fixed-point mean (engine convention): each lp is one
            # libm LN both engines compute identically, but AVG sums
            # them in partition-dependent order — pin to 1e-6 BIGINTs
            # whose sum is order-free, then floor-pin the mean
            F.sum(
                F.floor(F.col("lp") * 1_000_000 + 0.5).cast("long")
            ).alias("lp6"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.floor(F.col("lp6") * 1.0 / F.col("n_tokens") + 0.5)
                / 1_000_000.0
            ).alias("avg_logprob"),
        )
    )


@query(
    "llm_bigram_lm",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    b AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(tk)),
                    i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS bg
      FROM t
    ),
    bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bb GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bb GROUP BY w1),
    c2 AS (SELECT w2, COUNT(*) AS n2 FROM bb GROUP BY w2),
    nb AS (SELECT COUNT(*) AS nbg FROM bb)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           floor(CAST(SUM(CAST(floor(
                     LN(0.7 * n12 / n1 + 0.3 * n2 / nbg) * 1000000 + 0.5)
                 AS BIGINT)) AS BIGINT) * 1.0 / COUNT(*) + 0.5) / 1000000.0
               AS avg_logprob
    FROM bb JOIN c12 USING (w1, w2) JOIN c1 USING (w1) JOIN c2 USING (w2)
            CROSS JOIN nb
    GROUP BY doc_id
    """,
)
def llm_bigram_lm(spark, sf_dir):
    """Per-document interpolated bigram log-probability — the KenLM-
    style perplexity filter one rung above ``llm_unigram_logprob``:
    P(w2|w1) = 0.7·c(w1,w2)/c(w1) + 0.3·c(w2)/N, scored against the
    corpus's own bigram model (CCNet-style quality filtering, public
    method).

    Bigrams are built JVM-side with ``transform(sequence(...))`` over
    the token array — an expression, not a window, so no per-token
    shuffle for adjacency. The three count tables shuffle once each by
    their token key (vocabulary-bounded, map-side combined), the
    scalar bigram total rides as a 1-row broadcast aggregate, and the
    scoring join is hash-partitioned by token — the same shape as a
    distributed language-model scorer at corpus scale. The per-doc
    mean is the only doc-keyed shuffle.
    """
    d = load_spread(spark, sf_dir, "documents").withColumn(
        "tk", F.split("text", " ")
    ).filter(F.size("tk") >= 2)
    bb = materialize(
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(element_at(tk, i) AS w1,"
                    "             element_at(tk, i + 1) AS w2))"
                )
            ).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")
    )
    # NOTE (r13): two restructures were measured SLOWER here — (a)
    # deriving c1/c2/nbg from c12 (each reference re-computes the c12
    # aggregation from bb: no subplan CSE, 1.4-1.6x), and (b) scoring
    # at bigram-TYPE grain then one occurrence join (1.0-1.14x across
    # three solo A/Bs: the count tables already ride broadcast joins,
    # so the restructure only added plan depth). Do not re-try blind.
    c12 = bb.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = bb.groupBy("w1").agg(F.count("*").alias("n1"))
    c2 = bb.groupBy("w2").agg(F.count("*").alias("n2"))
    nb = bb.agg(F.count("*").alias("nbg"))
    lp = F.log(
        F.lit(0.7) * F.col("n12") / F.col("n1")
        + F.lit(0.3) * F.col("n2") / F.col("nbg")
    )
    return (
        bb.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nb))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            # fixed-point mean (engine convention): each lp is one
            # libm LN both engines compute identically, but AVG sums
            # them in partition-dependent order — pin to 1e-6 BIGINTs
            # whose sum is order-free, then floor-pin the mean
            F.sum(
                F.floor(F.col("lp") * 1_000_000 + 0.5).cast("long")
            ).alias("lp6"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.floor(F.col("lp6") * 1.0 / F.col("n_bigrams") + 0.5)
                / 1_000_000.0
            ).alias("avg_logprob"),
        )
    )


@query(
    "llm_sample_stratified",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2))::INT % 100
          < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 30 ELSE 60 END
    ORDER BY doc_id
    """,
)
def llm_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep rates via
    hash-mod on the document id — the language-rebalancing step of a
    training-data mix (downsample the dominant language, keep the
    tail).

    Same scale shape as `sample_hashmod`: a pure scan-side filter, no
    shuffle, no RNG state, reproducible across runs/engines/retries.
    Rates are per-stratum percentages of the md5 space; any stratum
    column (domain, source, quality band) works the same way.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang") == "de", 30)
        .otherwise(60)
    )
    return (
        d.filter(bucket < rate).select("doc_id", "lang").orderBy("doc_id")
    )


@query(
    "llm_sample_weighted",
    oracle="""
    WITH p AS (
      SELECT doc_id, lang, n_chars,
             ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               * 1.0 / GREATEST(n_chars, 1) AS priority
      FROM documents
    )
    SELECT doc_id, lang, n_chars, priority FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY priority, doc_id) AS rn
      FROM p) WHERE rn <= 25
    """,
)
def llm_sample_weighted(spark, sf_dir):
    """Deterministic weighted sampling: 25 docs per language, keep
    probability proportional to document length — priority sampling
    (Duffield et al., public method): priority = hash-uniform / weight,
    take the k smallest per stratum. The length-weighted draw a
    training-data mix uses when longer documents should be
    proportionally more likely to survive.

    Fully deterministic across engines and retries with NO
    transcendentals: the priority is an exact 32-bit md5 integer
    divided by an exact integer weight — one IEEE-correctly-rounded
    division that both engines compute bit-identically (the A-ES
    u^(1/w) formulation would hinge on two libms' pow/ln ulps). The
    per-stratum top-k is the `topk_group` shape: rank window
    partitioned by the stratum; at 100 TB the standard partial-top-k
    prune (per-partition k smallest before the exchange) applies
    unchanged since priorities need no global state.
    """
    d = load(spark, sf_dir, "documents")
    pri = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        * 1.0
        # GREATEST guard: an empty document (n_chars = 0) must not
        # throw DIVIDE_BY_ZERO under ANSI mode (or NULL-sort apart
        # across engines without it) — weight 1 keeps it deterministic
        / F.greatest(F.col("n_chars"), F.lit(1))
    )
    p = d.select("doc_id", "lang", "n_chars", pri.alias("priority"))
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .drop("rn")
    )


@query(
    "llm_repetition_quality",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word),
    ws AS (
        SELECT doc_id, SUM(n) AS n_words, COUNT(*) AS n_distinct,
               MAX(n) AS top_n
        FROM wc GROUP BY doc_id
    ),
    d2 AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i+1])) AS bg
        FROM d2
    ),
    gc AS (SELECT doc_id, bg, COUNT(*) AS n FROM g GROUP BY doc_id, bg),
    gs AS (
        SELECT doc_id, SUM(n) AS n_bigrams,
               SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS dup_bigrams
        FROM gc GROUP BY doc_id
    )
    SELECT ws.doc_id,
           CAST(ws.n_words AS BIGINT) AS n_words,
           ROUND(1.0 - ws.n_distinct / CAST(ws.n_words AS DOUBLE), 6)
               AS frac_dup_words,
           ROUND(ws.top_n / CAST(ws.n_words AS DOUBLE), 6) AS frac_top_word,
           ROUND(COALESCE(gs.dup_bigrams / CAST(gs.n_bigrams AS DOUBLE), 0.0),
                 6) AS frac_dup_2grams,
           (ws.top_n / CAST(ws.n_words AS DOUBLE)) <= 0.2
               AND COALESCE(gs.dup_bigrams / CAST(gs.n_bigrams AS DOUBLE),
                            0.0) <= 0.6 AS keep
    FROM ws LEFT JOIN gs USING (doc_id)
    """,
)
def llm_repetition_quality(spark, sf_dir):
    """Gopher-style repetition signals per document: duplicate-word
    fraction, most-frequent-word share, and the fraction of bigram
    occurrences whose bigram repeats — the standard boilerplate /
    degenerate-text detectors a training-data pipeline runs alongside
    the length/charset filters (llm_quality_filter).

    Scale shape: every signal is per-document, so nothing ever leaves
    the scan — multiplicity statistics come from equal-run lengths
    over the SORTED token/bigram arrays (longest run = top word count,
    total length of runs > 1 = duplicate-bigram mass, array_distinct =
    distinct words), computed row-side with array kernels. Zero
    exchanges at any scale: the earlier explode → (doc_id, word)
    partial-agg → doc_id reduce → rejoin form shuffled the distinct
    (doc, term) pairs twice and joined the branches back; this one is
    a pure projection riding the ingest scan. Thresholds (`keep`) are
    exact ratio comparisons on the same values, deterministic across
    engines.
    """
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")
    lzero = F.lit(0).cast("long")
    lone = F.lit(1).cast("long")

    def _longest_run(arr):
        # max element multiplicity == longest equal-run once sorted
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            lzero.alias("run"),
            lzero.alias("best"),
        )

        def step(a, w):
            run2 = F.when(a.prev.eqNullSafe(w), a.run + 1).otherwise(lone)
            return F.struct(
                w.alias("prev"),
                run2.alias("run"),
                F.greatest(a.best, run2).alias("best"),
            )

        return F.aggregate(F.sort_array(arr), zero, step, lambda a: a.best)

    def _dup_run_total(arr):
        # Σ multiplicity over elements occurring more than once ==
        # total length of equal-runs longer than 1 (a run reaching 2
        # contributes both members, each further member adds itself)
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            lzero.alias("run"),
            lzero.alias("dup"),
        )

        def step(a, w):
            run2 = F.when(a.prev.eqNullSafe(w), a.run + 1).otherwise(lone)
            inc = (
                F.when(run2 == 2, F.lit(2).cast("long"))
                .when(run2 > 2, lone)
                .otherwise(lzero)
            )
            return F.struct(
                w.alias("prev"),
                run2.alias("run"),
                (a.dup + inc).alias("dup"),
            )

        return F.aggregate(F.sort_array(arr), zero, step, lambda a: a.dup)

    base = d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        _longest_run(words).alias("top_n"),
        F.size(_bigrams_expr(words)).cast("long").alias("n_bigrams"),
        _dup_run_total(_bigrams_expr(words)).alias("dup_bigrams"),
    )

    nw = F.col("n_words").cast("double")
    frac_top = F.col("top_n") / nw
    frac_dup2 = F.when(
        F.col("n_bigrams") > 0,
        F.col("dup_bigrams") / F.col("n_bigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        "n_words",
        F.round(1.0 - F.col("n_distinct") / nw, 6).alias("frac_dup_words"),
        F.round(frac_top, 6).alias("frac_top_word"),
        F.round(frac_dup2, 6).alias("frac_dup_2grams"),
        ((frac_top <= 0.2) & (frac_dup2 <= 0.6)).alias("keep"),
    )


@query(
    "llm_pii_scrub",
    oracle="""
    SELECT event_id,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT)
               AS n_redactions,
           md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS scrubbed_md5
    FROM events
    """,
)
def llm_pii_scrub(spark, sf_dir):
    """PII-style scrubbing with an audit trail: rewrite every digit
    run in the semi-structured payload to a placeholder and emit the
    per-record redaction count plus a checksum of the scrubbed text —
    the pattern a pipeline uses for emails/phones/SSNs (swap the regex
    alternation; the plan is identical). The checksum hash-matches the
    oracle, proving the rewrite itself, not just the counts.

    Scale shape: pure scan-side projection — regexp_count and
    regexp_replace run inside whole-stage codegen, zero shuffles, so
    scrubbing rides the ingest scan for free at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_count("props", F.lit("[0-9]+")).cast("int").alias(
            "n_redactions"
        ),
        F.md5(F.regexp_replace("props", "[0-9]+", "<NUM>")).alias(
            "scrubbed_md5"
        ),
    )


@query(
    "llm_decontaminate",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 5),
                      i -> array_to_string(w[i:i+5], ' '))) AS ngram
        FROM d WHERE len(w) >= 6
    ),
    eval_g AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 11 = 0),
    train_g AS (
        SELECT DISTINCT doc_id, ngram FROM g WHERE doc_id % 11 <> 0
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM train_g t JOIN eval_g e USING (ngram)
    GROUP BY t.doc_id
    """,
)
def llm_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents that share
    any word-6-gram with the held-out evaluation set (here: every
    11th doc stands in for the benchmark). Output is the per-doc
    count of distinct shared 6-grams — the evidence a pipeline logs
    before dropping contaminated rows.

    Scale shape: the eval set is tiny and bounded (benchmarks are KBs
    against a 100 TB corpus), so its distinct n-gram set is BROADCAST
    — the train side never shuffles its exploded n-grams across the
    cluster, it hash-joins them against the broadcast map in place,
    then reduces by doc_id. At larger eval sets, md5 the n-gram on
    both sides to cut the broadcast width (same plan).
    """
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(words) - 6),
        lambda i: F.array_join(F.slice(words, i + 1, 6), " "),
    )
    guarded = F.when(F.size(words) >= 6, ngrams).otherwise(
        F.array().cast("array<string>")
    )
    g = d.select("doc_id", F.explode(guarded).alias("ngram"))
    g = materialize(g)  # both branches derive from the same explode
    eval_g = g.filter(F.col("doc_id") % 11 == 0).select("ngram").distinct()
    train_g = g.filter(F.col("doc_id") % 11 != 0).dropDuplicates(
        ["doc_id", "ngram"]
    )
    return (
        train_g.join(F.broadcast(eval_g), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


@query(
    "llm_mix_balance",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS v
      FROM documents
    ),
    c AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY lang),
    t AS (SELECT COUNT(*) AS total, COUNT(DISTINCT lang) AS nlang FROM d),
    thr AS (
      SELECT lang, (total * 4294967296) // (nlang * n) AS thr
      FROM c CROSS JOIN t
    )
    SELECT doc_id, lang FROM d JOIN thr USING (lang) WHERE v < thr
    """,
)
def llm_mix_balance(spark, sf_dir):
    """Data-driven mixture rebalancing: downsample each language to an
    EQUAL share of the corpus, with keep rates derived from the
    observed distribution rather than hand-tuned constants (the step
    after `llm_sample_stratified` once the real mix is known). An
    underrepresented stratum gets keep-rate > 1 — i.e. keeps
    everything — without any special-casing, because its threshold
    simply exceeds the 32-bit hash range.

    Fully deterministic across engines, runs and retries: the keep
    test is one INTEGER comparison — hash(doc) < (total << 32) div
    (nlang * n_lang) — no float rates, no RNG. The per-language counts
    and the 1-row total ride the plan as broadcast aggregates; the
    keep filter itself is scan-side. Integer headroom: total·2^32 must
    fit BIGINT, i.e. corpora beyond ~2e9 docs shift to a 16-bit hash
    bucket (same math, wider strata granularity).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .alias("v"),
    )
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    t = d.agg(
        F.count("*").alias("total"),
        F.countDistinct("lang").alias("nlang"),
    )
    thr = c.crossJoin(F.broadcast(t)).select(
        "lang", F.expr("(total * 4294967296L) div (nlang * n)").alias("thr")
    )
    return (
        d.join(F.broadcast(thr), "lang")
        .filter(F.col("v") < F.col("thr"))
        .select("doc_id", "lang")
    )


@query(
    "llm_dataset_card",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               sha256(text) AS h
        FROM documents
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts
        FROM base
    ),
    lang_terms AS (
        SELECT CAST(floor(
                   -(COUNT(*) * 1.0 / MAX(tot.n_docs))
                   * LN(COUNT(*) * 1.0 / MAX(tot.n_docs))
                   * 1000000 + 0.5) AS BIGINT) AS term6
        FROM base CROSS JOIN tot
        GROUP BY lang
    ),
    ent AS (SELECT CAST(SUM(term6) AS BIGINT) AS ent6 FROM lang_terms)
    SELECT tot.n_docs, tot.total_tokens, tot.total_chars, tot.n_langs,
           floor(CAST(tot.total_tokens AS DOUBLE) / tot.n_docs * 10000 + 0.5)
               / 10000 AS mean_doc_tokens4,
           CAST(ent.ent6 AS DOUBLE) / 1000000 AS lang_entropy6,
           floor(CAST(tot.n_docs - tot.n_unique_texts AS DOUBLE) / tot.n_docs
                 * 1000000 + 0.5) / 1000000 AS exact_dup_rate6
    FROM tot CROSS JOIN ent
    """,
)
def llm_dataset_card(spark, sf_dir):
    """One-row corpus "dataset card": document/token/char totals,
    language count + Shannon entropy of the language mix, and the
    exact-duplicate rate — the governance summary published alongside
    a training corpus.

    Everything partial-aggregates: the corpus collapses to one global
    row plus one row per language before any cross-term math, so the
    card costs two scans regardless of corpus size (the sha256 NDV is
    the one genuinely distinct-heavy term; its HLL twin is
    ``agg_sketch_hll_merge``'s pattern when exactness can be traded).
    Entropy terms are floor-pinned to scaled BIGINTs per language and
    summed order-independently.
    """
    d = load_spread(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.sha2(F.col("text").cast("binary"), 256).alias("h"),
    )
    tot = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("h").alias("n_unique_texts"),
    )
    p = F.col("n_lang") * 1.0 / F.col("n_docs")
    ent = (
        base.groupBy("lang")
        .agg(F.count("*").alias("n_lang"))
        .join(F.broadcast(tot.select("n_docs")))
        .select(
            F.floor(-p * F.log(p) * 1_000_000 + 0.5)
            .cast("long")
            .alias("term6")
        )
        .agg(F.sum("term6").alias("ent6"))
    )
    return (
        tot.join(F.broadcast(ent))
        .select(
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            (
                F.floor(
                    F.col("total_tokens").cast("double")
                    / F.col("n_docs")
                    * 10_000
                    + 0.5
                )
                / 10_000
            ).alias("mean_doc_tokens4"),
            (F.col("ent6").cast("double") / 1_000_000).alias("lang_entropy6"),
            (
                F.floor(
                    (F.col("n_docs") - F.col("n_unique_texts")).cast("double")
                    / F.col("n_docs")
                    * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("exact_dup_rate6"),
        )
    )


def split_expr():
    """THE train/valid/test assignment — salted md5 bucket of doc_id,
    <80 train / <90 valid / else test — stated ONCE: the leakage
    audit must audit the SAME split llm_split_assign hands out, so a
    threshold or salt tweak can never reach one and miss the other
    (the one pairing where copy-drift is a correctness hazard, not
    just duplication). The oracles restate it in SQL; tests compare
    the two engines' assignments row for row."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/split"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
    )


@query(
    "llm_split_assign",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '/split'),
                                         1, 8))::BIGINT % 100 < 80 THEN 'train'
                    WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '/split'),
                                         1, 8))::BIGINT % 100 < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM assigned GROUP BY split, lang
    """,
)
def llm_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/valid/test assignment by salted
    md5-mod of the document id — every document lands in EXACTLY one
    split (disjoint + complete by construction, proven in pytest), and
    the assignment is stable under retries, re-partitioning, and
    incremental corpus growth (a new doc never moves an old one —
    unlike randomSplit, whose assignment depends on partition layout).

    The '/split' salt decouples this hash-mod from every other
    hash-mod key (sampling, stratification) so the carved subsets are
    statistically independent. Scan-side CASE, zero extra shuffle
    beyond the reporting groupBy.
    """
    d = load_spread(spark, sf_dir, "documents")
    assigned = d.select("doc_id", "lang", split_expr().alias("split"))
    return assigned.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


#: training sequence length for packing (tokens) and shard fan-out.
_PACK_SEQ = 256
_PACK_SHARDS = 16


@query(
    "llm_pack_sequences",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '/pack'), 1, 8))
                   ::BIGINT % {_PACK_SHARDS} AS shard,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    pos AS (
        SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start_tok
        FROM base
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(start_tok // {_PACK_SEQ} AS BIGINT) AS seq_first,
           CAST((start_tok + n_tokens - 1) // {_PACK_SEQ} AS BIGINT)
               AS seq_last,
           CAST(start_tok % {_PACK_SEQ} AS BIGINT) AS offset_in_seq
    FROM pos
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Pretraining sequence packing: documents are concatenated in
    deterministic order within hash-assigned shards, then cut into
    fixed 256-token training sequences — each doc learns which
    sequence(s) it lands in and at what offset (docs may straddle a
    boundary; seq_first/seq_last expose the straddle).

    The GPT-style concat-and-chunk data layout, made distributable:
    the packing unit is a SHARD (salted md5-mod of doc_id), so the
    running-token window partitions on shard — 16-way
    parallel here, thousands-way at 100 TB — and never needs a global
    order. Shard assignment is retry-stable and append-stable for
    existing docs; token offsets within a shard are pure window
    arithmetic over exact integers.
    """
    d = load_spread(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/pack"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _PACK_SHARDS
    )
    base = d.select(
        "doc_id",
        shard.alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    pos = base.withColumn(
        "start_tok",
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.col("n_tokens"),
    )
    return pos.select(
        "doc_id",
        "shard",
        "n_tokens",
        # TRUE integer division (`div`), matching the oracle's `//`:
        # float-divide-then-cast only agreed because 256 is a power
        # of two (exact in binary below 2^53) — a non-power-of-two
        # sequence length or huge shard offsets would shift a doc's
        # sequence assignment off the oracle
        F.expr(f"CAST(start_tok div {_PACK_SEQ} AS BIGINT)").alias(
            "seq_first"
        ),
        F.expr(
            f"CAST((start_tok + n_tokens - 1) div {_PACK_SEQ} AS BIGINT)"
        ).alias("seq_last"),
        (F.col("start_tok") % _PACK_SEQ).alias("offset_in_seq"),
    )


@query(
    "llm_entropy_filter",
    oracle="""
    WITH chars AS (
        SELECT doc_id, n_chars,
               unnest(string_split_regex(text, '')) AS ch
        FROM documents WHERE n_chars > 0
    ),
    freq AS (
        SELECT doc_id, n_chars, ch, COUNT(*) AS n
        FROM chars WHERE ch <> '' GROUP BY doc_id, n_chars, ch
    ),
    terms AS (
        SELECT doc_id, n_chars,
               CAST(floor(-(n * 1.0 / n_chars) * LN(n * 1.0 / n_chars)
                          / LN(2.0) * 1000000 + 0.5) AS BIGINT) AS t6
        FROM freq
    ),
    ent AS (
        SELECT doc_id, MAX(n_chars) AS n_chars,
               CAST(SUM(t6) AS BIGINT) AS ent6
        FROM terms GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(ent6 AS DOUBLE) / 1000000 AS char_entropy_bits6,
           ent6 * 2 >= 3000000 AS keep
    FROM ent
    """,
)
def llm_entropy_filter(spark, sf_dir):
    """Character-level Shannon entropy per document (bits/char) with a
    keep flag at 1.5 bits — the gibberish/binary-blob screen: natural
    text sits ~3.5–4.5 bits, a repeated-character or base64-ish blob
    falls outside, so this one number catches two corpus failure
    modes a word-level filter misses.

    Explode-to-chars multiplies rows ~300×, but partial aggregation
    collapses (doc, char) counts map-side before the one exchange —
    the same shape as wordcount. Entropy terms are floor-pinned
    scaled-BIGINTs summed order-independently, and the keep cut is
    integer-exact (ent6·2 ≥ 3·10⁶).
    """
    d = load_spread(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    chars = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.split("text", "")).alias("ch"),
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "n_chars", "ch").agg(
        F.count("*").alias("n")
    )
    p = F.col("n") * 1.0 / F.col("n_chars")
    terms = freq.select(
        "doc_id",
        "n_chars",
        F.floor(-p * F.log(p) / F.log(F.lit(2.0)) * 1_000_000 + 0.5)
        .cast("long")
        .alias("t6"),
    )
    ent = terms.groupBy("doc_id").agg(
        F.max("n_chars").alias("n_chars"), F.sum("t6").alias("ent6")
    )
    return ent.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.col("ent6").cast("double") / 1_000_000).alias("char_entropy_bits6"),
        (F.col("ent6") * 2 >= 3_000_000).alias("keep"),
    )


@query(
    "llm_leakage_check",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, text,
               CASE WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '/split'),
                                         1, 8))::BIGINT % 100 < 80 THEN 'train'
                    WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '/split'),
                                         1, 8))::BIGINT % 100 < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS train_doc, b.doc_id AS eval_doc, b.split AS eval_split
        FROM assigned a JOIN assigned b
          ON substr(a.text, 1, 40) = substr(b.text, 1, 40)
         AND a.split = 'train' AND b.split <> 'train'
    )
    SELECT eval_split, eval_doc,
           CAST(COUNT(*) AS BIGINT) AS n_train_matches,
           CAST(MIN(train_doc) AS BIGINT) AS example_train_doc
    FROM pairs GROUP BY eval_split, eval_doc
    """,
)
def llm_leakage_check(spark, sf_dir):
    """Cross-split leakage audit: valid/test documents that share a
    near-dup blocking key (40-char normalized prefix) with any TRAIN
    document — the contamination check run before every evaluation,
    composing the engine's split assignment with its dedup blocking.

    Same equi-blocked shape as `llm_neardup_pairs` with a split
    predicate folded into the join, so candidate volume is still
    Σ|block|² — a leakage audit over 100 TB costs no more than the
    dedup pass it reuses. Output is per contaminated eval doc with a
    concrete offending train doc (min id) for triage.
    """
    d = load_spread(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id",
        F.substring("text", 1, 40).alias("pfx"),
        split_expr().alias("split"),
    )
    tr = assigned.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "pfx"
    )
    ev = assigned.filter(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_doc"),
        F.col("split").alias("eval_split"),
        "pfx",
    )
    return (
        tr.join(ev, "pfx")
        .groupBy("eval_split", "eval_doc")
        .agg(
            F.count("*").alias("n_train_matches"),
            F.min("train_doc").alias("example_train_doc"),
        )
    )


def _bpe_oracle(rounds: int) -> str:
    """Generate the round-unrolled DuckDB oracle for llm_bpe_learn."""
    parts = [
        """
    WITH w AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word
    ),
    s0 AS (
        SELECT word, n,
               ' ' || array_to_string(
                   list_filter(string_split_regex(word, ''), c -> c <> ''),
                   ' ') AS seq
        FROM w
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(f"""
    a{r} AS (
        SELECT word, n, string_split(substr(seq, 2), ' ') AS arr FROM {prev}
    ),
    p{r} AS (
        SELECT pr.pa AS pa, pr.pb AS pb, CAST(SUM(n) AS BIGINT) AS cnt
        FROM (
            SELECT n, unnest(list_transform(
                generate_series(1, len(arr) - 1),
                i -> struct_pack(pa := arr[i], pb := arr[i + 1]))) AS pr
            FROM a{r}
        ) GROUP BY pr.pa, pr.pb
    ),
    b{r} AS (SELECT pa, pb, cnt FROM p{r} ORDER BY cnt DESC, pa, pb LIMIT 1),
    s{r} AS (
        SELECT word, n,
               list_reduce(
                   list_prepend(' ' || arr[1], list_slice(arr, 2, len(arr))),
                   (acc, c) -> CASE WHEN ends_with(acc, ' ' || b.pa)
                                     AND c = b.pb
                               THEN acc || c ELSE acc || ' ' || c END) AS seq
        FROM a{r} CROSS JOIN b{r} b
    )""")
    selects = [
        f"SELECT {r} AS round, pa AS merge_left, pb AS merge_right,"
        f" pa || pb AS merged, cnt FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return ",".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


_BPE_ROUNDS = 3


@query("llm_bpe_learn", oracle=_bpe_oracle(_BPE_ROUNDS))
def llm_bpe_learn(spark, sf_dir):
    """Distributed BPE vocabulary learning: 3 merge rounds over the
    corpus word distribution — each round counts adjacent symbol pairs
    (weighted by word frequency), adopts the most frequent pair as a
    new token, and re-segments every word with a greedy left-to-right
    merge. The tokenizer-training step of an LLM data pipeline, run
    where the data lives.

    Scale shape per round: pair counting partial-aggregates over the
    VOCABULARY table (corpus text is touched once, to build word
    counts — at 100 TB the vocab is millions of rows, not billions),
    the winning pair is a 1-row broadcast, and re-segmentation is a
    shuffle-free projection (a string left-fold identical in both
    engines, so greedy-merge semantics — 'xxx' → 'xx x' — are
    bit-reproducible). Rounds are driver-unrolled: k rounds = k tiny
    aggregates, no iterative state beyond the loop counter.
    """
    _state, out = _bpe_run(spark, sf_dir)
    return out


def _bpe_run(spark, sf_dir):
    """Run the BPE merge loop; returns (final vocab segmentation,
    merge-ledger DataFrame) — shared by the learn and apply keys."""
    d = load_spread(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    chars = F.split("word", "")
    # materialize: the vocabulary state table is consumed by EVERY
    # round's pair aggregate AND the final segmentation (4 consumers in
    # the apply key) — uncached, each consumer re-runs the corpus-sized
    # explode + word groupBy from scratch (r13 profile: the word-count
    # exchange executed once per round). The cache holds only the
    # DISTINCT-word table ("millions of rows, not billions" at 100 TB —
    # exactly the intermediate a real tokenizer trainer keeps resident);
    # per-round folds over it are cheap to recompute, so only the base
    # is pinned.
    state = materialize(
        w.select(
            "word",
            "n",
            F.concat(F.lit(" "), F.array_join(chars, " ")).alias("seq"),
        )
    )
    out = None
    for r in range(1, _BPE_ROUNDS + 1):
        arr = F.split(F.expr("substring(seq, 2)"), " ")
        pair_structs = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.struct(
                    F.element_at(arr, i).alias("pa"),
                    F.element_at(arr, i + 1).alias("pb"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pa:string,pb:string>>"))
        best = (
            state.select("n", F.explode(pair_structs).alias("pr"))
            .groupBy(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pa", "pb")
            .limit(1)
        )
        best = materialize(best)
        row = best.select(
            F.lit(r).alias("round"),
            F.col("pa").alias("merge_left"),
            F.col("pb").alias("merge_right"),
            F.concat("pa", "pb").alias("merged"),
            "cnt",
        )
        out = row if out is None else out.unionAll(row)
        merged_seq = F.aggregate(
            F.slice(arr, 2, F.size(arr) - 1),
            F.concat(F.lit(" "), F.element_at(arr, 1)),
            lambda acc, c: F.when(
                acc.endswith(F.concat(F.lit(" "), F.col("pa")))
                & (c == F.col("pb")),
                F.concat(acc, c),
            ).otherwise(F.concat(acc, F.lit(" "), c)),
        )
        state = state.join(F.broadcast(best)).select(
            "word", "n", merged_seq.alias("seq")
        )
    return state, out


def _bpe_apply_oracle(rounds: int) -> str:
    """Oracle for llm_tokenize_apply: the learn CTEs + per-doc token
    accounting against the final segmentation."""
    body = _bpe_oracle(rounds)
    # reuse the learn oracle's CTE prefix (WITH ... s{rounds}); strip
    # its UNION ALL output selects and continue the CTE list
    ctes = body.split("\nUNION ALL\n")[0]
    ctes = ctes[: ctes.rindex("SELECT 1 AS round")].rstrip()
    return f"""{ctes}
    ,
    vocab AS (
        SELECT word, CAST(len(string_split(substr(seq, 2), ' ')) AS BIGINT)
                   AS n_tok
        FROM s{rounds}
    ),
    docw AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(LENGTH(word)) AS BIGINT) AS n_chars,
           CAST(SUM(v.n_tok) AS BIGINT) AS n_tokens,
           floor(CAST(SUM(LENGTH(word)) AS DOUBLE) / SUM(v.n_tok) * 10000
                 + 0.5) / 10000 AS chars_per_token4
    FROM docw JOIN vocab v USING (word)
    WHERE word <> ''
    GROUP BY doc_id
    """


@query("llm_tokenize_apply", oracle=_bpe_apply_oracle(_BPE_ROUNDS))
def llm_tokenize_apply(spark, sf_dir):
    """Tokenizer APPLY: segment every document with the merges
    ``llm_bpe_learn`` just learned and account tokens per document —
    the inference half of the tokenizer loop, the pass that actually
    runs over 100 TB.

    The scale trick: segmentation is computed once per DISTINCT
    vocabulary word (the BPE state table), and documents join their
    exploded words against that vocab — the corpus-sized side does one
    hash join on a vocabulary-sized build side and a per-doc reduce;
    no document's text is ever re-folded. chars/token is the budget
    number a context-window planner consumes.
    """
    state, _out = _bpe_run(spark, sf_dir)
    vocab = state.select(
        "word",
        F.size(F.split(F.expr("substring(seq, 2)"), " "))
        .cast("long")
        .alias("n_tok"),
    )
    d = load_spread(spark, sf_dir, "documents")
    docw = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        docw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_tok").alias("n_tokens"),
            (
                F.floor(
                    F.sum(F.length("word")).cast("double")
                    / F.sum("n_tok")
                    * 10_000
                    + 0.5
                )
                / 10_000
            ).alias("chars_per_token4"),
        )
    )


@query(
    "llm_quality_gopher",
    oracle=f"""
    WITH feats AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> regexp_matches(x, '^[a-z]+$'))) AS BIGINT)
                   AS n_alpha,
               CAST(list_sum(list_transform(string_split(text, ' '),
                        x -> length(x))) AS BIGINT) AS sum_len,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS n_distinct,
               CAST(len(list_distinct(list_filter(string_split(text, ' '),
                        x -> list_contains({list(STOPWORDS)}, x))))
                   AS BIGINT) AS n_stop_distinct
        FROM documents
    )
    SELECT lang,
           CASE WHEN n_words NOT BETWEEN 40 AND 1000 THEN 'words'
                WHEN sum_len < 4 * n_words
                     OR sum_len > 10 * n_words THEN 'mean_len'
                WHEN n_alpha * 5 < n_words * 4 THEN 'alpha'
                WHEN n_stop_distinct < 1 THEN 'stop'
                WHEN n_distinct * 10 <= n_words * 3 THEN 'uniq'
                ELSE 'pass' END AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM feats
    GROUP BY 1, 2
    """,
)
def llm_quality_gopher(spark, sf_dir):
    """Gopher-style rule-funnel report (Rae et al. 2021, Table A1
    shape): each document is tested against an ORDERED cascade of
    quality rules — word-count bounds, mean-word-length band, alphabetic
    word fraction, minimum distinct stopwords, lexical diversity — and
    attributed to the FIRST rule it fails ('pass' if none), then the
    funnel is aggregated per (lang, rule). This is the report corpus
    curators actually read: not "which docs survive" (llm_quality_filter)
    but "which rule removes how much, per language".

    Every comparison is integer-exact (sum_len·1 vs k·n_words etc.), so
    rule attribution can never flip on a floating-point ulp cross-engine.
    Scale shape: scan-side codegen feature extraction + one partial-
    aggregated groupBy on a (lang, rule) key space of ≤ 6·|langs| —
    the shuffle is constant-width regardless of corpus size.
    """
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = d.select(
        "lang",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda x: x.rlike("^[a-z]+$")))
        .cast("long")
        .alias("n_alpha"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.size(
            F.array_distinct(
                F.filter(words, lambda x: F.array_contains(stop_arr, x))
            )
        )
        .cast("long")
        .alias("n_stop_distinct"),
    )
    nw = F.col("n_words")
    rule = (
        F.when(~nw.between(40, 1000), "words")
        .when(
            (F.col("sum_len") < 4 * nw) | (F.col("sum_len") > 10 * nw),
            "mean_len",
        )
        .when(F.col("n_alpha") * 5 < nw * 4, "alpha")
        .when(F.col("n_stop_distinct") < 1, "stop")
        .when(F.col("n_distinct") * 10 <= nw * 3, "uniq")
        .otherwise("pass")
    )
    return (
        feats.withColumn("rule", rule)
        .groupBy("lang", "rule")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
    )


@query(
    "llm_vocab_coverage",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    vocab AS (
        SELECT word FROM toks
        GROUP BY word
        ORDER BY COUNT(*) DESC, word
        LIMIT 20
    )
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.lang
    """,
)
def llm_vocab_coverage(spark, sf_dir):
    """Tokenizer-vocabulary coverage report: learn a frequency-ranked
    top-K vocabulary from the corpus (deterministic tie-break on the
    word itself), then measure per-language token coverage and OOV
    rate against it — the report that decides whether a tokenizer's
    vocab budget fits a corpus before training starts.

    Scale shape: the vocab is a TakeOrderedAndProject (per-partition
    top-K, no single-partition window, K rows to the driver) broadcast
    back against the token stream — the coverage join is map-side, and
    the per-lang aggregate is partial-combined. n_tokens/n_oov are
    exact BIGINTs; oov_rate is a single IEEE division of small ints
    (safe to ROUND cross-engine per the registry convention).
    """
    toks = (
        load_spread(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("word"))
    )
    vocab = (
        toks.groupBy("word")
        .count()
        .orderBy(F.col("count").desc(), "word")
        .limit(20)
        .select("word")
    )
    oov = F.when(F.col("v_word").isNull(), 1).otherwise(0)
    return (
        toks.join(
            F.broadcast(vocab.withColumnRenamed("word", "v_word")),
            toks["word"] == F.col("v_word"),
            "left",
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.round(
                F.sum(oov).cast("double") / F.count("*"), 6
            ).alias("oov_rate"),
        )
    )


@query(
    "llm_robots_filter",
    oracle="""
    WITH hosts AS (
        SELECT DISTINCT lower(replace(c_mktsegment, ' ', ''))
               || '.example.com' AS host
        FROM customer
    ),
    rules AS (
        SELECT host, '/' AS rule_prefix, 'allow' AS decision FROM hosts
        UNION ALL
        SELECT host, '/cust/', 'disallow' FROM hosts
        UNION ALL
        SELECT host, '/cust/' || d,
               CASE WHEN (d + length(host)) % 2 = 0
                    THEN 'allow' ELSE 'disallow' END
        FROM hosts, (SELECT unnest(range(0, 5)) AS d)
    ),
    urls AS (
        SELECT c_custkey,
               lower(replace(c_mktsegment, ' ', '')) || '.example.com'
                   AS host,
               '/cust/' || c_custkey AS path
        FROM customer
    ),
    matched AS (
        SELECT u.c_custkey, u.host, u.path, r.rule_prefix, r.decision,
               row_number() OVER (
                   PARTITION BY u.c_custkey
                   ORDER BY length(r.rule_prefix) DESC, r.decision
               ) AS rn
        FROM urls u JOIN rules r
          ON u.host = r.host
         AND substr(u.path, 1, length(r.rule_prefix)) = r.rule_prefix
    )
    SELECT c_custkey, 'https://' || host || path AS url,
           rule_prefix, decision
    FROM matched WHERE rn = 1
    """,
)
def llm_robots_filter(spark, sf_dir):
    """robots.txt politeness gate — the crawl-pipeline step between
    CDX lookup and fetch: every URL is matched against its host's rule
    set with REAL robots semantics (RFC 9309): the LONGEST matching
    path prefix decides, allow wins a length tie. The rule table is
    synthesized deterministically from the fixture (per-host disallow
    of '/cust/' with digit-carve-out allows, so '/cust/3' genuinely
    prefix-matches '/cust/35' — the aliasing that makes longest-match
    order matter).

    Scale shape: rule sets are tiny per host (real robots.txt is KBs)
    → broadcast join against the URL stream; the winner-pick is a
    row_number window over ≤|rules| candidate rows per URL, partitioned
    by the URL key — no global ordering, no skew (rules fan out
    per-host but match per-URL).
    """
    c = load_spread(spark, sf_dir, "customer")
    host = F.concat(
        F.lower(F.regexp_replace("c_mktsegment", " ", "")),
        F.lit(".example.com"),
    )
    hosts = c.select(host.alias("host")).distinct()
    base = hosts.select("host", F.lit("/").alias("rule_prefix"),
                        F.lit("allow").alias("decision"))
    block = hosts.select("host", F.lit("/cust/").alias("rule_prefix"),
                         F.lit("disallow").alias("decision"))
    carve = (
        hosts.select("host", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("d"))
        .select(
            "host",
            F.concat(F.lit("/cust/"), F.col("d")).alias("rule_prefix"),
            F.when((F.col("d") + F.length("host")) % 2 == 0, "allow")
            .otherwise("disallow")
            .alias("decision"),
        )
    )
    rules = base.unionByName(block).unionByName(carve)
    urls = c.select(
        "c_custkey",
        host.alias("host"),
        F.concat(F.lit("/cust/"), F.col("c_custkey")).alias("path"),
    )
    cand = urls.join(F.broadcast(rules), "host").filter(
        F.col("path").startswith(F.col("rule_prefix"))
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.length("rule_prefix").desc(), "decision"
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.concat(F.lit("https://"), "host", "path").alias("url"),
            "rule_prefix",
            "decision",
        )
    )


def _ccnet_scored(spark, sf_dir):
    """Shared narrow score frame for the CCNet keys: one row per doc
    with its language and the add-one unigram logprob proxy (per-token
    1e-6 integer units summed order-free, then ONE IEEE division — the
    declared-safe float op). Both the NTILE anchor and the threshold
    twin rank on exactly this frame, so they cannot drift."""
    d = load_spread(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    # NOTE (r13): a (doc, word)-count pre-aggregation before the vocab
    # join — cached and uncached — was measured at 1.1-1.7x on BOTH
    # ccnet keys across repeated same-box A/Bs (the explode + map-side
    # partial agg lineages below are cheaper to recompute than the
    # extra (doc_id, word) exchange + cache costs at report scale);
    # reverted to the three shared-scan lineages. Do not re-try blind.
    cnt = w.groupBy("word").agg(F.count("*").alias("n"))
    tot = w.agg(F.count("*").alias("n_total"))
    v = cnt.agg(F.count("*").alias("n_vocab"))
    lp_units = F.floor(
        F.log((F.col("n") + 1.0) / (F.col("n_total") + F.col("n_vocab")))
        * 1_000_000 + 0.5
    ).cast("long")
    # The word-count join side grows with corpus vocabulary — never
    # broadcast it (a forced broadcast of a corpus-scaling build side is
    # the exact class the 2 GiB memory rehearsal killed in
    # llm_substring_dedup_hashed); pin sort-merge so it spills instead.
    # Only the 1-row tot/v aggregates stay broadcast.
    scored = (
        w.join(cnt.hint("merge"), "word")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum(lp_units).alias("sum_units"),
            F.count("*").alias("n_tokens"),
        )
    )
    return scored.join(d.select("doc_id", "lang"), "doc_id").selectExpr(
        "doc_id",
        "lang",
        "CAST(sum_units AS DOUBLE) / n_tokens AS score",
    )


_CCNET_ORACLE = """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    cnt AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
    tot AS (SELECT COUNT(*) AS n_total FROM w),
    v AS (SELECT COUNT(*) AS n_vocab FROM cnt),
    scored AS (
        SELECT w.doc_id,
               CAST(SUM(CAST(floor(
                   LN((cnt.n + 1.0) / (tot.n_total + v.n_vocab))
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_units,
               COUNT(*) AS n_tokens
        FROM w JOIN cnt USING (word) CROSS JOIN tot CROSS JOIN v
        GROUP BY w.doc_id
    )
    SELECT s.doc_id, d.lang,
           CASE ntile(3) OVER (
               PARTITION BY d.lang
               ORDER BY CAST(s.sum_units AS DOUBLE) / s.n_tokens DESC,
                        s.doc_id)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scored s JOIN documents d USING (doc_id)
    """


@query("llm_ccnet_buckets", oracle=_CCNET_ORACLE)
def llm_ccnet_buckets(spark, sf_dir):
    """CCNet-style quality bucketing (Wenzek et al. 2020): rank every
    document within its language by LM score (the add-one unigram
    logprob proxy, pinned to 1e-6 integer units per token before the
    per-doc mean) and split into head/middle/tail terciles — the
    partition CCNet feeds to downstream sampling (train mostly on
    head, audit tail).

    Determinism: per-doc scores are integer-unit sums (order-free);
    the tercile order is (single-IEEE-division mean DESC, doc_id), so
    rank and bucket can never flip on summation order or an ulp tie.
    Scale: the per-lang NTILE is an exact global sort per language —
    right at report sizes; the registered 100 TB form is
    ``llm_ccnet_thresholds`` (exact rank statistics via bounded-bin
    distributed selection, broadcast, applied scan-side), which
    equality-matches this anchor's terciles.
    """
    narrow = _ccnet_scored(spark, sf_dir)
    win = Window.partitionBy("lang").orderBy(F.col("score").desc(), "doc_id")
    buck = F.ntile(3).over(win)
    return narrow.select(
        "doc_id",
        "lang",
        F.when(buck == 1, "head")
        .when(buck == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@query("llm_ccnet_thresholds", oracle=_CCNET_ORACLE)
def llm_ccnet_thresholds(spark, sf_dir):
    """The CCNet tercile split in its 100 TB form — per-lang score
    THRESHOLDS computed once and broadcast, buckets assigned scan-side
    — replacing the anchor's per-lang NTILE (a full per-language
    global sort of every document) with exact distributed selection:

    1. quantize each doc's score to a 1e-6 integer bin (monotone, so
       bin order == score order); histogram per (lang, bin). The
       histogram is bounded by the SCORE RANGE (~25M bins worst case),
       not the corpus — at 100 TB the sort that remains is over bins,
       not documents.
    2. running bin totals per lang locate the two NTILE boundary ranks
       k1/k2 (exact ⌈n/3⌉-style group sizes, matching NTILE's split of
       uneven groups) in their boundary bins.
    3. a refinement pass ranks ONLY the boundary bins' docs by the
       exact composite order (score DESC, doc_id) to pull the boundary
       doc's (score, doc_id) — the composite threshold, so boundary
       TIES resolve exactly as the anchor's window does.
    4. the per-lang (s1,d1,s2,d2) thresholds broadcast back onto the
       narrow score frame; bucket assignment is a scan-side CASE.

    Result EQUALS ``llm_ccnet_buckets`` row-for-row (same oracle, and
    an equality pytest incl. a constructed boundary-tie corpus); the
    documents table itself never passes through a ranking shuffle.
    """
    narrow = materialize(_ccnet_scored(spark, sf_dir))
    binned = narrow.selectExpr(
        "doc_id", "lang", "score",
        "CAST(floor(score * 1000000) AS BIGINT) AS q",
    )
    hist = binned.groupBy("lang", "q").agg(F.count("*").alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(Window.partitionBy("lang").orderBy(F.col("q").desc())),
    )
    # NTILE(3) group sizes for n rows: floor(n/3) + (1 if i <= n%3);
    # boundary ranks are the last rank of groups 1 and 2
    ks = hist.groupBy("lang").agg(F.sum("c").alias("n")).selectExpr(
        "lang",
        "n div 3 + least(n % 3, 1) AS k1",
        "2 * (n div 3) + least(n % 3, 2) AS k2",
    )
    cb = cum.join(F.broadcast(ks), "lang")
    sel = None
    for i in (1, 2):
        s = cb.filter(f"cum >= k{i} AND cum - c < k{i}").selectExpr(
            "lang", "q", f"k{i} - (cum - c) AS slot", f"{i} AS b"
        )
        sel = s if sel is None else sel.unionByName(s)
    wq = Window.partitionBy("lang", "q", "b").orderBy(
        F.col("score").desc(), "doc_id"
    )
    thr = (
        binned.join(F.broadcast(sel), ["lang", "q"])
        .withColumn("rn", F.row_number().over(wq))
        .filter("rn = slot")
        .groupBy("lang")
        .agg(
            F.max(F.when(F.col("b") == 1, F.col("score"))).alias("s1"),
            F.max(F.when(F.col("b") == 1, F.col("doc_id"))).alias("d1"),
            F.max(F.when(F.col("b") == 2, F.col("score"))).alias("s2"),
            F.max(F.when(F.col("b") == 2, F.col("doc_id"))).alias("d2"),
        )
    )
    return narrow.join(F.broadcast(thr), "lang").selectExpr(
        "doc_id",
        "lang",
        "CASE WHEN score > s1 OR (score = s1 AND doc_id <= d1) THEN 'head'"
        " WHEN score > s2 OR (score = s2 AND doc_id <= d2) THEN 'middle'"
        " ELSE 'tail' END AS bucket",
    )


@query(
    "llm_classifier_hash",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    f AS (
        SELECT doc_id, lang,
               list_concat(
                   w,
                   CASE WHEN len(w) >= 2 THEN
                       list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1])
                   ELSE CAST([] AS VARCHAR[]) END
               ) AS feats
        FROM d
    ),
    s AS (
        SELECT doc_id, lang, CAST(len(feats) AS BIGINT) AS n_features,
               CAST(list_sum(list_transform(feats, t ->
                   ((('0x' || substr(md5(t), 1, 8))::BIGINT % 4096)
                    * 2654435761) % 2147483648 % 2001 - 1000
               )) - 50 AS BIGINT) AS score
        FROM f
    )
    SELECT doc_id, lang, n_features, score,
           CASE WHEN score > 0 THEN 'keep' ELSE 'drop' END AS label
    FROM s
    """,
)
def llm_classifier_hash(spark, sf_dir):
    """Hashing-trick linear classifier inference — the shape quality
    classifiers (fastText / Vowpal-Wabbit style) actually run at over
    a 100 TB corpus: every document's unigram+bigram features hash
    into a fixed bucket space, each bucket contributes a learned
    weight, and the document's score is the weight sum plus a bias —
    label = sign. Here the per-bucket weight is a deterministic
    integer mix of the bucket id (a distilled stand-in for a trained
    table; swapping in real weights is an `element_at` on a broadcast
    4096-entry map literal with the IDENTICAL plan), so both engines
    score bit-exactly in pure integer arithmetic.

    Scale shape: the whole operator is ONE projection — tokenize,
    hash, fold, threshold all inside whole-stage codegen; zero
    shuffles, zero Python, zero joins (tests pin the exchange-free
    plan). That is the defining property of classifier screening at
    corpus scale: it rides the ingest scan for free, unlike any
    formulation that explodes features through a groupBy.
    """
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")

    def bucket(t):
        return (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % 4096
        )

    def weight(b):
        return (b * F.lit(2654435761)) % 2147483648 % 2001 - 1000

    feats = F.concat(words, _bigrams_expr(words))
    score = (
        F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda acc, t: acc + weight(bucket(t)),
        )
        - 50
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(feats).cast("long").alias("n_features"),
        score.alias("score"),
        F.when(score > 0, F.lit("keep")).otherwise(F.lit("drop")).alias(
            "label"
        ),
    )


_VIT_K = 150        # vocab pieces (lengths 2..4), top-K by span count
_VIT_MAXLEN = 20    # DP word-length cap (longer words are truncated
                    # out of the inventory — the SentencePiece
                    # max-sentencepiece-length analogue)

#: the DP best-candidate expression, shared by both Viterbi oracles
def _vit_ctes() -> str:
    best = (
        "list_sort(list_transform(byp[i + 1].cands, c -> {"
        "'k': [dps[c.j + 1].s + c.sc, -(dps[c.j + 1].n + 1), -c.j],"
        " 'bj': c.j}))[-1]"
    )
    return f"""
    WITH RECURSIVE dw AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    w AS (
        SELECT word FROM dw
        WHERE word <> '' AND length(word) <= {_VIT_MAXLEN}
    ),
    sp AS (
        SELECT substr(word, i, l) AS piece
        FROM w, unnest(generate_series(2, 4)) g(l),
             unnest(generate_series(1, length(word) - l + 1)) h(i)
    ),
    vocab AS (
        SELECT piece, CAST(COUNT(*) AS BIGINT) AS score
        FROM sp GROUP BY piece
        ORDER BY score DESC, piece LIMIT {_VIT_K}
    ),
    spans AS (
        SELECT word, i - 1 AS j, i AS p, CAST(1 AS BIGINT) AS sc
        FROM w, unnest(generate_series(1, length(word))) h(i)
        UNION ALL
        SELECT w.word, i - 1, i - 1 + l, v.score
        FROM w, unnest(generate_series(2, 4)) g(l),
             unnest(generate_series(1, length(word) - l + 1)) h(i),
             vocab v
        WHERE v.piece = substr(w.word, i, l)
    ),
    spl AS (
        SELECT word, p,
               list_sort(list({{'j': j, 'sc': sc}})) AS cands
        FROM spans GROUP BY word, p
    ),
    spw AS (
        SELECT word, list_sort(list({{'p': p, 'cands': cands}})) AS byp
        FROM spl GROUP BY word
    ),
    dp AS (
        SELECT word, 0 AS i,
               [{{'s': CAST(0 AS BIGINT), 'n': CAST(0 AS BIGINT),
                  'bj': -1}}] AS dps,
               byp
        FROM spw
        UNION ALL
        SELECT word, i + 1,
               list_append(dps, {{
                   's': {best}.k[1],
                   'n': -{best}.k[2],
                   'bj': {best}.bj}}),
               byp
        FROM dp WHERE i < length(word)
    ),
    fin AS (SELECT word, dps FROM dp WHERE i = length(word)),
    walk AS (
        SELECT word, length(word) AS pos, CAST('' AS VARCHAR) AS seg,
               dps
        FROM fin
        UNION ALL
        SELECT word, dps[pos + 1].bj,
               substr(word, dps[pos + 1].bj + 1, pos - dps[pos + 1].bj)
                 || CASE WHEN seg = '' THEN '' ELSE ' ' END || seg,
               dps
        FROM walk WHERE pos > 0
    ),
    wout AS (SELECT word, seg FROM walk WHERE pos = 0)
    """


def _vit_oracle() -> str:
    return _vit_ctes() + """
    SELECT f.word,
           CAST(f.dps[length(f.word) + 1].n AS BIGINT) AS n_tokens,
           CAST(f.dps[length(f.word) + 1].s AS BIGINT) AS total_score,
           o.seg AS segmentation
    FROM fin f JOIN wout o USING (word)
    """


def _vit_words(spark, sf_dir):
    """Distinct DP-eligible words (shared by both Viterbi keys)."""
    d = load_spread(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(
            (F.col("word") != "")
            & (F.length("word") <= _VIT_MAXLEN)
        )
        .distinct()
    )
    return materialize(words)


def _vit_vocab(words):
    """Top-K substring inventory with span-count scores; bounded
    driver collect (K rows). Guarded position sequence: for words
    shorter than l, sequence(1, len-l+1) would run DESCENDING (the
    _bigrams_expr pitfall) and mint junk pieces that shift the top-K
    boundary."""
    spans = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.lit(4)),
                    lambda l: F.when(
                        F.length("word") >= l,
                        F.transform(
                            F.sequence(
                                F.lit(1), F.length("word") - l + 1
                            ),
                            lambda i: F.col("word").substr(i, l),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        ).alias("piece")
    )
    top = (
        spans.groupBy("piece")
        .agg(F.count("*").alias("score"))
        .orderBy(F.col("score").desc(), "piece")
        .limit(_VIT_K)
        .collect()
    )
    return {r.piece: r.score for r in top}


def _vit_segment(spark, words, vocab):
    """Exact Viterbi segmentation of each word under ``vocab`` via
    Arrow-batched workers; key = (score, fewer tokens, longest last
    piece) — totally ordered, unique optimum."""
    from typing import Iterator

    import pandas as pd

    bc = spark.sparkContext.broadcast(vocab)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        V = bc.value

        def seg(word: str):
            L = len(word)
            dp = [(0, 0, -1)]
            for p in range(1, L + 1):
                best_key, best_j = None, -1
                for piece_len in range(1, 5):
                    j = p - piece_len
                    if j < 0:
                        break
                    if piece_len == 1:
                        sc = 1
                    else:
                        sc = V.get(word[j:p])
                        if sc is None:
                            continue
                    s, n, _ = dp[j]
                    key = (s + sc, -(n + 1), -j)
                    if best_key is None or key > best_key:
                        best_key, best_j = key, j
                dp.append((best_key[0], -best_key[1], best_j))
            pieces, pos = [], L
            while pos > 0:
                j = dp[pos][2]
                pieces.append(word[j:pos])
                pos = j
            return dp[L][0], dp[L][1], " ".join(reversed(pieces))

        for pdf in batches:
            out = {
                "word": [], "n_tokens": [], "total_score": [],
                "segmentation": [],
            }
            for word in pdf["word"]:
                sc, n, segm = seg(word)
                out["word"].append(word)
                out["n_tokens"].append(n)
                out["total_score"].append(sc)
                out["segmentation"].append(segm)
            yield pd.DataFrame(out)

    return words.mapInPandas(
        run,
        schema=(
            "word string, n_tokens long, total_score long,"
            " segmentation string"
        ),
    )


@query("llm_tokenize_viterbi", oracle=_vit_oracle())
def llm_tokenize_viterbi(spark, sf_dir):
    """Unigram-LM tokenizer inference — exact Viterbi segmentation,
    the OTHER mainstream subword algorithm next to `llm_bpe_learn`/
    `llm_tokenize_apply` (SentencePiece's unigram mode runs exactly
    this DP at inference). Piece inventory: the top-{K} substrings of
    length 2–4 by span count over the DISTINCT word list (integer
    scores — production swaps in trained log-probs scaled to ints;
    the DP is unchanged), plus every single character at score 1 so
    any word is segmentable. Per word the DP maximizes
    (total score, then fewer tokens, then longest-last-piece) — a
    totally ordered key, so the optimum is unique and both engines
    must reproduce THE SAME segmentation string, not just its cost.

    The oracle is a fully independent SQL implementation: the span
    inventory + vocab via lateral unnests, the forward DP as a
    recursive CTE carrying the dp vector as a LIST (best candidate =
    lexicographic max over a per-position candidate list), and the
    walkback as a second recursion reading the committed back-
    pointers. Hash equality therefore pins every tie-break in the
    dynamic program cross-engine.

    Scale shape: the DP runs once per DISTINCT word (vocabulary-
    bounded, Heaps-law sublinear in corpus size), never per token —
    documents would join the result exactly like `llm_tokenize_apply`
    joins the BPE state table. The vocab is a bounded driver collect
    ({K} rows) broadcast to Arrow-batched workers; per-word state is
    O(word length).
    """.replace("{K}", str(_VIT_K))
    words = _vit_words(spark, sf_dir)
    return _vit_segment(spark, words, _vit_vocab(words))


@query(
    "llm_unigram_learn",
    oracle=_vit_ctes() + """
    , usage AS (
        SELECT piece, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(seg, ' ')) AS piece FROM wout)
        WHERE length(piece) >= 2
        GROUP BY piece
    )
    SELECT v.piece, v.score AS old_score,
           CAST(COALESCE(u.c, 0) AS BIGINT) AS new_score,
           CAST(u.c IS NOT NULL AS BIGINT) AS kept
    FROM vocab v LEFT JOIN usage u USING (piece)
    """,
)
def llm_unigram_learn(spark, sf_dir):
    """One hard-EM round of unigram-LM vocabulary learning — the
    SentencePiece training loop's core step on top of the
    `llm_tokenize_viterbi` machinery: segment every distinct word
    under the current inventory (E-step, Viterbi hard assignment),
    recount each multi-char piece's ACTUAL usage in the optimal
    segmentations (M-step), and mark for pruning every piece the
    optimizer never chose (`kept` = 0) — raw span frequency
    overstates a piece's worth whenever a higher-scoring overlap
    always wins, and this round is precisely how the training loop
    discovers that. Output: (piece, old span-count score, new usage
    score, kept) for the full inventory.

    The oracle replays the identical E-step through the shared DP
    CTE chain (`_vit_ctes` — one definition, so the two keys'
    segmentations cannot drift) and recounts usage from the walkback
    strings in SQL.

    Scale shape: E-step cost is per DISTINCT word (the viterbi key's
    contract); the M-step is a piece-bounded groupBy (≤ K + chars
    groups); the join is vocab-sized. Production iterates this round
    to a target vocab size — each iteration is this exact plan.
    """
    words = _vit_words(spark, sf_dir)
    vocab = _vit_vocab(words)
    segs = _vit_segment(spark, words, vocab)
    usage = (
        segs.select(
            F.explode(F.split("segmentation", " ")).alias("piece")
        )
        .filter(F.length("piece") >= 2)
        .groupBy("piece")
        .agg(F.count("*").alias("c"))
    )
    vdf = local_rows_df(
        spark, sorted(vocab.items()), "piece string, score long"
    )
    return (
        vdf.join(usage, "piece", "left")
        .select(
            "piece",
            F.col("score").alias("old_score"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias(
                "new_score"
            ),
            F.col("c").isNotNull().cast("long").alias("kept"),
        )
    )


def _bfd_oracle() -> str:
    """Best-fit-decreasing oracle: per shard, a recursive CTE steps
    the size-sorted docs carrying (bin loads, assignments) as lists;
    the chosen bin is the fullest that still fits (tie: lowest bin
    index), else a new bin opens."""
    n = "docs[i + 1].n"
    cand = (
        f"list_sort(list_filter(list_transform("
        f"generate_series(1, len(loads)),"
        f" ix -> {{'l': loads[ix], 'negix': -ix}}),"
        f" x -> x.l + {n} <= {_PACK_SEQ}))"
    )
    best = f"{cand}[-1]"
    return f"""
    WITH RECURSIVE base AS (
        SELECT doc_id,
               ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '/pack'),
                               1, 8))::BIGINT % {_PACK_SHARDS} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    ),
    ord AS (
        SELECT shard,
               list_sort(list({{'rk': [-n, doc_id], 'doc_id': doc_id,
                                'n': n}})) AS docs
        FROM base GROUP BY shard
    ),
    rec(shard, i, docs, loads, asg) AS (
        SELECT shard, 0, docs, CAST([] AS BIGINT[]),
               CAST([] AS STRUCT(doc_id BIGINT, bin BIGINT)[])
        FROM ord
        UNION ALL
        SELECT shard, i + 1, docs,
               CASE WHEN len({cand}) = 0
                    THEN list_append(loads, {n})
                    ELSE list_transform(
                        generate_series(1, len(loads)),
                        ix -> CASE WHEN ix = -({best}.negix)
                                   THEN loads[ix] + {n}
                                   ELSE loads[ix] END) END,
               list_append(asg, {{
                   'doc_id': docs[i + 1].doc_id,
                   'bin': CASE WHEN len({cand}) = 0
                               THEN CAST(len(loads) + 1 AS BIGINT)
                               ELSE CAST(-({best}.negix) AS BIGINT)
                          END}})
        FROM rec WHERE i < len(docs)
    ),
    fin AS (SELECT shard, asg FROM rec WHERE i = len(docs)),
    out AS (
        SELECT shard, unnest(asg) AS a FROM fin
    )
    SELECT a.doc_id, CAST(out.shard AS BIGINT) AS shard,
           b.n AS n_tokens, a.bin
    FROM out JOIN base b ON b.doc_id = a.doc_id
    """


@query("llm_pack_bestfit", oracle=_bfd_oracle())
def llm_pack_bestfit(spark, sf_dir):
    """No-straddle sequence packing — best-fit-decreasing into
    {CAP}-token bins, the packing SFT/instruction-tuning pipelines
    use when a document must land WHOLE in one training sequence
    (the concat-and-chunk twin `llm_pack_sequences` lets docs
    straddle; this key trades padding waste for boundary integrity).
    Per shard (the same salted md5 assignment, so the two packing
    keys shard identically): docs sort by (tokens DESC, doc_id),
    each goes to the FULLEST open bin that still fits — the
    classical BFD heuristic with its 11/9·OPT+6/9 guarantee — tie to
    the lowest bin index; oversized docs (> {CAP} tokens) open their
    own bin. Every rule is integer and totally ordered, so the
    assignment is unique and the oracle (a recursive CTE carrying
    bin loads + assignments as lists per shard) must reproduce it
    bin-for-bin.

    Scale shape: BFD is inherently sequential WITHIN a bin stream,
    so the packing unit is the SHARD — Arrow-batched
    ``applyInPandas`` per shard group, thousands-way parallel at
    100 TB, per-shard state = open-bin loads (bounded by
    shard-tokens/{CAP}).
    """.replace("{CAP}", str(_PACK_SEQ))
    import pandas as pd

    d = load_spread(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit("/pack"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _PACK_SHARDS
    )
    base = d.select(
        "doc_id",
        shard.alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        loads: list[int] = []
        bins = []
        for n in pdf["n_tokens"]:
            fits = [
                (load, -ix)
                for ix, load in enumerate(loads)
                if load + n <= _PACK_SEQ
            ]
            if fits:
                _, negix = max(fits)
                ix = -negix
                loads[ix] += n
                bins.append(ix + 1)
            else:
                loads.append(int(n))
                bins.append(len(loads))
        pdf = pdf.assign(bin=bins)
        return pdf[["doc_id", "shard", "n_tokens", "bin"]]

    return base.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, shard long, n_tokens long, bin long"
    )


_SFT_PROMPT_WORDS = 25
_SFT_BUDGET = 128


@query(
    "llm_sft_render",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    r AS (
      SELECT doc_id, len(ws) AS n_words,
             '<|user|>' || chr(10)
               || array_to_string(list_slice(ws, 1, {_SFT_PROMPT_WORDS}), ' ')
               || chr(10) || '<|assistant|>' || chr(10)
               || COALESCE(array_to_string(
                    list_slice(ws, {_SFT_PROMPT_WORDS} + 1, len(ws)), ' '),
                    '')
               AS rendered
      FROM w
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(len(string_split(rendered, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split(rendered, ' ')) > {_SFT_BUDGET}
                AS BIGINT) AS truncated,
           md5(rendered) AS rendered_md5
    FROM r
    """,
)
def llm_sft_render(spark, sf_dir):
    """Deterministic SFT example rendering — the chat-template step of
    a fine-tuning data pipeline: split each document into a prompt
    (first {_SFT_PROMPT_WORDS} whitespace words) and a completion
    (the rest), render them through a fixed chat template
    (``<|user|>\\n…\\n<|assistant|>\\n…``), and report the whitespace
    token count against a {_SFT_BUDGET}-token budget with a truncation
    flag — the sibling of `llm_pack_bestfit` (which packs what this
    key renders). The rendered text itself stays distributed; only its
    md5 surfaces, so the driver and oracle compare full-text equality
    without moving corpus bytes.

    Scale shape: pure per-row projection — no shuffle at all; a
    100 TB render is a map-only pass whose output co-partitions with
    its input, feeding the packer without an exchange. Both engines
    split on the literal single space (empty strings preserved), so
    token counts and the md5 agree exactly.
    """
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws)
    prompt = F.array_join(F.slice(ws, 1, _SFT_PROMPT_WORDS), " ")
    completion = F.array_join(
        F.slice(
            ws,
            _SFT_PROMPT_WORDS + 1,
            F.greatest(n_words - _SFT_PROMPT_WORDS, F.lit(0)),
        ),
        " ",
    )
    rendered = F.concat(
        F.lit("<|user|>\n"),
        prompt,
        F.lit("\n<|assistant|>\n"),
        completion,
    )
    n_tokens = F.size(F.split(rendered, " "))
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_tokens"),
        (n_tokens > _SFT_BUDGET).cast("long").alias("truncated"),
        F.md5(rendered).alias("rendered_md5"),
    )


_KN_D = 0.75
_KN_TOPK = 200


@query(
    "llm_ngram_kn",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    b AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(tk)),
                    i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS bg
      FROM t
    ),
    bb AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bb GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(n12) AS n1, COUNT(*) AS fanout
           FROM c12 GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n_prec FROM c12 GROUP BY w2),
    ty AS (SELECT COUNT(*) AS n_types FROM c12)
    SELECT w1, w2, CAST(n12 AS BIGINT) AS n12,
           ROUND((GREATEST(n12 - {_KN_D}, 0)
                  + {_KN_D} * fanout * (n_prec / n_types)) / n1, 8)
               AS kn_prob
    FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ty
    ORDER BY n12 DESC, w1, w2 LIMIT {_KN_TOPK}
    """,
)
def llm_ngram_kn(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    1995; Chen & Goodman 1999 — the smoothing KenLM defaults to) for
    the corpus's top-{_KN_TOPK} bigrams:
    ``P_kn(w2|w1) = (max(c12 − d, 0) + d·N1+(w1·)·P_cont(w2)) / c(w1)``
    with the standard d = 0.75 and continuation probability
    ``P_cont(w2) = N1+(·w2) / N1+(··)`` — the step past
    `llm_bigram_lm`'s MLE interpolation that a real LM-data pipeline
    takes before perplexity filtering.

    Every statistic derives from ONE corpus-wide bigram aggregation
    (`c12`): left totals and fan-outs are a re-agg of c12 by w1,
    continuation counts by w2, the type total a 1-row broadcast — no
    second corpus pass and no COUNT(DISTINCT) shuffle of raw pairs.
    The top-K bound rides a TOTAL order (count desc, then the unique
    bigram), so the cut is deterministic; probabilities are exact
    integer ratios through an identical IEEE expression shape in both
    engines, ROUND(8) on output.

    Scale shape: the bigram explode is the cost center (the
    `llm_bigram_lm` shape); everything after is vocabulary-bounded.
    The top-K is per-partition pruned before the single-partition
    final sort (TakeOrdered), so no global sort of the bigram table.
    """
    d = load_spread(spark, sf_dir, "documents").withColumn(
        "tk", F.split("text", " ")
    ).filter(F.size("tk") >= 2)
    bb = d.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(element_at(tk, i) AS w1,"
                "             element_at(tk, i + 1) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c12 = materialize(
        bb.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("n12").alias("n1"), F.count("*").alias("fanout")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("n_prec"))
    ty = c12.agg(F.count("*").alias("n_types"))
    kn = (
        F.greatest(F.col("n12") - _KN_D, F.lit(0.0))
        + F.lit(_KN_D)
        * F.col("fanout")
        * (F.col("n_prec") / F.col("n_types"))
    ) / F.col("n1")
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(ty))
        .select(
            "w1",
            "w2",
            F.col("n12").cast("long").alias("n12"),
            F.round(kn, 8).alias("kn_prob"),
        )
        .orderBy(F.col("n12").desc(), "w1", "w2")
        .limit(_KN_TOPK)
    )


@query(
    "llm_rouge_f1",
    oracle="""
    WITH o AS (
      SELECT doc_id, source, text,
             LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
                 AS b_id
      FROM documents
    ),
    pairs AS (
      SELECT doc_id AS a_id, b_id FROM o WHERE b_id IS NOT NULL
    ),
    tc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        FROM documents
      ) GROUP BY doc_id, w
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM tc GROUP BY doc_id),
    ov AS (
      SELECT p.a_id, p.b_id,
             SUM(LEAST(a.c, b.c)) AS overlap
      FROM pairs p
      JOIN tc a ON a.doc_id = p.a_id
      JOIN tc b ON b.doc_id = p.b_id AND b.w = a.w
      GROUP BY p.a_id, p.b_id
    )
    SELECT p.a_id, p.b_id,
           CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap,
           CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
           ROUND(2.0 * COALESCE(ov.overlap, 0) / (ta.n + tb.n), 8)
               AS rouge1_f1
    FROM pairs p
    JOIN tot ta ON ta.doc_id = p.a_id
    JOIN tot tb ON tb.doc_id = p.b_id
    LEFT JOIN ov ON ov.a_id = p.a_id AND ov.b_id = p.b_id
    """,
)
def llm_rouge_f1(spark, sf_dir):
    """ROUGE-1 F1 between each document and its successor within the
    same source — the n-gram-overlap grader an eval/decontamination
    pipeline runs over candidate pairs (Lin 2004's recall/precision
    harmonic mean over unigram MULTISETS: overlap counts each word
    min(count_a, count_b) times, not set-once). The pair generator
    (adjacent doc_ids per source) bounds pairs at |docs| rows — the
    point is the scorer; swap any candidate generator (MinHash
    buckets, embedding neighbors) in front of it unchanged.

    Scale shape: token counts are one exploding groupBy keyed
    (doc, word), immediately re-shaped to ONE word→count map per
    document; each pair then joins the two doc-grain maps and the
    multiset overlap Σ least(c_a, c_b) is a row-side map_zip_with
    reduction. That keeps every exchange at document grain — the
    earlier per-word form shuffled the token-grain counts twice more
    (the (b_id, word) overlap join and its pair-grain re-aggregation)
    and re-aggregated tc for totals, which are really just
    size(split(text)) on the scan. Zero-overlap pairs fall out as a
    natural 0 (every doc tokenizes to ≥ 1 word, so no pair is lost —
    F1 = 0 rows are the decontamination signal, not noise).
    All-integer counts; the F1 division is one identical IEEE
    expression, ROUND(8).
    """
    docs = load_spread(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        docs.select(
            F.col("doc_id").alias("a_id"),
            F.lead("doc_id").over(w).alias("b_id"),
        )
        .filter(F.col("b_id").isNotNull())
    )
    # built once, consumed as BOTH pair sides — cache the doc-grain
    # maps, not the token-grain counts (same bytes, half the rows)
    wcmap = materialize(
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "c"))
            ).alias("wc"),
            F.sum("c").alias("n"),
        )
    )
    ma = wcmap.select(
        F.col("doc_id").alias("a_id"),
        F.col("wc").alias("wc_a"),
        F.col("n").alias("n_a"),
    )
    mb = wcmap.select(
        F.col("doc_id").alias("b_id"),
        F.col("wc").alias("wc_b"),
        F.col("n").alias("n_b"),
    )
    lzero = F.lit(0).cast("long")
    overlap = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "wc_a",
                "wc_b",
                lambda k, x, y: F.when(
                    x.isNotNull() & y.isNotNull(), F.least(x, y)
                ).otherwise(lzero),
            )
        ),
        lzero,
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(ma, "a_id")
        .join(mb, "b_id")
        .select(
            "a_id",
            "b_id",
            overlap.alias("overlap"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
        .select(
            "a_id",
            "b_id",
            "overlap",
            "n_a",
            "n_b",
            F.round(
                F.lit(2.0)
                * F.col("overlap")
                / (F.col("n_a") + F.col("n_b")),
                8,
            ).alias("rouge1_f1"),
        )
    )


_BLOCKLIST = ("data", "http", "winner", "subscribe")
_BLOCK_RE = "(" + "|".join(_BLOCKLIST) + ")"
_BLOCK_MAX_HITS = 2


@query(
    "llm_blocklist_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BLOCK_RE}')) AS BIGINT)
               AS n_hits,
           CAST(len(regexp_extract_all(text, '{_BLOCK_RE}'))
                > {_BLOCK_MAX_HITS} AS BIGINT) AS blocked,
           NULLIF(regexp_extract(text, '{_BLOCK_RE}'), '') AS first_hit
    FROM documents
    """,
)
def llm_blocklist_filter(spark, sf_dir):
    """Multi-pattern blocklist screening — the spam/boilerplate/URL
    gate every crawl-ingest pipeline runs before quality scoring
    (C4's badwords filter, RefinedWeb's URL blocklists, public
    method). A pinned literal alternation counts non-overlapping
    leftmost matches per document; more than {_BLOCK_MAX_HITS} hits
    marks the doc blocked, and the first matched term surfaces for
    the audit trail (NULL when clean — NULLIF pins the no-match
    convention, where the engines' bare regexp_extract defaults
    differ).

    Scale shape: map-only regex projection, zero shuffle — the one
    compiled automaton scans each document once (alternation of K
    literals ≈ Aho-Corasick inside the regex engine); at 100 TB the
    filter co-partitions with the scan and feeds the quality funnel
    without an exchange. Cross-engine: literal alternations match
    identically under Java regex and RE2-style engines (leftmost,
    non-overlapping — no backtracking-dependent constructs).
    """
    d = load(spark, sf_dir, "documents")
    n_hits = F.regexp_count(F.col("text"), F.lit(_BLOCK_RE))
    return d.select(
        "doc_id",
        n_hits.cast("long").alias("n_hits"),
        (n_hits > _BLOCK_MAX_HITS).cast("long").alias("blocked"),
        F.nullif(
            F.regexp_extract(F.col("text"), _BLOCK_RE, 1), F.lit("")
        ).alias("first_hit"),
    )
