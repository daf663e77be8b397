"""Retrieval-stack operators for LLM data pipelines (SURVEY.md §2.E
extension): inverted-index build, BM25 ranking, RAG chunking, and int8
embedding quantization.

Everything is JVM-side (`split`/`explode`/higher-order lambdas) — a
100 TB corpus tokenizes and chunks inside whole-stage codegen; the only
shuffles are the (term, doc) partial-aggregated count reductions that
every retrieval index build fundamentally needs.

Cross-engine float policy (SURVEY.md §5.3): every float that feeds a
sum is first pinned with the IEEE-exact ``floor(x*1e6 + 0.5)`` form and
summed as BIGINT (order-independent), then scaled back at the end —
sums of raw doubles are order-sensitive in the last ulps and would
flicker the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load, load_spread, materialize
from ..registry import query

#: BM25 free parameters (Robertson's defaults).
_BM25_K1 = 1.2
_BM25_B = 0.75

#: document-frequency band for the inverted index: df==1 terms are
#: noise (nothing to join), and terms present in >80% of documents are
#: stopwords — an unbounded posting list is exactly the skew a 100 TB
#: index shard must never materialize as one array. The cap is
#: corpus-relative (df·5 ≤ N·4, integer-exact) so the band means the
#: same thing at every scale factor.
_IDX_DF_MIN = 2

#: RAG chunking geometry: 32-token windows every 24 tokens (8 overlap).
_CHUNK, _STRIDE = 32, 24


@query(
    "llm_inverted_index",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    per AS (
        SELECT term, doc_id, COUNT(*) AS tf FROM w GROUP BY term, doc_id
    ),
    n AS (SELECT COUNT(*) AS n_total FROM documents)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM per CROSS JOIN n
    GROUP BY term, n.n_total
    HAVING COUNT(*) >= {_IDX_DF_MIN} AND COUNT(*) * 5 <= n_total * 4
    """,
)
def llm_inverted_index(spark, sf_dir):
    """Posting-list build: term → sorted doc ids + df + total tf.

    Postings serialize as a comma-joined string (the ``agg_collect``
    convention, aggregates.py) so both harness canonicalizers hash a
    scalar cell — raw array columns crash the driver's comparator.

    Postings materialize ONLY for df-banded survivors: df/total_tf
    aggregate first (fixed-width state, map-side combinable), the
    band filters out stopwords and noise terms, and the (term, doc)
    pairs semi-join back before the collect_list — a stopword present
    in ~every document therefore never builds an N-element array in a
    single aggregation buffer (collecting before filtering was
    exactly the executor-OOM skew this key's contract forbids). The
    final group-by rides the term partitioning the join established
    (term ⊆ grouping keys → no extra exchange). At 100 TB the term
    exchange IS the index partitioning (term-range bucketed
    postings), and the df cap is the skew guard a web-scale
    vocabulary needs anyway.
    """
    d = load_spread(spark, sf_dir, "documents")
    n_total = d.agg(F.count("*").alias("n_total"))
    # materialize: `per` feeds BOTH the df-band aggregation and the
    # semi-join back — without the cache the scan+explode+tf pipeline
    # runs twice (plan-verified: ReuseExchange does not fire across
    # these branches; Generate appeared twice, 1.38× wall). The cache
    # is the (term, doc, tf) pair table, MEMORY_AND_DISK → spills, and
    # at 100 TB it is exactly the intermediate a real index build
    # would persist between the stats pass and the posting pass.
    per = materialize(
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    banded = (
        per.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("total_tf"),
        )
        .join(F.broadcast(n_total))
        .filter(
            (F.col("df") >= _IDX_DF_MIN)
            & (F.col("df") * 5 <= F.col("n_total") * 4)
        )
        .drop("n_total")
    )
    return (
        per.join(banded, "term")
        .groupBy("term", "df", "total_tf")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
        .select("term", "df", "total_tf", "postings")
    )


@query(
    "llm_bm25",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    per AS (
        SELECT term, doc_id, COUNT(*) AS tf FROM w GROUP BY term, doc_id
    ),
    dl AS (SELECT doc_id, SUM(tf) AS doc_len FROM per GROUP BY doc_id),
    df AS (SELECT term, COUNT(*) AS n_docs FROM per GROUP BY term),
    corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_total,
               CAST(SUM(doc_len) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    qterms AS (
        SELECT term, n_docs,
               CAST((ROW_NUMBER() OVER (ORDER BY n_docs DESC, term) - 1)
                    // 3 + 1 AS BIGINT) AS query_id
        FROM df CROSS JOIN corpus
        WHERE n_docs * 100 >= n_total AND n_docs * 5 <= n_total * 4
        ORDER BY n_docs DESC, term
        LIMIT 6
    ),
    scored AS (
        SELECT q.query_id, per.doc_id,
               CAST(floor(
                   LN((c.n_total - q.n_docs + 0.5) / (q.n_docs + 0.5) + 1.0)
                   * (per.tf * ({_BM25_K1} + 1.0))
                   / (per.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.doc_len / c.avgdl))
                   * 1000000 + 0.5) AS BIGINT) AS s6
        FROM per
        JOIN qterms q ON q.term = per.term
        JOIN dl ON dl.doc_id = per.doc_id
        CROSS JOIN corpus c
    ),
    totals AS (
        SELECT query_id, doc_id, SUM(s6) AS score6
        FROM scored GROUP BY query_id, doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, score6,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score6 DESC, doc_id) AS rank
        FROM totals
    )
    SELECT query_id, doc_id,
           CAST(score6 AS DOUBLE) / 1000000 AS bm25,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def llm_bm25(spark, sf_dir):
    """Okapi BM25 top-5 retrieval for data-derived multi-term queries.

    Query terms are the 6 highest-df mid-band terms (two 3-term
    queries) — derived from the corpus so the key is scale-factor
    independent. The query set is a bounded broadcast (LIMIT 6); the
    scoring join therefore never shuffles the corpus — (term, doc)
    counts hash-join the tiny query side in place, exactly how a
    100 TB index serves queries. Per-term scores are pinned to 6 dp
    as BIGINTs so the per-document sum is order-independent.
    """
    d = load_spread(spark, sf_dir, "documents")
    # (term, doc, tf) IS the index — it feeds doc lengths, document
    # frequencies, and scoring, so cache it once instead of paying the
    # corpus-sized tokenize+explode three times. At cluster scale the
    # same table is the thing a real deployment would persist
    # (llm_inverted_index's output), not recompute per consumer.
    per = materialize(
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dl = per.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    dfreq = per.groupBy("term").agg(F.count("*").alias("n_docs"))
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("doc_len").cast("double") / F.count("*")).alias("avgdl"),
    )
    # top-6 via orderBy+limit (TakeOrderedAndProject — distributed
    # partial top-k, never a single-partition window over the whole
    # vocabulary); the rank window then runs on 6 rows only. The df
    # band is corpus-relative (1%..80% of N) so query-term selection
    # means the same thing at every scale factor — an absolute band
    # empties out when the corpus grows 100×.
    qw = Window.orderBy(F.col("n_docs").desc(), "term")
    qterms = (
        dfreq.join(F.broadcast(corpus))
        .filter(
            (F.col("n_docs") * 100 >= F.col("n_total"))
            & (F.col("n_docs") * 5 <= F.col("n_total") * 4)
        )
        .orderBy(F.col("n_docs").desc(), "term")
        .limit(6)
        .withColumn("rn", F.row_number().over(qw))
        .select(
            "term",
            "n_docs",
            (((F.col("rn") - 1) / 3).cast("long") + 1).alias("query_id"),
        )
    )
    idf = F.log(
        (F.col("n_total") - F.col("n_docs") + 0.5) / (F.col("n_docs") + 0.5)
        + 1.0
    )
    tf_part = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * F.col("doc_len") / F.col("avgdl"))
    )
    scored = (
        per.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(corpus))
        .select(
            "query_id",
            "doc_id",
            F.floor(idf * tf_part * 1_000_000 + 0.5).cast("long").alias("s6"),
        )
    )
    totals = scored.groupBy("query_id", "doc_id").agg(
        F.sum("s6").alias("score6")
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), "doc_id"
    )
    return (
        totals.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "doc_id",
            (F.col("score6").cast("double") / 1_000_000).alias("bm25"),
            "rank",
        )
    )


@query(
    "llm_chunk_rag",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, n,
               unnest(generate_series(0,
                   CASE WHEN n > {_CHUNK}
                        THEN (n - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}
                        ELSE 0 END)) AS i,
               w
        FROM d
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_STRIDE} + 1 AS BIGINT) AS start_token,
           CAST(len(list_slice(w, i * {_STRIDE} + 1,
                               i * {_STRIDE} + {_CHUNK})) AS BIGINT)
               AS n_tokens,
           md5(array_to_string(list_slice(w, i * {_STRIDE} + 1,
                                          i * {_STRIDE} + {_CHUNK}), ' '))
               AS chunk_md5
    FROM starts
    """,
)
def llm_chunk_rag(spark, sf_dir):
    """Overlapping token-window chunking (RAG ingest): 32-token chunks
    every 24 tokens, with offsets and a content digest per chunk.

    Pure projection + explode — zero shuffles; chunk text never leaves
    the task that scanned the document, only the (offsets, md5) rows
    do. That is the 100 TB contract for chunking: output size ~1.3× the
    token count in *rows* but constant bytes per row, and the expansion
    happens inside codegen, not in Python.
    """
    d = load_spread(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    n_extra = F.when(
        n > _CHUNK,
        ((n - _CHUNK + _STRIDE - 1) / _STRIDE).cast("int"),
    ).otherwise(F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), n_extra),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            (i * _STRIDE + 1).cast("long").alias("start_token"),
            F.slice(words, i * _STRIDE + 1, _CHUNK).alias("w"),
        ),
    )
    c = d.select("doc_id", F.explode(chunks).alias("c"))
    return c.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.start_token").alias("start_token"),
        F.size("c.w").cast("long").alias("n_tokens"),
        F.md5(F.array_join("c.w", " ")).alias("chunk_md5"),
    )


@query(
    "llm_embed_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, label, v,
               list_max(list_transform(v, x -> abs(x))) AS amax
        FROM e
    ),
    q AS (
        SELECT vec_id, label, v, amax,
               127.0 / amax AS scale,
               list_transform(v, x -> CAST(floor(x * (127.0 / amax) + 0.5)
                                           AS BIGINT)) AS qv
        FROM s WHERE amax > 0
    )
    SELECT vec_id, label,
           floor(scale * 1000000 + 0.5) / 1000000 AS scale6,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT)
               AS q_l1,
           CAST(list_sum(list_transform(
                   generate_series(1, len(v)),
                   i -> CAST(floor(
                       (v[i] - qv[i] / scale) * (v[i] - qv[i] / scale)
                       * 1e12 + 0.5) AS BIGINT))) AS BIGINT) AS sse12
    FROM q
    """,
)
def llm_embed_quantize(spark, sf_dir):
    """Symmetric int8 scalar quantization of embeddings with exact
    reconstruction-error accounting.

    q_i = round(v_i · 127/max|v|) — the standard 4× compression step
    before ANN index build at 100 TB (int8 vectors quadruple what fits
    in executor memory and in the page cache). Pure per-row projection:
    zero shuffles, nothing driver-side; each per-element error term is
    pinned to a scaled BIGINT so the per-vector SSE sum is
    order-independent and hash-matches DuckDB exactly.
    """
    e = load_spread(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    s = e.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.array_max(F.transform(v, F.abs)).alias("amax"),
    ).filter(F.col("amax") > 0)
    scale = F.lit(127.0) / F.col("amax")
    q = s.select(
        "vec_id",
        "label",
        "v",
        scale.alias("scale"),
        F.transform(
            "v", lambda x: F.floor(x * scale + 0.5).cast("long")
        ).alias("qv"),
    )
    zero = F.lit(0).cast("long")
    sse_terms = F.transform(
        F.sequence(F.lit(1), F.size("v")),
        lambda i: F.floor(
            (F.element_at("v", i) - F.element_at("qv", i) / F.col("scale"))
            * (F.element_at("v", i) - F.element_at("qv", i) / F.col("scale"))
            * 1e12
            + 0.5
        ).cast("long"),
    )
    return q.select(
        "vec_id",
        "label",
        (F.floor(F.col("scale") * 1_000_000 + 0.5) / 1_000_000).alias(
            "scale6"
        ),
        F.aggregate("qv", zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            F.transform("qv", F.abs), zero, lambda a, x: a + x
        ).alias("q_l1"),
        F.aggregate(sse_terms, zero, lambda a, x: a + x).alias("sse12"),
    )
