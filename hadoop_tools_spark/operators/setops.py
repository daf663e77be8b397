"""Set operations, projection/filter surface, deterministic sampling
(SURVEY.md §2.B)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load, load_spread
from ..registry import query


@query(
    "project_basic",
    oracle="""
    SELECT c_custkey AS custkey,
           UPPER(c_name) AS name_upper,
           c_custkey + 100000 AS shifted_key,
           c_mktsegment || ':' || c_name AS tagged
    FROM customer
    """,
)
def project_basic(spark, sf_dir):
    """Select / rename / computed columns — pure narrow projection,
    no shuffle; Catalyst prunes the parquet scan to 3 columns."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        (F.col("c_custkey") + 100000).alias("shifted_key"),
        # F.concat (NULL-propagating) matches the oracle's '||'; the
        # NULL-skipping concat_ws would emit the surviving field alone
        # if a regenerated fixture ever carried a NULL segment/name
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("tagged"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 150000
      AND o_orderstatus IN ('F', 'O')
      AND o_orderpriority LIKE '%URGENT'
      AND REGEXP_MATCHES(o_orderpriority, '^[0-9]-')
      AND o_orderdate IS NOT NULL
    """,
)
def filter_pred(spark, sf_dir):
    """Compound predicate surface: between / isin / like / rlike /
    null test — all pushed to the parquet scan where eligible."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT")
        & F.col("o_orderpriority").rlike("^[0-9]-")
        & F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("total_price"),
    )


@query(
    "set_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def set_union(spark, sf_dir):
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(op)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(f)


@query(
    "sample_hashmod",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hashmod(spark, sf_dir):
    """Deterministic ~12.5% sample via md5 prefix bucket.

    ``df.sample()`` uses engine-specific RNG and can never hash-match
    another engine; hashing the key gives a reproducible, uniformly
    distributed sample that any engine reproduces — also the right
    tool at 100 TB (stable across retries/speculative tasks, unlike
    seeded sample() under partition re-splits).
    """
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
            "0", "1"
        )
    ).select("o_orderkey", "o_custkey")


@query(
    "set_multiset_all",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber <= 2),
         b AS (SELECT l_suppkey FROM lineitem WHERE l_linenumber >= 2),
         i AS (SELECT k FROM a INTERSECT ALL SELECT l_suppkey FROM b),
         e AS (SELECT k FROM a EXCEPT ALL SELECT l_suppkey FROM b)
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n, 'intersect_all' AS op FROM i
    GROUP BY k
    UNION ALL
    SELECT k, CAST(COUNT(*) AS BIGINT), 'except_all' FROM e GROUP BY k
    """,
)
def set_multiset_all(spark, sf_dir):
    """Multiset INTERSECT ALL / EXCEPT ALL — duplicate-PRESERVING set
    ops (each key survives min(n_a, n_b) / max(0, n_a - n_b) times),
    which the DISTINCT variants in `set_intersect`/`set_except`
    cannot express. Spark plans both as a single aggregated count
    comparison per key (no row-pairing join); the grouped recount
    here makes the multiplicities hash-observable.
    """
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select(
        F.col("l_suppkey").alias("k")
    )
    b = li.filter(F.col("l_linenumber") >= 2).select(
        F.col("l_suppkey").alias("k")
    )
    i = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    e = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return i.unionByName(e)


@query(
    "sample_reservoir_group",
    oracle="""
    WITH ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5(CAST(doc_id AS VARCHAR) || '/res'), doc_id
               ) AS rn
        FROM documents
    )
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 10
    """,
)
def sample_reservoir_group(spark, sf_dir):
    """Deterministic fixed-SIZE per-group sample: exactly k = 10
    documents per language, chosen by salted-md5 order — the
    reservoir-sampling contract (uniform k per stratum) without RNG
    state, so the pick is identical under retries, repartitioning,
    and across engines. Complements `llm_sample_stratified`, which is
    rate-based (keep p%) rather than count-based (keep k).

    One user-key window per group ranks by the hash; at scale the
    k-smallest-by-hash per group is a per-partition top-k + merge
    (the same TakeOrderedAndProject shape as topk_group), never a full
    sort. The '/res' salt keeps this draw independent of every other
    hash-mod decision in the pipeline.
    """
    d = load_spread(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/res"))),
        "doc_id",
    )
    return (
        d.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
    )
