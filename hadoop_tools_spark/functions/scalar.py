"""Scalar function surface (SURVEY.md §2.C) — one multi-function key
per family.

Everything stays JVM-side (built-in ``pyspark.sql.functions``) so the
expressions live inside whole-stage codegen; no Python UDF appears in
any hot path. Cross-engine type discipline: integer-ish outputs are
cast to BIGINT on both sides (Spark INT vs DuckDB BIGINT/HUGEINT/
TINYINT would otherwise drift the schema), floats are rounded, dates
are emitted as strings or timestamps, never bare DATE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load, load_spread
from ..registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name)                        AS name_lower,
           UPPER(p_brand)                       AS brand_upper,
           TRIM(' ' || p_name || ' ')           AS name_trimmed,
           SUBSTR(p_name, 1, 10)                AS name_prefix,
           CAST(LENGTH(p_name) AS BIGINT)       AS name_len,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           STRING_SPLIT(p_type, ' ')[1]         AS type_first_word,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1)    AS brand_num,
           REGEXP_REPLACE(p_type, '[aeiou]', '_', 'g') AS type_devoweled,
           CONCAT(p_brand, '/', p_type)         AS brand_type
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    p = load_spread(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias(
            "brand_type"
        ),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT)        AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT)       AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT)         AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           STRFTIME(o_orderdate, '%Y-%m-%d')        AS order_date_str,
           CAST(DATE_DIFF('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
           CAST(EPOCH(o_orderdate) AS BIGINT)       AS epoch_sec,
           CAST(MAKE_DATE(2030, 1, 15) AS VARCHAR)  AS fixed_date
    FROM orders
    """,
)
def fn_datetime(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("days_since_95"),
        F.unix_timestamp(
            F.col("o_orderdate").cast("timestamp")
        ).alias("epoch_sec"),
        F.make_date(F.lit(2030), F.lit(1), F.lit(15))
        .cast("string")
        .alias("fixed_date"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 50000), 2)    AS abs_diff,
           ROUND(POW(l_quantity, 2), 2)              AS qty_sq,
           floor(SQRT(l_extendedprice) * 1000000 + 0.5) / 1000000
                                                     AS price_sqrt,
           floor(LN(l_extendedprice) * 1000000 + 0.5) / 1000000
                                                     AS price_ln,
           floor(EXP(l_discount) * 1000000 + 0.5) / 1000000
                                                     AS disc_exp,
           CAST(l_partkey % 7 AS BIGINT)             AS key_mod7,
           CAST(FLOOR(l_extendedprice) AS BIGINT)    AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT)     AS price_ceil,
           CAST(SIGN(l_extendedprice - 50000) AS DOUBLE) AS diff_sign
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    li = load_spread(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_diff"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        # transcendentals floor-pinned at 1e-6 (engine-native ROUND
        # diverges at .5 boundaries even on identical doubles)
        (F.floor(F.sqrt("l_extendedprice") * 1e6 + 0.5) / 1e6).alias(
            "price_sqrt"
        ),
        (F.floor(F.log("l_extendedprice") * 1e6 + 0.5) / 1e6).alias(
            "price_ln"
        ),
        (F.floor(F.exp("l_discount") * 1e6 + 0.5) / 1e6).alias("disc_exp"),
        F.pmod(F.col("l_partkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.signum(F.col("l_extendedprice") - 50000)
        .cast("double")
        .alias("diff_sign"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                      AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           ROUND(GREATEST(c_acctbal, 0.0), 2)        AS bal_floor0,
           ROUND(LEAST(c_acctbal, 5000.0), 2)        AS bal_cap5k
    FROM customer
    """,
)
def fn_cond(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("bal_floor0"),
        F.round(F.least("c_acctbal", F.lit(5000.0)), 2).alias("bal_cap5k"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT)  AS n_words,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT)
               AS n_distinct_words,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1:5],
                           ',') AS first5_sorted,
           CAST(LIST_AGGREGATE(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                              x -> LENGTH(x)), 'sum')
                AS BIGINT) AS total_word_chars,
           CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                x -> LENGTH(x) > 5)) AS BIGINT) AS n_long_words
    FROM documents
    """,
)
def fn_array(spark, sf_dir):
    """Array surface incl. higher-order transform/filter/aggregate —
    all JVM-side lambda expressions, no Python round-trip."""
    d = load_spread(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(words)), 1, 5), ","
        ).alias("first5_sorted"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("total_word_chars"),
        F.size(F.filter(words, lambda x: F.length(x) > 5))
        .cast("long")
        .alias("n_long_words"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT e.event_id,
           MAP_EXTRACT(MAP(['type', 'user'],
                           [e.event_type, CAST(e.user_id AS VARCHAR)]),
                       'type')[1] AS type_from_map,
           ARRAY_TO_STRING(MAP_KEYS(MAP(['type', 'user'],
                           [e.event_type, CAST(e.user_id AS VARCHAR)])), ',')
               AS map_keys_csv,
           ARRAY_TO_STRING(MAP_VALUES(MAP(['type', 'user'],
                           [e.event_type, CAST(e.user_id AS VARCHAR)])), ',')
               AS map_values_csv
    FROM events e
    """,
)
def fn_map(spark, sf_dir):
    """Map construction/inspection. DuckDB map extraction yields a
    single-element list, unwrapped with [1] in the oracle."""
    ev = load_spread(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("user"),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        m.getItem("type").alias("type_from_map"),
        F.array_join(F.map_keys(m), ",").alias("map_keys_csv"),
        F.array_join(F.map_values(m), ",").alias("map_values_csv"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL
                THEN TRUE ELSE FALSE END AS has_k
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON extraction over the semi-structured ``events.props``.

    One ``from_json`` parse feeds all three projections —
    ``get_json_object`` re-parses the document per call, tripling
    JSON cost on a wide extraction (verified identical null/missing
    -key semantics for this shape).
    """
    ev = load_spread(spark, sf_dir, "events")
    k = F.from_json("props", "map<string,string>").getItem("k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        k.isNotNull().alias("has_k"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           MD5(c_name)          AS name_md5,
           SHA256(c_name)       AS name_sha256
    FROM customer
    """,
)
def fn_hash(spark, sf_dir):
    """Cross-engine-stable hashes (md5/sha256 verified identical)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
    )


@query("fn_hash_engine")  # rows-only: xxhash64/crc32 are engine-specific
def fn_hash_engine(spark, sf_dir):
    """Engine-native hashes (xxhash64 with Spark's seed, crc32) —
    useful for salting/bucketing at scale; no cross-engine oracle."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("name_xxh64"),
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           xor(o_orderkey, o_custkey)            AS key_xor,
           o_orderkey & 255                      AS key_and,
           o_orderkey | 1                        AS key_or,
           CAST(bit_count(o_orderkey) AS INT)    AS key_bits,
           o_custkey << 2                        AS cust_shl,
           o_custkey >> 1                        AS cust_shr
    FROM orders
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise family: xor/and/or, popcount, shifts — the substrate of
    hash partitioners, bloom filters, and SimHash hamming blocks
    (SCALE.md's ``bit_count(xor(sig_a, sig_b))`` candidate filter)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("key_and"),
        F.col("o_orderkey").bitwiseOR(F.lit(1)).alias("key_or"),
        F.bit_count("o_orderkey").alias("key_bits"),
        F.shiftleft("o_custkey", 2).alias("cust_shl"),
        F.shiftright("o_custkey", 1).alias("cust_shr"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT       AS k_int,
           json_extract_string(props, '$.k')     AS k_str,
           CAST(NULL AS INT)                     AS missing
    FROM events
    """,
)
def fn_variant(spark, sf_dir):
    """Spark 4 VariantType surface: ``parse_json`` → binary variant →
    typed ``variant_get`` path extraction, with ``try_variant_get``
    for absent paths (NULL, not error). Variant is the modern
    semi-structured hot path — a parsed binary encoding that skips
    re-tokenizing JSON per access, shreds into columnar storage, and
    prunes paths at scan time; the fn_json key keeps the classic
    string-JSON functions for comparison.
    """
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.nope", "int").alias("missing"),
    )


@query(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT c_custkey,
             'https://' || lower(replace(c_mktsegment, ' ', '')) ||
             '.example.com/cust/' || c_custkey ||
             '?seg=' || c_nationkey || '&page=2' AS url
      FROM customer
    )
    SELECT c_custkey, url,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]seg=([^&]*)', 1) AS seg,
           regexp_extract(url, '^(https?)://', 1) AS protocol
    FROM u
    """,
)
def fn_url(spark, sf_dir):
    """URL function family: parse_url HOST/PATH/QUERY/PROTOCOL.

    URLs are synthesized from customer columns (the fixture carries no
    real URLs), then parsed back with Spark's parse_url — the oracle
    re-derives each part with regexes, so the extraction semantics are
    hash-verified. At scale this is pure codegen string work, zero
    shuffle."""
    c = load(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit(""))),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?seg="),
        F.col("c_nationkey").cast("string"),
        F.lit("&page=2"),
    )
    return c.select(
        "c_custkey",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("seg")).alias("seg"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
           CAST((length(text)
                 - length(regexp_replace(text, 'ta', '', 'g'))) / 2
                AS BIGINT) AS n_ta,
           regexp_matches(text, 'spark') AS has_spark,
           md5(regexp_replace(text, '(a|the) ', '', 'g')) AS destopped_md5
    FROM documents
    """,
)
def fn_regexp(spark, sf_dir):
    """Regexp function family: extract / count / detect / global
    replace. `regexp_count` is cross-checked through a
    length-difference identity so the oracle never depends on another
    engine's count semantics; the global-replace output is md5'd so
    long strings hash-compare cheaply. Pure codegen, zero shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{6,})", 1).alias("first_long_word"),
        F.regexp_count("text", F.lit("ta")).cast("long").alias("n_ta"),
        F.col("text").rlike("spark").alias("has_spark"),
        F.md5(
            F.regexp_replace("text", r"(a|the) ", "").cast("binary")
        ).alias("destopped_md5"),
    )


@query(
    "fn_nulls",
    oracle="""
    SELECT o_orderkey,
           (o_clerk IS NOT DISTINCT FROM o_comment_null) AS nullsafe_eq,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           (o_clerk IS DISTINCT FROM o_comment_null) AS distinct_from
    FROM (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_orderstatus END AS o_clerk,
             CASE WHEN o_orderkey % 2 = 0 THEN NULL
                  ELSE o_orderstatus END AS o_comment_null
      FROM orders
    )
    """,
)
def fn_nulls(spark, sf_dir):
    """Null-semantics family: null-safe equality (<=>), NULLIF,
    COALESCE, IS DISTINCT FROM — the operators that decide whether a
    100 TB join on a nullable key silently drops rows. Synthetic NULL
    patterns are derived from the key so the oracle reproduces them
    exactly. Pure codegen."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("a"),
        F.when(F.col("o_orderkey") % 2 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("b"),
    )
    return o.select(
        "o_orderkey",
        F.col("a").eqNullSafe(F.col("b")).alias("nullsafe_eq"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_filled"),
        (~F.col("a").eqNullSafe(F.col("b"))).alias("distinct_from"),
    )


@query(
    "fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 3 = 0 THEN NULL
                ELSE ROUND(l_extendedprice / (l_linenumber - 3), 4)
           END AS safe_div,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           TRY_CAST(CASE WHEN l_linenumber % 3 = 0
                         THEN CAST(l_orderkey AS VARCHAR) || 'x'
                         ELSE CAST(l_orderkey AS VARCHAR) END
                    AS BIGINT) AS key_int
    FROM lineitem
    """,
)
def fn_try(spark, sf_dir):
    """ANSI-safe arithmetic: try_divide / try_cast return NULL instead
    of failing the job — at 100 TB one malformed row must not kill a
    12-hour pipeline. The oracle emulates try_divide with an explicit
    zero guard (DuckDB has no TRY division), so NULL placement is
    hash-verified. load_spread: the 600 k-row fixture is one row
    group; try_to_number's per-row format parse is the costliest
    scalar in the suite and wants all cores."""
    li = load_spread(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 3), 4
        ).alias("safe_div"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999")).cast("long").alias(
            "flag_as_int"
        ),
        F.when(
            F.col("l_linenumber") % 3 == 0,
            F.concat(F.col("l_orderkey").cast("string"), F.lit("x")),
        )
        .otherwise(F.col("l_orderkey").cast("string"))
        .try_cast("long")
        .alias("key_int"),
    )


@query(
    "fn_collate",
    oracle="""
    WITH mixed AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS t
      FROM part
    )
    SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_binary_distinct,
           CAST(COUNT(DISTINCT lower(t)) AS BIGINT) AS n_ci_distinct
    FROM mixed
    """,
)
def fn_collate(spark, sf_dir):
    """Spark 4 collation support: COUNT(DISTINCT) under UTF8_LCASE
    merges case variants that binary collation keeps apart. The fixture
    is single-case, so case variants are derived from the key parity;
    the oracle expresses the collation as an explicit lower() — the
    semantics UTF8_LCASE implements engine-side (and pushes into
    hash/sort operators, unlike a lower() wrapper which blocks stats
    and prefix pruning on the original column)."""
    mixed = load(spark, sf_dir, "part").select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("t")
    )
    return mixed.agg(
        F.countDistinct("t").alias("n_binary_distinct"),
        F.countDistinct(F.collate(F.col("t"), "UTF8_LCASE")).alias(
            "n_ci_distinct"
        ),
    )


@query(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)  AS plus_30d,
           CAST(CAST(o_orderdate AS DATE) - 7  AS TIMESTAMP)  AS minus_7d,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                AS TIMESTAMP)                                 AS plus_3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
                                                              AS month_end,
           CAST(CAST(o_orderdate AS DATE)
                + CAST(8 - isodow(o_orderdate) AS INTEGER)
                AS TIMESTAMP)                                 AS next_monday,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT)         AS dow,
           o_orderdate + INTERVAL 90 MINUTE                   AS plus_90min
    FROM orders
    """,
)
def fn_interval(spark, sf_dir):
    """Date/interval arithmetic family: day and month offsets (with
    end-of-month clamping), last_day, next_day, day-of-week, and
    timestamp + sub-day interval. Pure codegen expressions, zero
    shuffle. Cross-engine notes: Spark's next_day has no DuckDB
    twin, so the oracle re-derives it from isodow (offset 8-isodow is
    1..7 days, strictly-after semantics preserved); DuckDB's
    dayofweek is 0-based Sunday where Spark's is 1-based, hence the
    +1; month addition clamps Jan 31 + 1mo to Feb end in BOTH engines.
    """
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("timestamp").alias("plus_30d"),
        F.date_sub(d, 7).cast("timestamp").alias("minus_7d"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.next_day(d, "Mon").cast("timestamp").alias("next_monday"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTE")).alias(
            "plus_90min"
        ),
    )


@query(
    "fn_strdist",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_type,
           CAST(CASE WHEN levenshtein(p_name, p_type) <= 8
                     THEN levenshtein(p_name, p_type)
                     ELSE -1 END AS BIGINT)            AS lev_capped,
           CAST(levenshtein(replace(p_brand, '#', ''),
                            reverse(replace(p_brand, '#', '')))
                AS BIGINT)                             AS lev_brand_pal
    FROM part
    """,
)
def fn_strdist(spark, sf_dir):
    """String-distance family: Levenshtein edit distance, the
    early-exit thresholded variant (Spark returns -1 past the
    threshold — the oracle re-derives that contract with CASE), and a
    palindrome-distance composition over normalized brand strings.

    Edit distance is the fuzzy-matching workhorse (see
    ``join_fuzzy_match`` for the blocked-join use); this key pins the
    scalar semantics cross-engine. Pure codegen, zero shuffle; the
    thresholded form is the one to use in 100 TB joins — it
    early-exits the DP at the band limit, O(threshold·len) not
    O(len²) per pair.
    """
    p = load(spark, sf_dir, "part")
    brand = F.regexp_replace("p_brand", "#", "")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").cast("long").alias("lev_type"),
        F.levenshtein("p_name", "p_type", 8).cast("long").alias("lev_capped"),
        F.levenshtein(brand, F.reverse(brand)).cast("long").alias(
            "lev_brand_pal"
        ),
    )


@query(
    "fn_geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5  AS lat,
               CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.25 AS lng
        FROM customer
    )
    SELECT c_custkey, lat, lng,
           floor(2.0 * 6371.0 * asin(sqrt(
               sin(radians(lat) / 2) * sin(radians(lat) / 2)
               + cos(radians(lat)) * cos(CAST(0 AS DOUBLE))
                 * sin(radians(lng) / 2) * sin(radians(lng) / 2)))
               * 1000 + 0.5) / 1000 AS dist_origin_km3,
           CAST(floor((lat + 90.0) / 5.0) * 72
                + floor((lng + 180.0) / 5.0) AS BIGINT) AS cell_id,
           (lat BETWEEN 10.0 AND 60.0 AND lng BETWEEN -30.0 AND 40.0)
               AS in_bbox
    FROM pts
    """,
)
def fn_geo(spark, sf_dir):
    """Geospatial-lite family: haversine distance to the origin, 5°
    grid-cell bucketing (geohash-style spatial blocking key), and
    bounding-box containment. Coordinates are synthesized from keys
    with integer-exact arithmetic.

    Pure codegen, zero shuffle; the grid cell is the spatial JOIN
    pattern at 100 TB (equi-join on cell_id blocks candidates, exact
    distance verifies — same block-then-verify shape as every dedup
    key). Float discipline: the distance is pinned at 3 dp (meter
    precision). Trig differs by ≤2 ulp across libm implementations —
    relative 1e-15, absolute ~1e-11 km here — so the flicker
    probability per row at a 1e-3 step is ~1e-8; at 6 dp it would be
    1000× higher, which is why this key rounds coarser than the
    engine's usual 6 dp.
    """
    c = load(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180).cast("double") - 90.0 + 0.5
    lng = ((F.col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.25
    pts = c.select("c_custkey", lat.alias("lat"), lng.alias("lng"))
    la, lo = F.radians("lat"), F.radians("lng")
    hav = (
        F.sin(la / 2) * F.sin(la / 2)
        + F.cos(la) * F.cos(F.lit(0.0)) * F.sin(lo / 2) * F.sin(lo / 2)
    )
    return pts.select(
        "c_custkey",
        "lat",
        "lng",
        (F.floor(2.0 * 6371.0 * F.asin(F.sqrt(hav)) * 1000 + 0.5) / 1000).alias(
            "dist_origin_km3"
        ),
        (
            F.floor((F.col("lat") + 90.0) / 5.0) * 72
            + F.floor((F.col("lng") + 180.0) / 5.0)
        )
        .cast("long")
        .alias("cell_id"),
        (
            F.col("lat").between(10.0, 60.0) & F.col("lng").between(-30.0, 40.0)
        ).alias("in_bbox"),
    )


@query(
    "fn_mask",
    oracle="""
    SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(
               p_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(
               p_brand, '[A-Z]', 'Q', 'g'), '[a-z]', 'q', 'g'),
               '[0-9]', '9', 'g') AS brand_masked,
           regexp_replace(p_type, '[0-9]', 'n', 'g') AS type_digits_masked
    FROM part
    """,
)
def fn_mask(spark, sf_dir):
    """Data-masking family (Spark 4 ``mask``): format-preserving
    redaction — uppercase→X, lowercase→x, digits→n, punctuation kept —
    the display-layer PII control that keeps string SHAPE for QA while
    destroying content (complement of ``llm_pii_scrub``'s audit-side
    scrubbing). The oracle re-derives the same contract from char-class
    regexes, pinning ``mask``'s class semantics cross-engine. Pure
    codegen, zero shuffle.
    """
    p = load_spread(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.mask("p_name").alias("name_masked"),
        F.mask("p_brand", F.lit("Q"), F.lit("q"), F.lit("9")).alias(
            "brand_masked"
        ),
        F.mask(
            "p_type",
            F.lit(None).cast("string"),
            F.lit(None).cast("string"),
            F.lit("n"),
        ).alias("type_digits_masked"),
    )
