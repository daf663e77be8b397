"""Change-data-capture / warehouse-maintenance operators (SURVEY.md
§2.B widening): MERGE-style upsert and SCD type-2 interval building.

Spark has no MERGE statement outside table formats (Delta/Iceberg),
but the distributed formulation every engine compiles MERGE into is
directly expressible: union the delta against the base with a
priority column and keep the first row per key — exactly one shuffle
on the merge key. That is the shape that survives a 100 TB base: the
base relation moves once, the (typically much smaller) delta rides
the same exchange, and no driver-side diffing exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "merge_upsert",
    oracle="""
    WITH delta AS (
        SELECT o_orderkey, ROUND(o_totalprice + 100, 2) AS o_totalprice,
               'upd' AS src
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT -o_orderkey - 1, ROUND(o_totalprice, 2), 'ins'
        FROM orders WHERE o_orderkey % 10 = 3
    ),
    all_rows AS (
        SELECT o_orderkey, o_totalprice, src, 1 AS prio FROM delta
        UNION ALL
        SELECT o_orderkey, ROUND(o_totalprice, 2), 'base', 2 FROM orders
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                     ORDER BY prio) AS rn
        FROM all_rows
    )
    SELECT o_orderkey, o_totalprice, src FROM r WHERE rn = 1
    """,
)
def merge_upsert(spark, sf_dir):
    """MERGE (upsert) without a table format: a deterministic delta —
    updates for every ``o_orderkey % 10 = 3`` (price bump) plus
    inserts under fresh (negated) keys — merged into `orders` with
    update-beats-base semantics.

    Formulation: union(delta prio 1, base prio 2) → row_number per
    key → keep rn=1. One shuffle on the merge key; the window runs
    inside that exchange's partitioning. Delta and base derive from
    separate scans, so at production scale the delta side is a small
    CDC feed and the base a bucketed table — the same plan co-locates
    on the bucket key with zero extra exchanges. Insert keys are
    negative to stay provably disjoint from the fixture's key space.
    """
    o = load(spark, sf_dir, "orders")
    price2 = F.round("o_totalprice", 2)
    delta = (
        o.filter(F.col("o_orderkey") % 10 == 3)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") + 100, 2).alias("o_totalprice"),
            F.lit("upd").alias("src"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 10 == 3).select(
                (-F.col("o_orderkey") - 1).alias("o_orderkey"),
                price2.alias("o_totalprice"),
                F.lit("ins").alias("src"),
            )
        )
    )
    all_rows = delta.withColumn("prio", F.lit(1)).unionByName(
        o.select(
            "o_orderkey",
            price2.alias("o_totalprice"),
            F.lit("base").alias("src"),
        ).withColumn("prio", F.lit(2))
    )
    w = Window.partitionBy("o_orderkey").orderBy("prio")
    return (
        all_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_totalprice", "src")
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    chg AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM e
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL
               AS is_current
    FROM chg
    """,
)
def scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event stream into validity intervals — one row per
    event_type *change*, with ``valid_from`` / ``valid_to`` bounds and
    an ``is_current`` flag for the open interval. The standard
    dimension-maintenance op a warehouse runs on every CDC batch.

    Two windows, both over the same ``user_id`` partitioning, so
    Spark plans ONE exchange and both lag/lead passes ride it —
    verify with .explain(): a single Exchange feeds two Window nodes.
    Ties are broken by event_id, making the intervals deterministic
    under equal timestamps on both engines.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    # the event_id tie-breaker must reach the SECOND window too: two
    # changes at one timestamp would otherwise give LEAD an ambiguous
    # order (engines could emit swapped intervals)
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w2)
    return chg.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "merge_full",
    oracle="""
    WITH delta AS (
        SELECT o_orderkey, ROUND(o_totalprice + 100, 2) AS new_price,
               'U' AS op
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT o_orderkey, NULL, 'D' FROM orders WHERE o_orderkey % 10 = 7
        UNION ALL
        SELECT -o_orderkey - 1, ROUND(o_totalprice, 2), 'I'
        FROM orders WHERE o_orderkey % 10 = 3
    ),
    merged AS (
        SELECT b.o_orderkey,
               CASE WHEN d.op = 'U' THEN d.new_price
                    ELSE ROUND(b.o_totalprice, 2) END AS o_totalprice,
               CASE WHEN d.op = 'U' THEN 'upd' ELSE 'base' END AS src,
               d.op
        FROM orders b LEFT JOIN delta d ON d.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey, o_totalprice, src FROM merged
    WHERE op IS NULL OR op <> 'D'
    UNION ALL
    SELECT o_orderkey, new_price, 'ins' FROM delta WHERE op = 'I'
    """,
)
def merge_full(spark, sf_dir):
    """Full tri-branch MERGE: WHEN MATCHED AND op='U' THEN UPDATE,
    WHEN MATCHED AND op='D' THEN DELETE, WHEN NOT MATCHED THEN INSERT
    — the complete CDC-apply a changefeed consumer runs, extending
    `merge_upsert` with the delete branch.

    Plan: ONE left equi-join of base to the keyed delta decides
    update/delete/keep per row (deletes are a post-join filter, not a
    separate anti join — the 100 TB rule: never scan the fact table
    twice for branches one join can decide), and inserts union in
    from the delta scan. Base co-located on a bucketed merge key runs
    this with a single exchange on the delta side only.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    price2 = F.round("o_totalprice", 2)
    upd = o.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") + 100, 2).alias("new_price"),
        F.lit("U").alias("op"),
    )
    dele = o.filter(F.col("o_orderkey") % 10 == 7).select(
        "o_orderkey",
        F.lit(None).cast("double").alias("new_price"),
        F.lit("D").alias("op"),
    )
    ins = o.filter(F.col("o_orderkey") % 10 == 3).select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        price2.alias("new_price"),
        F.lit("I").alias("op"),
    )
    delta = upd.unionByName(dele).unionByName(ins)
    keyed = delta.filter(F.col("op") != "I").select(
        F.col("o_orderkey").alias("d_key"), "new_price", "op"
    )
    merged = (
        o.join(keyed, o.o_orderkey == F.col("d_key"), "left")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.when(F.col("op") == "U", F.col("new_price"))
            .otherwise(price2)
            .alias("o_totalprice"),
            F.when(F.col("op") == "U", F.lit("upd"))
            .otherwise(F.lit("base"))
            .alias("src"),
        )
    )
    inserts = delta.filter(F.col("op") == "I").select(
        "o_orderkey",
        F.col("new_price").alias("o_totalprice"),
        F.lit("ins").alias("src"),
    )
    return merged.unionByName(inserts)
