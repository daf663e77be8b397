"""Time-series operators over the ``events`` stream-shaped table.

The hypertable-style surface a telemetry user of the engine asks for:
regularizing an irregular event stream onto a fixed-step time spine
(gap-fill + forward-fill + linear interpolation) and interval-overlap
joins between derived activity windows. Both are declarative DataFrame
plans; the overlap join uses the bucketized equi-join pattern (the
same trick as ``join_range_bucketed``) so it never degenerates into a
theta-join cartesian at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

#: session split threshold (seconds), matching ``sessionize_batch``.
_GAP_S = 1800

#: overlap-join time bucket (seconds) — one day.
_BUCKET_S = 86400


@query(
    "ts_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             FLOOR(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) * 100.0 / COUNT(*) + 0.5) / 10000 AS obs
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    u AS (SELECT DISTINCT user_id FROM events),
    spine AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM u CROSS JOIN b
    ),
    g AS (
      SELECT s.user_id, s.day, daily.obs
      FROM spine s LEFT JOIN daily USING (user_id, day)
    ),
    f AS (
      SELECT user_id, day, obs,
             LAST_VALUE(obs IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS ffill,
             LAST_VALUE(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS pd,
             FIRST_VALUE(obs IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM g
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day, obs, ffill,
           CASE WHEN obs IS NOT NULL THEN obs
                WHEN ffill IS NOT NULL AND nv IS NOT NULL THEN
                  FLOOR((ffill + (nv - ffill)
                         * date_diff('day', pd, day)
                         / date_diff('day', pd, nd)) * 10000 + 0.5)
                  / 10000
           END AS interp
    FROM f
    """,
)
def ts_gapfill(spark, sf_dir):
    """Gap-fill an irregular per-user daily series onto a dense day
    spine, with forward-fill and linear interpolation — the
    `time_bucket_gapfill` / `locf` / `interpolate` surface of a
    hypertable rollup, expressed as plain DataFrame ops.

    Plan shape: one aggregation to daily grain; the spine is
    (distinct users) x ``sequence(min_day, max_day)`` — the global
    bounds ride the plan as a 1-row broadcast aggregate, never an
    eager driver collect; one left join back onto the spine; then
    last/first-ignoreNulls windows partitioned by user_id. Spine
    cardinality is users x days = exactly the output size, so no step
    is super-linear in the result; every window partitions on the
    high-cardinality user key. Interpolation is null outside the
    first/last observation by definition (no extrapolation), and
    observed days interpolate to themselves.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    # exact cross-engine daily mean: `value` carries 2 decimals, so
    # sum it as integer cents (an order-independent BIGINT sum, unlike
    # a double sum whose last ulp depends on partial-agg order), then
    # divide once — every op IEEE-exact and bit-identical in DuckDB
    daily = ev.groupBy("user_id", "day").agg(
        (
            F.floor(
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                * 100.0
                / F.count("*")
                + 0.5
            )
            / 10000
        ).alias("obs")
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    # user set derived from the already-aggregated daily frame — the
    # raw-events distinct was a second full fact scan + a shuffle over
    # fact cardinality for the identical set
    spine = (
        daily.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    g = spine.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    f = g.select(
        "user_id",
        "day",
        "obs",
        F.last("obs", ignorenulls=True).over(back).alias("ffill"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("obs", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    # single-day gaps put the interpolated value exactly on a .00005
    # rounding boundary (midpoint of two 4-decimal inputs), where
    # Spark's BigDecimal HALF_UP and DuckDB's C round() disagree; the
    # floor(x*1e4 + 0.5)/1e4 form uses only IEEE-exact ops (mul, add,
    # floor, div), which both engines evaluate bit-identically
    interp = F.when(F.col("obs").isNotNull(), F.col("obs")).when(
        F.col("ffill").isNotNull() & F.col("nv").isNotNull(),
        F.floor(
            (
                F.col("ffill")
                + (F.col("nv") - F.col("ffill"))
                * F.datediff("day", "pd")
                / F.datediff("nd", "pd")
            )
            * 10000
            + 0.5
        )
        / 10000,
    )
    return f.select(
        "user_id",
        # the fixture's time columns are all TIMESTAMP; emit the spine
        # at the same type so cross-engine compares are type-stable
        F.col("day").cast("timestamp").alias("day"),
        "obs",
        "ffill",
        interp.alias("interp"),
    )


_SESS_SQL = f"""
    e AS (
      SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    ), m AS (
      SELECT *, CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > {_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ), s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM m
    ), sess AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec
      FROM s GROUP BY user_id, session_id
      HAVING MAX(ts_sec) > MIN(ts_sec)
    )
"""


def _sessions(spark, sf_dir) -> DataFrame:
    """(user_id, session_id, start_sec, end_sec) activity intervals —
    the gap-based sessionization of ``sessionize_batch``, keeping only
    sessions with positive duration (an instantaneous point interval
    carries no overlap information)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_timestamp("ts").alias("ts_sec")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_sec").over(w).isNull()
            | (F.col("ts_sec") - F.lag("ts_sec").over(w) > _GAP_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_sec").alias("start_sec"),
            F.max("ts_sec").alias("end_sec"),
        )
        .filter(F.col("end_sec") > F.col("start_sec"))
    )


@query(
    "ts_overlap_join",
    oracle=f"""
    WITH {_SESS_SQL}
    SELECT a.user_id AS user_a, a.session_id AS session_a,
           b.user_id AS user_b, b.session_id AS session_b,
           LEAST(a.end_sec, b.end_sec)
             - GREATEST(a.start_sec, b.start_sec) AS overlap_sec
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id
     AND a.start_sec <= b.end_sec AND b.start_sec <= a.end_sec
    """,
)
def ts_overlap_join(spark, sf_dir):
    """Interval-overlap self-join: which activity sessions of distinct
    users overlap in time, and by how many seconds (closed-interval
    intersection).

    The scale plan is bucketize-then-equi-join, not a theta join: each
    session is exploded onto the day buckets it spans, the join runs
    as a plain hash join on the bucket key, and each qualifying pair
    is emitted exactly once — at the bucket containing the later of
    the two start times (the standard dedup predicate for replicated
    interval joins). Candidate volume scales with per-bucket session
    density, not |sessions|²; Catalyst plans SortMergeJoin on the
    bucket key with the overlap predicates as cheap post-join filters.
    Session intervals are bounded by the _GAP_S splitter, so a session
    spans O(1) day buckets and the explode factor is a small constant.
    """
    sess = _sessions(spark, sf_dir)
    bucketed = sess.select(
        "user_id",
        "session_id",
        "start_sec",
        "end_sec",
        F.explode(
            F.sequence(
                (F.col("start_sec") / _BUCKET_S).cast("long"),
                (F.col("end_sec") / _BUCKET_S).cast("long"),
            )
        ).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    later_start = F.greatest(F.col("a.start_sec"), F.col("b.start_sec"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.start_sec") <= F.col("b.end_sec"))
            & (F.col("b.start_sec") <= F.col("a.end_sec"))
            & (
                F.col("a.bucket")
                == (later_start / _BUCKET_S).cast("long")
            ),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_id").alias("session_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_id").alias("session_b"),
            (
                F.least(F.col("a.end_sec"), F.col("b.end_sec")) - later_start
            ).alias("overlap_sec"),
        )
    )


#: resample grain (seconds) — six hours.
_RESAMPLE_S = 21600


@query(
    "ts_resample",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events
    ),
    b AS (
      SELECT user_id, value,
             ts_sec // {_RESAMPLE_S} * {_RESAMPLE_S} AS bucket_start,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                ts_sec // {_RESAMPLE_S}
                                ORDER BY ts_sec, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                ts_sec // {_RESAMPLE_S}
                                ORDER BY ts_sec DESC, event_id DESC) AS rrn
      FROM e
    )
    SELECT user_id, bucket_start,
           COUNT(*) AS n_events,
           MIN(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rrn = 1 THEN value END) AS close,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100 AS total
    FROM b GROUP BY user_id, bucket_start
    """,
)
def ts_resample(spark, sf_dir):
    """Downsample the irregular event stream to a fixed grain with
    OHLC semantics (open/high/low/close per 6-hour bucket per user) —
    the `time_bucket` + `first`/`last` rollup of a hypertable
    continuous aggregate.

    Open/close are pinned by explicit row_number over (ts, event_id)
    — engine-native first/arg_min functions break ties arbitrarily
    and can never hash-match across engines. One exchange total: both
    window orders share the (user_id, bucket) hash partitioning, and
    the final aggregation's required clustering is satisfied by it
    (the sessionize_batch pattern). At 100 TB the partition key is
    (user, bucket) — finer and better-distributed than user alone.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("ts_sec"),
    )
    bucket = (F.col("ts_sec") / _RESAMPLE_S).cast("long") * _RESAMPLE_S
    b = e.withColumn("bucket_start", bucket)
    wa = Window.partitionBy("user_id", "bucket_start").orderBy(
        "ts_sec", "event_id"
    )
    wd = Window.partitionBy("user_id", "bucket_start").orderBy(
        F.col("ts_sec").desc(), F.col("event_id").desc()
    )
    b = b.select(
        "user_id",
        "bucket_start",
        "value",
        F.row_number().over(wa).alias("rn"),
        F.row_number().over(wd).alias("rrn"),
    )
    return b.groupBy("user_id", "bucket_start").agg(
        F.count("*").alias("n_events"),
        F.min(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rrn") == 1, F.col("value"))).alias("close"),
        # order-free integer-cents sum (value is on a 2-dp grid), one
        # IEEE division — SUM over raw doubles then ROUND was the
        # partition-order flake class this file pins everywhere else
        (
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("double")
            / 100
        ).alias("total"),
    )


@query(
    "ts_anomaly",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(FLOOR(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                             AS BIGINT) * 100.0 / COUNT(*) + 0.5) AS BIGINT)
                 AS obs_i
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    m AS (
      SELECT user_id, day, obs_i,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             SUM(obs_i) OVER (PARTITION BY user_id) AS s1,
             SUM(CAST(obs_i AS HUGEINT) * obs_i)
                 OVER (PARTITION BY user_id) AS s2
      FROM daily
    ),
    z AS (
      SELECT user_id, day, obs_i,
             CAST(n AS DOUBLE) AS dn,
             CAST(n*s2 - s1*s1 AS DOUBLE) AS vn,
             CAST(s1 AS DOUBLE) AS ds1
      FROM m WHERE n > 1
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           CAST(obs_i AS DOUBLE) / 10000 AS obs,
           floor((CAST(obs_i AS DOUBLE) - ds1 / dn)
                 / sqrt(vn / (dn*(dn-1))) * 10000 + 0.5) / 10000 AS zscore
    FROM z
    WHERE vn > 0
      AND ABS(floor((CAST(obs_i AS DOUBLE) - ds1 / dn)
                    / sqrt(vn / (dn*(dn-1))) * 10000 + 0.5) / 10000) > 2
    """,
)
def ts_anomaly(spark, sf_dir):
    """Per-user z-score outlier days over the daily series — the
    cheap first-line anomaly screen on regularized telemetry (flag
    days more than 2 sigma from the user's own mean).

    One exchange: the per-user moment sums ride unordered windows
    over the same user_id partitioning the daily rollup shuffled to.
    Mean and stddev come from EXACT integer moment sums over the
    1e-4-pinned daily values (AVG/STDDEV over raw doubles merge in
    partition order — the cross-engine flake class), so the z
    expression runs once per row on bit-identical operands in both
    engines; floor-pinned, with the 2-sigma cut applied to the pinned
    value so it cannot flicker.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.floor(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            * 100.0
            / F.count("*")
            + 0.5
        )
        .cast("long")
        .alias("obs_i")
    )
    wu = Window.partitionBy("user_id")
    m = daily.select(
        "user_id",
        "day",
        "obs_i",
        F.count("*").over(wu).alias("n"),
        F.sum("obs_i").over(wu).alias("s1"),
        F.sum(F.col("obs_i").cast("decimal(38,0)") * F.col("obs_i"))
        .over(wu)
        .alias("s2"),
    )
    z = m.filter(F.col("n") > 1).select(
        "user_id",
        "day",
        "obs_i",
        F.col("n").cast("double").alias("dn"),
        (
            F.col("n").cast("decimal(38,0)") * F.col("s2")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        )
        .cast("double")
        .alias("vn"),
        F.col("s1").cast("double").alias("ds1"),
    )
    zscore = (
        F.floor(
            (F.col("obs_i").cast("double") - F.col("ds1") / F.col("dn"))
            / F.sqrt(F.col("vn") / (F.col("dn") * (F.col("dn") - 1)))
            * 10_000
            + 0.5
        )
        / 10_000
    )
    return (
        z.filter(F.col("vn") > 0)
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            (F.col("obs_i").cast("double") / 10_000).alias("obs"),
            zscore.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2)
    )


@query(
    "ts_pattern_match",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events
    ),
    m AS (
      SELECT *, CASE WHEN value > LAG(value)
                       OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
                     THEN 0 ELSE 1 END AS head
      FROM e
    ),
    r AS (
      SELECT *, SUM(head) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
               AS rn
      FROM m
    ),
    runs AS (
      SELECT user_id, run_id,
             COUNT(*) AS run_len,
             MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec,
             MIN(CASE WHEN rn = rn_min THEN value END) AS start_value,
             MIN(CASE WHEN rn = rn_max THEN value END) AS end_value
      FROM (SELECT *, MIN(rn) OVER (PARTITION BY user_id, run_id) AS rn_min,
                      MAX(rn) OVER (PARTITION BY user_id, run_id) AS rn_max
            FROM r)
      GROUP BY user_id, run_id
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, run_len,
           start_sec, end_sec,
           ROUND(end_value - start_value, 2) AS total_gain
    FROM runs WHERE run_len >= 4
    """,
)
def ts_pattern_match(spark, sf_dir):
    """Sequential pattern detection (MATCH_RECOGNIZE-lite): maximal
    runs of strictly-increasing values per user, reported when the
    run has at least 3 increases — the rising-streak pattern of a
    monitoring rule, expressed with the lag/gap-and-island algebra
    instead of an NFA.

    Everything partitions on user_id: one exchange feeds the lag
    flag, the run-id cumsum, the run-extent windows, and the final
    per-run aggregation (all requiring the same clustering). Run
    endpoints are pinned by explicit row numbers (the ts_resample
    rule); gains compare 2-decimal inputs so ROUND(...,2) is stable.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value",
        F.unix_timestamp("ts").alias("ts_sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    m = e.withColumn(
        "head",
        F.when(F.col("value") > F.lag("value").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("run_id", F.sum("head").over(cum)).withColumn(
        "rn", F.row_number().over(w)
    )
    wr = Window.partitionBy("user_id", "run_id")
    r = m.withColumn("rn_min", F.min("rn").over(wr)).withColumn(
        "rn_max", F.max("rn").over(wr)
    )
    runs = r.groupBy("user_id", "run_id").agg(
        F.count("*").alias("run_len"),
        F.min("ts_sec").alias("start_sec"),
        F.max("ts_sec").alias("end_sec"),
        F.min(F.when(F.col("rn") == F.col("rn_min"), F.col("value"))).alias(
            "sv"
        ),
        F.min(F.when(F.col("rn") == F.col("rn_max"), F.col("value"))).alias(
            "ev"
        ),
    )
    return runs.filter(F.col("run_len") >= 4).select(
        "user_id",
        F.col("run_id").cast("long").alias("run_id"),
        "run_len",
        "start_sec",
        "end_sec",
        F.round(F.col("ev") - F.col("sv"), 2).alias("total_gain"),
    )


@query(
    "ts_ewma",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    per AS (
        SELECT user_id,
               list_sort(list(struct_pack(day := day, cents := cents))) AS a
        FROM daily GROUP BY user_id
    ),
    expanded AS (
        SELECT user_id,
               unnest(list_transform(generate_series(1, len(a)), i -> {
                   'day': a[i].day,
                   'amount': CAST(a[i].cents AS DOUBLE) / 100.0,
                   'ewma6': floor(list_reduce(
                       list_transform(list_slice(a, 1, i),
                                      s -> CAST(s.cents AS DOUBLE) / 100.0),
                       (acc, x) -> CAST(acc * 0.75 + x * 0.25 AS DOUBLE))
                       * 1000000 + 0.5) / 1000000
               })) AS r
        FROM per
    )
    SELECT user_id, r.day AS day, r.amount AS amount, r.ewma6 AS ewma6
    FROM expanded
    """,
)
def ts_ewma(spark, sf_dir):
    """Running exponentially-weighted moving average (α = 0.25) over
    each user's daily spend series.

    EWMA is recursive, so no window frame expresses it; instead each
    user's (bounded: one row per calendar day) series folds left with
    higher-order array lambdas — s₁ = x₁, sᵢ = 0.75·sᵢ₋₁ + 0.25·xᵢ.
    Determinism: daily totals are exact scaled-BIGINT cents; α = 1/4
    and 1−α = 3/4 are exact binary fractions, so every fold step is a
    single IEEE operation both engines execute identically in the
    same left-to-right order — the result is bitwise cross-engine
    stable before the final 6-dp floor-pin. One shuffle (user_id);
    per-user state is days-per-user, calendar-bounded — the same
    contract as the gap-fill key, safe at any fact scale.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    per = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("a")
    )
    vals = F.transform("a", lambda s: s["cents"].cast("double") / 100.0)
    per = per.select("user_id", "a", vals.alias("v"))
    rows = F.transform(
        F.sequence(F.lit(1), F.size("a")),
        lambda i: F.struct(
            F.element_at("a", i)["day"].alias("day"),
            F.element_at("v", i).alias("amount"),
            (
                F.floor(
                    F.aggregate(
                        F.slice("v", 2, i - 1),
                        F.element_at("v", 1),
                        lambda acc, x: acc * 0.75 + x * 0.25,
                    )
                    * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("ewma6"),
        ),
    )
    return per.select("user_id", F.explode(rows).alias("r")).select(
        "user_id",
        F.col("r.day").alias("day"),
        F.col("r.amount").alias("amount"),
        F.col("r.ewma6").alias("ewma6"),
    )


@query(
    "ts_cusum",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    k AS (
        SELECT CAST(SUM(cents) * 12 // (COUNT(*) * 10) AS BIGINT) AS drift
        FROM daily
    ),
    per AS (
        SELECT user_id,
               list_sort(list(struct_pack(day := day, cents := cents))) AS a
        FROM daily GROUP BY user_id
    ),
    expanded AS (
        SELECT user_id, k.drift,
               unnest(list_transform(generate_series(1, len(a)), i -> {
                   'day': a[i].day,
                   'cents': a[i].cents,
                   'cusum': list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(list_slice(a, 1, i),
                                          s -> s.cents)),
                       (acc, x) -> GREATEST(acc + x - k.drift,
                                            CAST(0 AS BIGINT)))
               })) AS r
        FROM per CROSS JOIN k
    )
    SELECT user_id, r.day AS day, CAST(r.cents AS BIGINT) AS cents,
           CAST(r.cusum AS BIGINT) AS cusum_cents,
           r.cusum > 3 * drift AS alarm
    FROM expanded
    """,
)
def ts_cusum(spark, sf_dir):
    """CUSUM⁺ change-point detection per user: sᵢ = max(0, sᵢ₋₁ + xᵢ − k)
    over daily spend, alarming when the statistic exceeds 3k — the
    classic drift detector for data-quality monitoring on ingest
    pipelines.

    Recursive like EWMA, so it uses the same left-fold array-lambda
    shape — but the entire computation is INTEGER arithmetic (cents,
    integer drift allowance from a 1-row floor-division aggregate,
    GREATEST), so the key is exact with no float pinning at all. One
    user_id shuffle; per-user fold arrays calendar-bounded.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    k = daily.agg(
        F.expr("CAST(SUM(cents) * 12 DIV (COUNT(*) * 10) AS BIGINT)").alias(
            "drift"
        )
    )
    per = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("a")
    ).join(F.broadcast(k))
    zero = F.lit(0).cast("long")
    rows = F.transform(
        F.sequence(F.lit(1), F.size("a")),
        lambda i: F.struct(
            F.element_at("a", i)["day"].alias("day"),
            F.element_at("a", i)["cents"].alias("cents"),
            F.aggregate(
                F.transform(F.slice("a", 1, i), lambda s: s["cents"]),
                zero,
                lambda acc, x: F.greatest(acc + x - F.col("drift"), zero),
            ).alias("cusum"),
        ),
    )
    return per.select(
        "user_id", "drift", F.explode(rows).alias("r")
    ).select(
        "user_id",
        F.col("r.day").alias("day"),
        F.col("r.cents").alias("cents"),
        F.col("r.cusum").alias("cusum_cents"),
        (F.col("r.cusum") > 3 * F.col("drift")).alias("alarm"),
    )


@query(
    "ts_seasonal_dow",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    seasonal AS (
        SELECT dow,
               floor(SUM(cents) * 100.0 / COUNT(*) + 0.5) / 10000
                   AS dow_mean4
        FROM daily GROUP BY dow
    )
    SELECT d.day, d.dow, CAST(d.cents AS DOUBLE) / 100 AS amount,
           s.dow_mean4,
           floor((CAST(d.cents AS DOUBLE) / 100 - s.dow_mean4) * 10000 + 0.5)
               / 10000 AS residual4
    FROM daily d JOIN seasonal s ON s.dow = d.dow
    """,
)
def ts_seasonal_dow(spark, sf_dir):
    """Seasonal-naive decomposition: corpus-wide daily totals split
    into a day-of-week seasonal component (per-weekday mean) and a
    residual — the first-line screen that separates "Mondays are
    always low" from a real anomaly (contrast ``ts_anomaly``'s
    per-user z-score, which this complements at corpus grain).

    Two tiny aggregates: facts collapse to one row per calendar day,
    the seasonal table is 7 rows broadcast back onto them. Exact
    integer cents throughout; the per-weekday mean and residual use
    the floor-form pin. Weekday numbering is pinned to Spark's
    1=Sunday convention (DuckDB's 0-based dayofweek is +1'd in the
    oracle, same as fn_interval).
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek("ts").cast("long").alias("dow"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    seasonal = daily.groupBy("dow").agg(
        (
            F.floor(F.sum("cents") * 100.0 / F.count("*") + 0.5) / 10_000
        ).alias("dow_mean4")
    )
    amount = F.col("cents").cast("double") / 100
    return daily.join(F.broadcast(seasonal), "dow").select(
        "day",
        "dow",
        amount.alias("amount"),
        "dow_mean4",
        (
            F.floor((amount - F.col("dow_mean4")) * 10_000 + 0.5) / 10_000
        ).alias("residual4"),
    )


@query(
    "ts_autocorr",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
    ),
    ks AS (SELECT unnest([1, 7]) AS k),
    pairs AS (
        SELECT ks.k, a.cents AS x, b.cents AS y
        FROM ks
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + CAST(ks.k || ' days' AS INTERVAL)
    ),
    moms AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM pairs GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS k, n AS n_pairs,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy))
                 * 1000000 + 0.5) / 1000000 AS autocorr6
    FROM moms
    """,
)
def ts_autocorr(spark, sf_dir):
    """Lag-k autocorrelation (k = 1 and 7 days) of the corpus-wide
    daily spend series — the seasonality detector that says whether
    ``ts_seasonal_dow``'s weekly component is real.

    The lag alignment is an EQUI-join on day = day + k (never a
    global-order window), so it distributes like any join; Pearson r
    is assembled from exact integer moment sums. Products of two
    daily cent totals are ~9e17 at sf1 and grow with SF², so the
    quadratic moments widen to decimal(38,0) BEFORE multiplying
    (Spark) / HUGEINT (DuckDB) — the same overflow class agg_moments
    fixed. The final normalization casts each widened sum to double
    once (not exact past 2⁵³, but both engines perform the identical
    cast-then-IEEE-expression, so outputs stay bit-equal) and the
    result is floor-pinned to 6 decimals.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7))).alias("k")
    )
    a = daily.select(F.col("day").alias("a_day"), F.col("cents").alias("x"))
    b = daily.select(F.col("day").alias("b_day"), F.col("cents").alias("y"))
    pairs = (
        ks.crossJoin(a)
        .join(b, F.col("b_day") == F.expr("date_add(a_day, k)"))
        .select("k", "x", "y")
    )
    moms = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        # widen BEFORE multiplying: daily-total products overflow int64
        # around sf10 (totals grow ∝ SF, products ∝ SF²)
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    return moms.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").alias("n_pairs"),
        (
            F.floor(
                (
                    nd * F.col("sxy").cast("double")
                    - F.col("sx").cast("double") * F.col("sy")
                )
                / F.sqrt(
                    (
                        nd * F.col("sxx").cast("double")
                        - F.col("sx").cast("double") * F.col("sx")
                    )
                    * (
                        nd * F.col("syy").cast("double")
                        - F.col("sy").cast("double") * F.col("sy")
                    )
                )
                * 1_000_000
                + 0.5
            )
            / 1_000_000
        ).alias("autocorr6"),
    )


_LTTB_S = 172_800  # 2-day buckets over the 30-day fixture window
_LTTB_BASE = 1_704_067_200  # epoch of 2024-01-01, the fixture origin


@query(
    "ts_lttb",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) - {_LTTB_BASE} AS t,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
      FROM events
    ),
    p AS (SELECT *, t // {_LTTB_S} AS bucket FROM e),
    s AS (
      SELECT user_id, bucket,
             SUM(t) AS st, SUM(c) AS sc, COUNT(*) AS n
      FROM p GROUP BY user_id, bucket
    ),
    nb AS (
      SELECT user_id, bucket,
             lag(st)  OVER w AS pt, lag(sc)  OVER w AS pc,
             lag(n)   OVER w AS pn,
             lead(st) OVER w AS nt, lead(sc) OVER w AS nc,
             lead(n)  OVER w AS nn
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
    ),
    cand AS (
      SELECT p.user_id, p.bucket, p.t, p.c, p.event_id,
             COALESCE(abs(
               (pt::HUGEINT * nn - nt::HUGEINT * pn)
                 * (p.c::HUGEINT * nn - nc)
               - (pc::HUGEINT * nn - nc::HUGEINT * pn)
                 * (p.t::HUGEINT * nn - nt)
             ), -1::HUGEINT) AS area
      FROM p JOIN nb USING (user_id, bucket)
    )
    SELECT user_id,
           bucket * {_LTTB_S} + {_LTTB_BASE} AS bucket_start,
           t + {_LTTB_BASE} AS ts_sec, event_id,
           CAST(c AS DOUBLE) / 100 AS value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, bucket
        ORDER BY area DESC, t, event_id) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
)
def ts_lttb(spark, sf_dir):
    """Largest-Triangle downsampling (Steinarsson's LTTB, the Grafana/
    monitoring decimation standard) in its bucket-mean-anchor form:
    per (series, bucket) keep the ONE point maximizing the triangle
    area spanned with the previous and next buckets' mean points — the
    envelope-preserving alternative to OHLC resampling (`ts_resample`
    keeps aggregates; this keeps actual points).

    Determinism: the area argmax is the trap — areas are products of
    coordinates, and a double-precision argmax can flip on an ulp
    cross-engine. Every coordinate is pinned to integers (ts seconds
    rebased to the fixture origin, values to cents) and the
    mean-anchor area is multiplied through by the neighbor counts, so
    the comparison is |(ΣTp·n₂ − ΣTn·n₁)(c·n₂ − ΣCn) − (ΣCp·n₂ −
    ΣCn·n₁)(t·n₂ − ΣTn)| — exact DECIMAL(38,0) on the Spark side,
    HUGEINT in DuckDB, bit-identical ordering. Edge buckets (no prev
    or next) take the earliest point (area −1 ties broken on t,
    event_id). Bucketing is integer division that TRUNCATES TOWARD
    ZERO on both engines: Spark's `div` and DuckDB's integer `//`
    share that semantics (verified live: `(-7)//2 = -3`, `-1//S = 0`
    in DuckDB), so pre-origin timestamps bucket identically with no
    guard needed. (The r7 ADVICE claimed `//` floors — it does not
    for integers; a floor-division rewrite on the Spark side would
    have CREATED the divergence it feared. tests/test_analytics.py
    pins the truncation parity against a live DuckDB probe.)

    Scale shape: bucket stats partial-aggregate on (user, bucket); the
    lag/lead window and the argmax window both run on user-keyed
    partitionings; the stats join is co-partitioned. Nothing global,
    nothing driver-side.
    """
    e = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_id",
        f"CAST(unix_timestamp(ts) AS BIGINT) - {_LTTB_BASE} AS t",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c",
    )
    p = e.selectExpr("*", f"t div {_LTTB_S} AS bucket")
    s = p.groupBy("user_id", "bucket").agg(
        F.sum("t").alias("st"), F.sum("c").alias("sc"),
        F.count("*").alias("n"),
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    nb = s.select(
        "user_id",
        "bucket",
        F.lag("st").over(w).alias("pt"),
        F.lag("sc").over(w).alias("pc"),
        F.lag("n").over(w).alias("pn"),
        F.lead("st").over(w).alias("nt"),
        F.lead("sc").over(w).alias("nc"),
        F.lead("n").over(w).alias("nn"),
    )
    dec = "CAST({} AS DECIMAL(19,0))"
    d = dec.format
    # a NULL area from decimal overflow must FAIL LOUDLY, not be
    # conflated with the edge-bucket -1 sentinel (review finding r7):
    # only missing neighbors take the sentinel; an overflowed product
    # raises via assert_true, mirroring DuckDB's loud HUGEINT overflow
    cand = (
        p.join(nb, ["user_id", "bucket"])
        .selectExpr(
            "user_id", "bucket", "t", "c", "event_id", "pn", "nn",
            f"""abs(
              ({d('pt')} * nn - {d('nt')} * pn)
                * ({d('c')} * nn - nc)
              - ({d('pc')} * nn - {d('nc')} * pn)
                * ({d('t')} * nn - nt)) AS area_raw""",
        )
        .selectExpr(
            "user_id", "bucket", "t", "c", "event_id",
            """CASE
                 WHEN pn IS NULL OR nn IS NULL
                   THEN CAST(-1 AS DECIMAL(38,0))
                 WHEN area_raw IS NULL THEN CAST(assert_true(
                   false, 'ts_lttb: exact area overflowed DECIMAL(38,0)')
                   AS DECIMAL(38,0))
                 ELSE area_raw
               END AS area""",
        )
    )
    wr = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("area").desc(), "t", "event_id"
    )
    return (
        cand.withColumn("rn", F.row_number().over(wr))
        .filter("rn = 1")
        .selectExpr(
            "user_id",
            f"bucket * {_LTTB_S} + {_LTTB_BASE} AS bucket_start",
            f"t + {_LTTB_BASE} AS ts_sec",
            "event_id",
            "CAST(c AS DOUBLE) / 100 AS value",
        )
    )


@query(
    "ts_holt",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    per AS (
        SELECT user_id,
               list_sort(list(struct_pack(day := day, cents := cents))) AS a
        FROM daily GROUP BY user_id
    ),
    expanded AS (
        SELECT user_id,
               unnest(list_transform(generate_series(1, len(a)), i -> {
                   'day': a[i].day,
                   'amount': CAST(a[i].cents AS DOUBLE) / 100.0,
                   'st': list_reduce(
                       list_transform(
                           list_slice(a, 1, i),
                           s -> [CAST(s.cents AS DOUBLE) / 100.0, 0.0]),
                       (acc, x) -> [
                           x[1] * 0.25 + (acc[1] + acc[2]) * 0.75,
                           (x[1] * 0.25 + (acc[1] + acc[2]) * 0.75
                            - acc[1]) * 0.5 + acc[2] * 0.5])
               })) AS r
        FROM per
    )
    SELECT user_id, r.day AS day, r.amount AS amount,
           floor(r.st[1] * 1000000 + 0.5) / 1000000 AS level6,
           floor(r.st[2] * 1000000 + 0.5) / 1000000 AS trend6,
           floor((r.st[1] + r.st[2]) * 1000000 + 0.5) / 1000000
               AS forecast6
    FROM expanded
    """,
)
def ts_holt(spark, sf_dir):
    """Holt double exponential smoothing (level + linear trend,
    α = 1/4, β = 1/2) over each user's daily spend series, with the
    one-step-ahead forecast l + b — the trend-aware upgrade of the
    `ts_ewma` key that flat EWMA cannot express.

    Both recursions are coupled (bᵢ needs lᵢ AND lᵢ₋₁), so the state
    folds as a (level, trend) pair through higher-order array
    lambdas: s₁ = (x₁, 0); lᵢ = α·xᵢ + (1−α)(lᵢ₋₁+bᵢ₋₁),
    bᵢ = β(lᵢ−lᵢ₋₁) + (1−β)bᵢ₋₁. The ORACLE's fold state is a
    2-element DOUBLE list, not a struct: DuckDB 1.0.0's list_reduce
    miscomputes struct-typed accumulators (probed live — prefix folds
    returned internally inconsistent values), while list-typed state
    folds exactly; the Spark side keeps the struct accumulator, and
    the cross-engine hash match is the proof both compute the same
    recursion. Determinism mirrors ts_ewma: daily
    totals are exact scaled-BIGINT cents; α, 1−α, β are exact binary
    fractions; both engines evaluate the identically-parenthesized
    expression left-to-right, so every fold step is the same IEEE
    sequence — bitwise cross-engine stable before the 6-dp floor-pin.

    One shuffle (user_id); per-user state is days-per-user,
    calendar-bounded — the same scale contract as ts_ewma/ts_gapfill.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    per = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("a")
    )
    vals = F.transform("a", lambda s: s["cents"].cast("double") / 100.0)
    per = per.select("user_id", "a", vals.alias("v"))

    def step(acc, x):
        lnew = x * 0.25 + (acc["l"] + acc["b"]) * 0.75
        bnew = (
            x * 0.25 + (acc["l"] + acc["b"]) * 0.75 - acc["l"]
        ) * 0.5 + acc["b"] * 0.5
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    def pin6(c):
        return F.floor(c * 1_000_000 + 0.5) / 1_000_000

    rows = F.transform(
        F.sequence(F.lit(1), F.size("a")),
        lambda i: F.struct(
            F.element_at("a", i)["day"].alias("day"),
            F.element_at("v", i).alias("amount"),
            F.aggregate(
                F.slice("v", 2, i - 1),
                F.struct(
                    F.element_at("v", 1).alias("l"),
                    F.lit(0.0).alias("b"),
                ),
                step,
            ).alias("st"),
        ),
    )
    return per.select("user_id", F.explode(rows).alias("r")).select(
        "user_id",
        F.col("r.day").alias("day"),
        F.col("r.amount").alias("amount"),
        pin6(F.col("r.st.l")).alias("level6"),
        pin6(F.col("r.st.b")).alias("trend6"),
        pin6(F.col("r.st.l") + F.col("r.st.b")).alias("forecast6"),
    )


@query(
    "ts_stl_lite",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    tr AS (
        SELECT user_id, day, cents,
               CAST(floor(
                   CAST(SUM(cents * 10000) OVER w AS DOUBLE)
                   / COUNT(*) OVER w + 0.5) AS BIGINT) AS trend_micro
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT user_id, day, cents, trend_micro,
               cents * 10000 - trend_micro AS det_micro,
               CAST(dayofweek(day) AS BIGINT) AS dow
        FROM tr
    ),
    sea AS (
        SELECT user_id, dow,
               CAST(floor(
                   CAST(SUM(det_micro) AS DOUBLE) / COUNT(*) + 0.5)
                   AS BIGINT) AS seasonal_micro
        FROM det GROUP BY user_id, dow
    )
    SELECT d.user_id, d.day,
           CAST(d.cents AS DOUBLE) / 100.0 AS amount,
           d.trend_micro, s.seasonal_micro,
           CAST(d.det_micro - s.seasonal_micro AS BIGINT)
               AS residual_micro
    FROM det d JOIN sea s ON s.user_id = d.user_id AND s.dow = d.dow
    """,
)
def ts_stl_lite(spark, sf_dir):
    """STL-style decomposition (trend + day-of-week seasonal +
    residual) of each user's daily spend — the classic series
    triage: trend = centered 7-row moving average, seasonal = mean
    DETRENDED value per weekday (upgrading `ts_seasonal_dow`, which
    averages raw values and lets trend leak into the weekday
    profile), residual = what neither explains.

    Exactness contract: components live in integer MICRO-units.
    Daily totals are exact BIGINT cents; the only float operations
    are TWO single divisions (frame mean, weekday mean), each
    immediately floor-pinned to an integer — so every downstream
    subtraction is exact BIGINT arithmetic and the additive identity
    amount·10⁶ = trend + seasonal + residual holds EXACTLY, row for
    row, on both engines (pytest-pinned). No double is ever summed
    across rows.

    Scale shape: one shuffle (user_id) shared by the window and the
    weekday aggregate; per-user state is calendar-bounded days — the
    ts_ewma/ts_gapfill contract. Edge rows average over their
    available frame (ROW frame, documented definition).
    """
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias(
            "cents"
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.withColumn(
        "trend_micro",
        F.floor(
            (F.sum(F.col("cents") * 10000).over(w)).cast("double")
            / F.count("*").over(w)
            + 0.5
        ).cast("long"),
    )
    det = tr.select(
        "user_id",
        "day",
        "cents",
        "trend_micro",
        (F.col("cents") * 10000 - F.col("trend_micro")).alias(
            "det_micro"
        ),
        F.dayofweek("day").cast("long").alias("dow"),
    )
    sea = det.groupBy("user_id", "dow").agg(
        F.floor(
            F.sum("det_micro").cast("double") / F.count("*") + 0.5
        )
        .cast("long")
        .alias("seasonal_micro")
    )
    return det.join(sea, ["user_id", "dow"]).select(
        "user_id",
        "day",
        (F.col("cents").cast("double") / 100.0).alias("amount"),
        "trend_micro",
        "seasonal_micro",
        (F.col("det_micro") - F.col("seasonal_micro"))
        .cast("long")
        .alias("residual_micro"),
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS bar,
             ts, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    rn AS (
      SELECT event_type, bar, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM e
    ),
    o AS (
      SELECT event_type, bar,
             MAX(CASE WHEN rf = 1 THEN value END) AS open_v,
             MAX(CASE WHEN rl = 1 THEN value END) AS close_v,
             MIN(value) AS low_v, MAX(value) AS high_v,
             COUNT(*) AS n_events
      FROM rn GROUP BY event_type, bar
    )
    SELECT event_type, bar,
           CAST(FLOOR(open_v  * 100 + 0.5) AS BIGINT) AS open_c,
           CAST(FLOOR(high_v  * 100 + 0.5) AS BIGINT) AS high_c,
           CAST(FLOOR(low_v   * 100 + 0.5) AS BIGINT) AS low_c,
           CAST(FLOOR(close_v * 100 + 0.5) AS BIGINT) AS close_c,
           CAST(n_events AS BIGINT) AS n_events
    FROM o
    """,
)
def ts_ohlc_bars(spark, sf_dir):
    """Hourly OHLC (open/high/low/close) bar downsampling per event
    type — the financial-tick / metrics-rollup resampler the ts_*
    family lacked (ts_resample aggregates sums; OHLC needs ORDERED
    endpoints). Open and close are selected by `min_by`/`max_by` over
    the TOTAL order (ts, event_id) — the event-id tie-break pins
    concurrent same-timestamp ticks, the classic OHLC
    nondeterminism — and prices surface cents-scaled (the exact.py
    fixed-point output convention).

    Scale shape: single groupBy — min_by/max_by carry ONE (key,
    value) pair per group through the partial aggregation, so the
    shuffle holds |types|·|bars| tiny states, never the ticks. This
    is the map-side-combining OHLC shape; the window-function
    alternative (first/last over a sorted frame) would sort every
    partition's full tick stream instead.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    bars = (
        e.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bar"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "bar")
        .agg(
            F.min_by("value", ordk).alias("open_v"),
            F.max_by("value", ordk).alias("close_v"),
            F.min("value").alias("low_v"),
            F.max("value").alias("high_v"),
            F.count("*").alias("n_events"),
        )
    )
    c = lambda col: F.floor(F.col(col) * 100 + 0.5).cast("long")  # noqa: E731
    return bars.select(
        "event_type",
        "bar",
        c("open_v").alias("open_c"),
        c("high_v").alias("high_c"),
        c("low_v").alias("low_c"),
        c("close_v").alias("close_c"),
        "n_events",
    )


_TAU = 6.283185307179586  # pinned 2π literal — both engines parse the
# same double; never engine pi() (one ulp there shifts every angle)
_FOURIER_K = 8


@query(
    "ts_fourier_power",
    oracle=f"""
    WITH x AS (
      SELECT event_type,
             datediff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS idx,
             COUNT(*) AS x
      FROM events GROUP BY event_type, idx
    ),
    g AS (SELECT MIN(idx) AS mn, MAX(idx) - MIN(idx) + 1 AS n FROM x),
    terms AS (
      SELECT event_type, k,
             CAST(FLOOR(x * cos({_TAU} * k * (idx - mn) / n)
                        * 1000000 + 0.5) AS BIGINT) AS c6,
             CAST(FLOOR(x * sin({_TAU} * k * (idx - mn) / n)
                        * 1000000 + 0.5) AS BIGINT) AS s6
      FROM x CROSS JOIN g
      CROSS JOIN (SELECT unnest(generate_series(1, {_FOURIER_K})) AS k) ks
    ),
    agg AS (
      SELECT event_type, k, SUM(c6) AS sc6, SUM(s6) AS ss6
      FROM terms GROUP BY event_type, k
    )
    SELECT event_type, CAST(k AS BIGINT) AS k,
           CAST(sc6 AS BIGINT) AS sc6, CAST(ss6 AS BIGINT) AS ss6,
           ROUND((CAST(sc6 AS DOUBLE) / 1000000)
                 * (CAST(sc6 AS DOUBLE) / 1000000)
                 + (CAST(ss6 AS DOUBLE) / 1000000)
                 * (CAST(ss6 AS DOUBLE) / 1000000), 6) AS power
    FROM agg
    """,
)
def ts_fourier_power(spark, sf_dir):
    """Periodogram of the hourly event-rate series per event type —
    the DFT power at the first {_FOURIER_K} frequencies, the spectral
    seasonality detector next to `ts_seasonal_dow`'s calendar prior
    (Schuster's periodogram; a daily cycle shows as a peak at
    k = N/24 hours). The series is the DENSE hourly grid, but zero
    hours contribute nothing to Σ x_t·cos/sin, so the aggregation
    runs over OBSERVED (type, hour) counts only — no gap-fill join,
    the zeros are free.

    Exactness contract (the ts-family micro-unit convention): angles
    derive from a PINNED 2π literal (never engine pi()), each term is
    floored to 1e-6 fixed point so the cross-partition sum is an
    exact BIGINT, and the reported power is one identical IEEE
    expression over the two integer sums, ROUND(6). The cos/sin call
    itself is the one libm dependency — both engines' doubles agreed
    on every fixture angle (the ln() precedent from llm_bigram_lm).

    Scale shape: one groupBy to hourly counts (map-side combined),
    a 1-row global-extent broadcast, an 8-way frequency explode of
    the SMALL hourly table, one more bounded groupBy — the corpus is
    touched once; everything after is |types|·|hours|·k rows.
    """
    ev = load(spark, sf_dir, "events")
    x = (
        ev.select(
            "event_type",
            F.expr(
                "timestampdiff(HOUR,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("idx"),
        )
        .groupBy("event_type", "idx")
        .agg(F.count("*").alias("x"))
    )
    g = x.agg(
        F.min("idx").alias("mn"),
        (F.max("idx") - F.min("idx") + 1).alias("n"),
    )
    th = (
        F.lit(_TAU)
        * F.col("k")
        * (F.col("idx") - F.col("mn"))
        / F.col("n")
    )
    terms = (
        x.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.lit(1), F.lit(_FOURIER_K))
            ).alias("k"),
            "x",
            "idx",
            "mn",
            "n",
        )
        .select(
            "event_type",
            "k",
            F.floor(F.col("x") * F.cos(th) * 1_000_000 + 0.5)
            .cast("long")
            .alias("c6"),
            F.floor(F.col("x") * F.sin(th) * 1_000_000 + 0.5)
            .cast("long")
            .alias("s6"),
        )
    )
    agg = terms.groupBy("event_type", "k").agg(
        F.sum("c6").alias("sc6"), F.sum("s6").alias("ss6")
    )
    power = F.round(
        (F.col("sc6").cast("double") / 1_000_000)
        * (F.col("sc6").cast("double") / 1_000_000)
        + (F.col("ss6").cast("double") / 1_000_000)
        * (F.col("ss6").cast("double") / 1_000_000),
        6,
    )
    return agg.select(
        "event_type",
        F.col("k").cast("long").alias("k"),
        F.col("sc6").cast("long").alias("sc6"),
        F.col("ss6").cast("long").alias("ss6"),
        power.alias("power"),
    )
