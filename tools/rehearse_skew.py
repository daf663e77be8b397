"""Skew rehearsal: measure every skew guard against a zipfian fixture
(VERDICT r6 ask #2 — the guards were reasoned, never measured).

Runs each skew-sensitive key twice — on uniform sf0.1 and on the
zipfian twin from ``tools/make_skewed.py`` (same row counts, same
schemas, only the key-frequency distributions differ) — and reports
the wall ratio, rows, and memory peaks. A guard that works costs a
bounded constant factor under skew; an unguarded hot key shows up as
a superlinear blowout (one straggler task owning ~18% of the rows).

The gate: skew wall <= GATE x uniform wall (default 4.0 — a hot key
concentrates reads/aggregation state, so some cost is real; a missing
guard costs far more than 4x at this skew). Exit code 1 if any key
exceeds the gate, so the rehearsal can run in CI fashion.

Usage: python tools/make_skewed.py /tmp/sfskew && \
       python tools/rehearse_skew.py [/tmp/sfskew] [key ...]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNIFORM = os.environ.get("SKEW_UNIFORM", "/root/testdata/sf0.1")
GATE = float(os.environ.get("SKEW_GATE", "4.0"))

#: key -> the guard the zipfian fixture exercises
DEFAULT_KEYS = {
    "join_salted": "salted shuffle spreads the ~18%-hot l_suppkey over 8 salts",
    "agg_heavy_hitters": "integer-exact threshold over zipfian l_partkey counts",
    "llm_inverted_index": "df band applied BEFORE posting arrays (stopword skew)",
    "llm_bm25": "df-banded postings under stopword-like hot terms",
    "llm_containment": "corpus-relative stop-shingle cap vs hot shingles",
    "graph_common_neighbors": "_CN_CAP degree prune vs zipfian part degrees",
    "sessionize_batch": "per-user windows with one user owning ~17% of events",
    "llm_embed_neardup_lsh": "LSH bucket sizes under a 30% hot cluster",
    "graph_label_prop": "edge-stationary rounds + (node,label)-keyed "
    "mode agg (<=7 labels/node) vs zipfian degrees",
    # r11 verdict ask #5: the remaining top-10 shuffle keys
    "graph_pagerank": "per-round contribution agg on src-hash-partitioned "
    "cached edges; hot srcs partial-aggregate map-side",
    "graph_modularity": "LPA rounds + degree-pair recount on the shared "
    "cached edge set vs zipfian degrees",
    "llm_tokenize_apply": "broadcast vocab + per-doc flatMap (no "
    "token-keyed shuffle); hot tokens hit map-side partial agg",
    "llm_substring_dedup_sa": "prefix-doubling (rank,next) re-ranking "
    "under stopword-hot prefixes; equality-only _class_ids densification",
    "llm_substring_dedup_hashed": "hashed-window twin: window-hash "
    "groupBy under hot repeated substrings",
    "llm_ccnet_thresholds": "per-lang quantile thresholds with zipf "
    "token mass shifting LM scores; lang key cardinality stays bounded",
}


def jvm_peak_heap_mb(spark) -> float:
    mf = spark._jvm.java.lang.management.ManagementFactory
    total = 0
    for pool in mf.getMemoryPoolMXBeans():
        if pool.getType().toString() == "Heap memory":
            peak = pool.getPeakUsage()
            if peak is not None:
                total += peak.getUsed()
    return total / (1024 * 1024)


#: confs that scale AQE's skew-split byte thresholds down to local
#: fixture sizes — on a production cluster the 256MB default plays
#: the same role against 100 TB shuffle partitions; the rehearsal
#: proves the MECHANISM engages on this fixture's hot key
AQE_PROBE_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def aqe_skew_probe(spark, skew_dir: str) -> dict:
    """r7 verdict ask #4: assert AQE skew handling ENGAGES where
    expected. The probe is a deliberately unguarded sort-merge join on
    the zipfian hot key (lineitem ⋈ supplier on l_suppkey) — the shape
    every guard key avoids by construction, so the guards'
    absence-of-skew-markers is meaningful only if this probe shows the
    marker appears when skew is really there. The join must be
    SMJ(Sort(shuffle), Sort(shuffle)) DIRECTLY: any operator between a
    Sort and its shuffle stage (e.g. a final HashAggregate) breaks
    OptimizeSkewedJoin's pattern and it silently declines — the first
    probe draft joined lineitem to its own aggregate and measured zero
    markers for exactly that reason. Returns the ``skew=true`` +
    ``AQEShuffleRead skewed`` marker counts from the AQE FINAL plan
    (captured from the same DataFrame after execution)."""
    from pyspark.sql import functions as F

    old = {}
    for k, v in AQE_PROBE_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{skew_dir}/lineitem.parquet").select(
            "l_suppkey", "l_extendedprice"
        )
        supp = spark.read.parquet(f"{skew_dir}/supplier.parquet").select(
            "s_suppkey"
        )
        # the inspected DataFrame must be the EXECUTED one — a bare
        # .count() builds a derived Dataset whose execution never
        # finalizes THIS plan (executedPlan stays isFinalPlan=false);
        # collecting a self-built 1-row aggregate keeps the skew join
        # inside the same QueryExecution we read the final plan from.
        # The aggregate must also CONSUME the payload column, or
        # Catalyst prunes the join to bare 8-byte keys and the hot
        # partition shrinks below any honest byte threshold.
        res = (
            li.join(supp.hint("merge"), li.l_suppkey == supp.s_suppkey)
            .agg(
                F.count("*").alias("n"),
                F.sum("l_extendedprice").alias("s"),
            )
        )
        t0 = time.time()
        rows = res.collect()[0].n
        wall = time.time() - t0
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, "AQE final plan not captured"
        return {
            "rows": rows,
            "wall_s": round(wall, 2),
            "skew_markers": plan.count("skew=true"),
            "skewed_reads": plan.count("AQEShuffleRead skewed"),
        }
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _time_key(qs, spark, key: str, sf_dir: str) -> tuple[float, int]:
    best, rows = 9e9, -1
    for _ in range(2):
        t0 = time.time()
        rows = qs[key](spark, sf_dir).count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best, rows


def main() -> int:
    args = sys.argv[1:]
    skew_dir = args[0] if args and os.path.isdir(args[0]) else "/tmp/sfskew"
    keys = args[1:] if args and os.path.isdir(args[0]) else args
    keys = keys or list(DEFAULT_KEYS)

    import __spark_entry__ as entry_mod
    from hadoop_tools_spark.session import get_spark

    spark = get_spark("skew-rehearsal")
    qs = entry_mod.queries()
    results, failures = {}, []
    for key in keys:
        try:
            qs[key](spark, "/root/testdata/sf0.001").count()  # warm plan
            spark.catalog.clearCache()
            wall_u, rows_u = _time_key(qs, spark, key, UNIFORM)
            wall_s, rows_s = _time_key(qs, spark, key, skew_dir)
            err = None
        except Exception as e:
            wall_u = wall_s = -1.0
            rows_u = rows_s = -1
            err = f"{type(e).__name__}: {str(e)[:150]}"
        ratio = round(wall_s / wall_u, 2) if wall_u > 0 else None
        # a skewed fixture can legitimately contain MORE true result
        # (a 30% duplicate cluster holds ~quadratically more near-dup
        # pairs): when output grew at least as fast as wall, the extra
        # time is recall, not a guard failure — the per-output-row
        # cost did not regress. Only wall growth UNEXPLAINED by output
        # growth fails the gate.
        out_factor = (
            round(rows_s / rows_u, 2) if rows_u and rows_u > 0 else None
        )
        output_dominated = bool(
            ratio is not None and out_factor is not None
            and ratio > GATE and out_factor >= ratio
        )
        results[key] = {
            "uniform_s": round(wall_u, 2),
            "skew_s": round(wall_s, 2),
            "ratio": ratio,
            "rows_uniform": rows_u,
            "rows_skew": rows_s,
            "output_factor": out_factor,
            "output_dominated": output_dominated,
            "err": err,
            "py_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
            "jvm_peak_heap_mb": round(jvm_peak_heap_mb(spark), 1),
            "guard": DEFAULT_KEYS.get(key, ""),
        }
        print(key, json.dumps(results[key]))
        if err or (
            ratio is not None and ratio > GATE and not output_dominated
        ):
            failures.append(key)
    probe = aqe_skew_probe(spark, skew_dir)
    print("aqe_probe", json.dumps(probe))
    if max(probe["skew_markers"], probe["skewed_reads"]) < 1:
        failures.append("aqe_probe(no skew handling in final plan)")
    print(json.dumps({
        "skew_dir": skew_dir, "uniform": UNIFORM, "gate": GATE,
        "aqe_probe": probe, "results": results,
    }))
    if failures:
        print(f"SKEW GATE EXCEEDED ({GATE}x): {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
