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

UNIFORM = "/root/testdata/sf0.1"
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
        results[key] = {
            "uniform_s": round(wall_u, 2),
            "skew_s": round(wall_s, 2),
            "ratio": ratio,
            "rows_uniform": rows_u,
            "rows_skew": rows_s,
            "err": err,
            "py_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
            "jvm_peak_heap_mb": round(jvm_peak_heap_mb(spark), 1),
            "guard": DEFAULT_KEYS.get(key, ""),
        }
        print(key, json.dumps(results[key]))
        if err or (ratio is not None and ratio > GATE):
            failures.append(key)
    print(json.dumps({"skew_dir": skew_dir, "gate": GATE, "results": results}))
    if failures:
        print(f"SKEW GATE EXCEEDED ({GATE}x): {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
