"""sf1 scale rehearsal (VERDICT r2 ask #7).

Runs the headline scale-sensitive keys against a 10×-amplified sf1
directory (see tools/make_sf1.py), recording wall time, rows, Python
driver peak RSS, and JVM peak heap — evidence that the plans survive a
10× scale-up rather than a design argument.

Usage: python tools/make_sf1.py /tmp/sf1 && \
       python tools/rehearse_sf1.py /tmp/sf1 [key ...]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "q5_local_supplier",
    "q8_market_share",
    "q21_waiting_supplier",
    "llm_tfidf",
    "llm_embed_neardup",
    "llm_neardup_lsh",
]


def jvm_peak_heap_mb(spark) -> float:
    mf = spark._jvm.java.lang.management.ManagementFactory
    total = 0
    for pool in mf.getMemoryPoolMXBeans():
        if pool.getType().toString() == "Heap memory":
            peak = pool.getPeakUsage()
            if peak is not None:
                total += peak.getUsed()
    return total / (1024 * 1024)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    keys = sys.argv[2:] or DEFAULT_KEYS

    import __spark_entry__ as entry_mod
    from hadoop_tools_spark.session import get_spark

    spark = get_spark("sf1-rehearsal")
    qs = entry_mod.queries()
    results = {}
    for key in keys:
        t0 = time.time()
        try:
            n = qs[key](spark, sf_dir).count()
            err = None
        except Exception as e:
            n, err = -1, f"{type(e).__name__}: {str(e)[:150]}"
        wall = time.time() - t0
        results[key] = {
            "wall_s": round(wall, 2),
            "rows": n,
            "err": err,
            "py_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
            "jvm_peak_heap_mb": round(jvm_peak_heap_mb(spark), 1),
        }
        print(key, json.dumps(results[key]))
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
