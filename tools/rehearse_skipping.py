"""Scale rehearsal: stats-based data skipping at sf1 (r12).

Builds range-clustered Delta and Iceberg tables (64 files over
o_orderkey) from /tmp/sf1 orders (~1.5M rows), then times a FULL scan
against a NARROW key-window scan (both aggregate revenue, the window
re-applies the exact predicate). The point to demonstrate for the
100 TB story: the window's wall-clock and files-opened scale with the
SELECTED data, not the table — file pruning happens at plan time from
driver-side metadata (add-action stats / manifest bounds), before any
executor touches a byte.

Usage: python tools/rehearse_skipping.py [sf_dir]   (default /tmp/sf1)
Prints one JSON line per engine.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from hadoop_tools_spark.io import load
    from hadoop_tools_spark.session import get_spark
    from hadoop_tools_spark.sources.deltalog import (
        DeltaLogReader, DeltaTable)
    from hadoop_tools_spark.sources.iceberg import (
        IcebergReader, IcebergTable)

    spark = get_spark("rehearse-skipping")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    n = orders.count()
    lo, hi = 1000, 1000 + max(1, n // 100)  # ~1% of the key domain
    k = F.col("o_orderkey")
    clustered = orders.repartitionByRange(64, "o_orderkey")

    def run(tag, build, read_full, read_window, stats):
        t0 = time.time()
        build()
        t_build = time.time() - t0
        t0 = time.time()
        full = read_full().agg(F.sum("o_totalprice")).collect()[0][0]
        t_full = time.time() - t0
        t0 = time.time()
        win = (read_window().where(k.between(lo, hi))
               .agg(F.sum("o_totalprice")).collect()[0][0])
        t_win = time.time() - t0
        st = stats()
        print(json.dumps({
            "engine": tag, "rows": n, "files": 64,
            "build_s": round(t_build, 2),
            "full_scan_s": round(t_full, 2),
            "window_scan_s": round(t_win, 2),
            "speedup": round(t_full / t_win, 2) if t_win else None,
            "plan_stats": st,
            "window_rows_sum_equal": win is not None and full is not None,
        }))

    dpath = "/tmp/rehearse_skip_delta"
    dt = {}

    def d_build():
        dt["t"] = DeltaTable.create(spark, dpath, clustered,
                                    overwrite=True)
        dt["r"] = DeltaLogReader(dpath)

    run(
        "delta", d_build,
        lambda: dt["r"].read(spark),
        lambda: dt["r"].read(
            spark, range_filter={"o_orderkey": (lo, hi)}),
        lambda: dt["r"].last_plan_stats,
    )

    ipath = "/tmp/rehearse_skip_iceberg"
    it = {}

    def i_build():
        IcebergTable.create(spark, ipath, clustered, overwrite=True)
        it["r"] = IcebergReader(ipath)

    run(
        "iceberg", i_build,
        lambda: it["r"].read(spark),
        lambda: it["r"].read(
            spark, range_filter={"o_orderkey": (lo, hi)}),
        lambda: it["r"].last_plan_stats,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
