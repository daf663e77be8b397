"""Capture .explain('formatted') for given keys into plans/r14/.

Usage: python tools/explain_keys.py <suffix> key [key ...]
       (suffix is e.g. 'before' or 'after')

Writes plans/r14/<key>_<suffix>.txt. Uses sf0.01 so scenario keys
build quickly; plan SHAPE (exchanges, join strategy, pushed filters)
is what the files document, not data volume. Optionally times a solo
run at $SPARK_GRAFT_SF_DIR when SPARK_GRAFT_EXPLAIN_TIME=1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    from hadoop_tools_spark import all_queries  # noqa: F401
    from hadoop_tools_spark.registry import QUERIES
    from hadoop_tools_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_r13")
    spark.range(1).collect()
    do_time = os.environ.get("SPARK_GRAFT_EXPLAIN_TIME") == "1"
    for key in keys:
        if key not in QUERIES:
            print(f"SKIP unknown key {key}", file=sys.stderr)
            continue
        t0 = time.time()
        df = QUERIES[key](spark, sf_dir)
        build_s = time.time() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        header = [f"key: {key}", f"sf_dir: {sf_dir}",
                  f"build_wall_s: {build_s:.2f}"]
        if do_time:
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            header.append(f"noop_exec_wall_s: {time.time() - t1:.2f}")
        with open(os.path.join(out_dir, f"{key}_{suffix}.txt"), "w") as fh:
            fh.write("\n".join(header) + "\n\n" + plan + "\n")
        spark.catalog.clearCache()
        print(f"wrote {key}_{suffix}.txt build={build_s:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
