"""Low-vs-high-core scaling proof at a compute-bound scale factor.

r13 VERDICT ask #2: at sf0.1 the 319-key board is job-floor-bound
(~0.7 s/key of planning/Py4J/scheduling), so the driver's 8-vs-32-core
wall ratios sit at ~1.0 and its `suspect_cpus_ignored` heuristic trips
even though `get_spark` builds `local[$SPARK_GRAFT_CPUS]` and derives
shuffle partitions from it. This tool demonstrates the scaling
contract where it has power: a bigger SF (tools/make_sf1.py) on the
compute-heavy keys, each core count in its OWN subprocess (the master
is fixed at session build), bench methodology otherwise identical
(warmup at sf0.001, min-of-2 per key, noop sink, cache cleared
between keys).

Usage:
    python tools/make_sf1.py /tmp/sf1
    python tools/scaling_proof.py /tmp/sf1 [--cpus 32,8] [key ...]

Writes SCALING_r14.json at the repo root:
    {"sf_dir": ..., "cpus": [hi, lo], "per_query":
        {key: {"wall_hi": s, "wall_lo": s, "lo_over_hi": r}},
     "geomean_lo_over_hi": r}

A lo_over_hi ratio near cpus_hi/cpus_lo on compute-heavy keys is the
proof that the engine honors the core count; ratios near 1.0 at sf0.1
are the floor, not a scaling failure.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: compute-heavy defaults: the keys whose sf0.1 walls are dominated by
#: executor work (graph family, dedup/text pipelines, big joins) — the
#: ones where core count should show.
DEFAULT_KEYS = [
    "graph_pagerank",
    "graph_label_prop",
    "graph_modularity",
    "graph_triangles",
    "graph_common_neighbors",
    "graph_khop",
    "llm_substring_dedup_sa",
    "llm_substring_dedup_hashed",
    "llm_dedup_substring",
    "llm_containment",
    "llm_minhash_estimate",
    "llm_bm25",
    "llm_tokenize_apply",
    "q21_waiting_supplier",
    "q1_pricing_summary",
    "agg_median",
]

_RUNNER = r"""
import sys, time, json, os
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from hadoop_tools_spark import all_queries, registry
from hadoop_tools_spark.session import get_spark
sf = sys.argv[2]
keys = [k for k in sys.argv[3:] if k in registry.QUERIES]
spark = get_spark("scaling_proof")
spark.range(1).collect()
for k in keys:  # warm pass at the smallest SF
    try:
        registry.QUERIES[k](spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()
    except Exception:
        pass
spark.catalog.clearCache()
best = {}
for _ in range(2):
    for k in keys:
        t0 = time.time()
        try:
            registry.QUERIES[k](spark, sf).write.format("noop").mode(
                "overwrite").save()
            t = time.time() - t0
            if k not in best or t < best[k]:
                best[k] = t
        except Exception as e:
            print(f"scaling error {k}: {e}", file=sys.stderr)
            best.setdefault(k, -1.0)
        spark.catalog.clearCache()
print("SCJSON:" + json.dumps(best))
spark.stop()
"""


def _run(cpus: int, sf_dir: str, keys: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, REPO, sf_dir, *keys],
        capture_output=True, text=True, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCJSON:"):
            return json.loads(line[len("SCJSON:"):])
    raise RuntimeError(f"runner failed at {cpus} cpus:\n{out.stderr[-2000:]}")


def main() -> None:
    args = sys.argv[1:]
    cpus = [32, 8]
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = [int(c) for c in args[i + 1].split(",")]
        del args[i:i + 2]
    if not args:
        print(__doc__)
        sys.exit(2)
    sf_dir, keys = args[0], args[1:] or DEFAULT_KEYS
    hi, lo = max(cpus), min(cpus)
    wall_hi = _run(hi, sf_dir, keys)
    wall_lo = _run(lo, sf_dir, keys)
    per, ratios = {}, []
    for k in keys:
        h, l = wall_hi.get(k), wall_lo.get(k)
        entry = {"wall_hi": round(h, 3) if h else h,
                 "wall_lo": round(l, 3) if l else l}
        if h and l and h > 0 and l > 0:
            entry["lo_over_hi"] = round(l / h, 3)
            ratios.append(l / h)
        per[k] = entry
        print(f"{k:32s} {hi}c {h:7.2f}s  {lo}c {l:7.2f}s  "
              f"ratio {entry.get('lo_over_hi', '—')}")
    gm = round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3)
    doc = {"sf_dir": sf_dir, "cpus": [hi, lo], "per_query": per,
           "geomean_lo_over_hi": gm}
    with open(os.path.join(REPO, "SCALING_r14.json"), "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\ngeomean {lo}c/{hi}c wall ratio: {gm} "
          f"(perfect scaling would be ~{hi / lo:.1f} on compute-bound keys)")


if __name__ == "__main__":
    main()
