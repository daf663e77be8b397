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


def cumulative_spill_bytes(spark) -> int | None:
    """Sum of memory+disk spill across all completed stages, read from
    the UI REST status API (r11 verdict ask #4: record spill per key).
    Needs SPARK_GRAFT_UI=1 (the runner sets it before the session is
    built); returns None when the UI is off so old runs stay readable."""
    import json as _json
    import urllib.request

    u = spark.sparkContext.uiWebUrl
    if not u:
        return None
    try:
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{u}/api/v1/applications/{app}/stages", timeout=10
        ) as fh:
            stages = _json.load(fh)
        return sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in stages
        )
    except Exception:
        return None


#: whole-board gate (VERDICT r8 ask #6): a key whose sf1 wall exceeds
#: this multiple of the prior board's recorded wall is flagged — a
#: scale regression in a mid-cost key can no longer hide below the
#: PLANS_SF1 top-30 cut. Same threshold class as bench_ab's triage:
#: walls at second granularity on a shared box need a wide band.
BOARD_GATE_RATIO = 2.0
#: keys under this wall on BOTH boards are exempt from the ratio gate
#: (0.2 s -> 0.5 s is scheduler noise, not a plan change)
BOARD_GATE_MIN_S = 1.0
BOARD_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SF1_BOARD.json",
)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--accept-board"]
    accept_board = "--accept-board" in sys.argv[1:]
    args = [a for a in argv if a != "--all"]
    run_all = "--all" in argv
    if run_all and len(args) > 1:
        # a subset run must never replace the full-board baseline
        # (r9 review: it would erase every other key's prior wall)
        print("--all takes no explicit keys", file=sys.stderr)
        return 2
    sf_dir = args[0] if args else "/tmp/sf1"
    keys = args[1:] or (None if run_all else DEFAULT_KEYS)

    os.environ.setdefault("SPARK_GRAFT_UI", "1")  # spill via REST
    import __spark_entry__ as entry_mod
    from hadoop_tools_spark.session import get_spark

    spark = get_spark("sf1-rehearsal")
    qs = entry_mod.queries()
    if keys is None:
        keys = sorted(qs)
    results = {}
    spill_before = cumulative_spill_bytes(spark)
    spill_span = 1  # keys covered by the next valid spill delta
    for key in keys:
        t0 = time.time()
        try:
            n = qs[key](spark, sf_dir).count()
            err = None
        except Exception as e:
            n, err = -1, f"{type(e).__name__}: {str(e)[:150]}"
        wall = time.time() - t0
        spill_after = cumulative_spill_bytes(spark)
        results[key] = {
            "wall_s": round(wall, 2),
            "rows": n,
            "err": err,
            "py_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
            "jvm_peak_heap_mb": round(jvm_peak_heap_mb(spark), 1),
            "spill_mb": (
                round((spill_after - spill_before) / 1048576, 1)
                if spill_after is not None and spill_before is not None
                else None
            ),
        }
        # ADVICE r11: on a transient REST miss the baseline is NOT
        # advanced, so the NEXT valid delta folds this key's spill in
        # — mark such readings with the number of keys they span
        # instead of silently misattributing them to one key
        if results[key]["spill_mb"] is not None and spill_span > 1:
            results[key]["spill_mb_span"] = spill_span
        if spill_after is not None:
            spill_before = spill_after
            spill_span = 1
        else:
            spill_span += 1
        print(key, json.dumps(results[key]))
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "results": results}))

    if run_all:
        # compare against the prior committed board, then replace it
        prior = {}
        if os.path.exists(BOARD_PATH):
            with open(BOARD_PATH) as fh:
                prior = json.load(fh).get("results", {})
        flagged = []
        for key, r in results.items():
            p = prior.get(key)
            if r["err"]:
                flagged.append((key, "ERR", r["err"]))
            elif p and not p.get("err"):
                if (
                    r["wall_s"] > BOARD_GATE_MIN_S
                    and p["wall_s"] > 0
                    and r["wall_s"] / max(p["wall_s"], BOARD_GATE_MIN_S)
                    > BOARD_GATE_RATIO
                ):
                    flagged.append(
                        (key, f"{r['wall_s']}s vs prior {p['wall_s']}s", "")
                    )
        total = round(sum(r["wall_s"] for r in results.values()), 1)
        # a flagged board does NOT replace the baseline (r9 review: it
        # would make a second run of the same regressed code report
        # clean); pass --accept-board after triaging to adopt it
        if not flagged or accept_board:
            with open(BOARD_PATH, "w") as fh:
                json.dump(
                    {
                        "sf_dir": sf_dir,
                        "total_wall_s": total,
                        "n_keys": len(results),
                        "results": results,
                    },
                    fh,
                    indent=1,
                    sort_keys=True,
                )
        print(
            json.dumps(
                {
                    "board": BOARD_PATH,
                    "board_replaced": not flagged or accept_board,
                    "total_wall_s": total,
                    "n_keys": len(results),
                    "gate_flagged": [
                        {"key": k, "why": w, "err": e} for k, w, e in flagged
                    ],
                }
            )
        )
        return 1 if flagged else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
