"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` / ``oracle_sql()`` expose every declared operator key
from SURVEY.md §2 for the driver's DuckDB hash-match at sf0.01.
Registration lives in :mod:`hadoop_tools_spark.registry`; operator
modules are pulled in via :mod:`hadoop_tools_spark.all_queries`.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_tools_spark import all_queries, registry  # noqa: E402
from hadoop_tools_spark.session import ensure_session_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _driver_verdicts() -> dict[str, bool]:
    """Latest driver verdict per key across every ``CORRECTNESS_r*.json``.

    Maps key -> True (last driver sample succeeded) or False (last sample
    FAILED: hash mismatch, row/schema mismatch, or a hard error). Keys the
    driver has never sampled are absent. Rounds are merged in filename
    order so the most recent round's verdict wins — a key that failed in
    r2 and passed in r3 counts as green, and vice versa. Rows-only keys
    (``err == "no_oracle"``) count as green when the driver got rows back.
    """
    verdicts: dict[str, bool] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue  # unreadable round file: skip, never break the driver
        for key, row in rows.items():
            if not isinstance(row, dict):
                verdicts[key] = True  # legacy shape: treat as sampled-green
                continue
            err = row.get("err")
            if err == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    err is None
                    and row.get("hash_match") is True
                    and row.get("rows_match") is True
                    and row.get("schema_match") is True
                )
            verdicts[key] = bool(ok)
    return verdicts


def _last_sample_round() -> dict[str, str]:
    """Key -> basename of the latest ``CORRECTNESS_r*.json`` sampling it."""
    rounds: dict[str, str] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for key in rows:
            rounds[key] = os.path.basename(path)
    return rounds


def _stale_green_keys() -> set[str]:
    """Green keys whose implementing module changed AFTER their last
    driver sample — their verdicts were earned by old code.

    Round-6 lesson (verdict ask #8): the limb-sum migration rewrote ~40
    keys' aggregates while their r1–r5 verdicts stayed silently green;
    a stale verdict is weaker evidence than a fresh one, so these keys
    must outrank untouched greens in the sample order. Detection is
    git-based: the commit that introduced a key's latest correctness
    file marks when it was sampled; if the key's implementing module
    differs between that commit and the working tree, the verdict is
    stale. Best-effort — any git/inspect failure degrades to "nothing
    stale", never breaks the driver contract.
    """
    try:
        import inspect
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        sampled_in = _last_sample_round()
        # commit that first introduced each round's correctness file
        changed_since: dict[str, set[str]] = {}
        for fname in set(sampled_in.values()):
            sha = subprocess.run(
                ["git", "-C", here, "log", "--diff-filter=A", "-n1",
                 "--format=%H", "--", fname],
                capture_output=True, text=True, timeout=30,
            ).stdout.strip()
            if not sha:
                changed_since[fname] = set()
                continue
            diff = subprocess.run(
                ["git", "-C", here, "diff", "--name-only", sha, "--",
                 "hadoop_tools_spark/"],
                capture_output=True, text=True, timeout=30,
            ).stdout
            changed_since[fname] = set(diff.split())
        stale: set[str] = set()
        for key, fname in sampled_in.items():
            fn = registry.QUERIES.get(key)
            if fn is None:
                continue
            try:
                mod = os.path.relpath(inspect.getfile(fn), here)
            except (TypeError, ValueError):
                continue
            if mod in changed_since.get(fname, ()):
                stale.add(key)
        return stale
    except Exception:
        return set()


def _ordered_keys() -> list[str]:
    """Coverage-maximising order for the driver's capped key sample.

    Tiering (driver samples a prefix of this list): keys whose *latest*
    driver sample FAILED rank FIRST (a known-bad verdict is worse than
    no verdict — their repairs need driver re-confirmation NOW), then
    never-sampled keys (oracle'd before rows-only), then STALE greens
    (sampled green, but the implementing module changed since — the
    verdict was earned by old code), then untouched greens. Round-4
    lesson: with 60 never-sampled keys queued ahead, the old
    never-sampled-first order starved three repaired keys at positions
    61–63 for three consecutive rounds. Round-6 lesson: the limb
    migration rewrote ~40 green keys without re-ranking them — old
    verdicts go stale silently, so fresh-code keys sample first.

    Every round ALSO re-verifies all oracle'd keys locally via
    ``tools/verify_local.py`` (same comparator as the driver), so
    regressions surface locally even when the driver sample misses
    them.
    """
    verdicts = _driver_verdicts()
    stale = _stale_green_keys()
    sampled_in = _last_sample_round() if stale else {}

    def rank(key: str) -> tuple[int, str, str]:
        has_oracle = key in registry.ORACLES
        if key in verdicts and not verdicts[key]:
            tier = 0  # last driver sample FAILED: re-confirm the repair
        elif key not in verdicts:
            tier = 1 if has_oracle else 2  # fresh coverage next
        elif key in stale:
            tier = 3  # green, but the verdict predates the current code
        elif has_oracle:
            tier = 4  # already green with oracle, code untouched
        else:
            tier = 5  # already green, rows-only
        # within the stale tier the OLDEST verdict is the weakest
        # evidence: r1-sampled keys outrank r6-sampled ones
        age = sampled_in.get(key, "") if tier == 3 else ""
        return (tier, age, key)

    return sorted(registry.QUERIES, key=rank)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_confs(spark)
    return registry.QUERIES[all_queries.FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {k: wrap(registry.QUERIES[k]) for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI SQL per query key (pre-registered fixture views)."""
    return dict(registry.ORACLES)
