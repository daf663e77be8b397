"""Regenerate KEYS.md — the declared-key inventory, from the registry.

Run after adding/removing @query registrations:
    python tools/gen_keys_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_tools_spark import all_queries  # noqa: F401,E402
from hadoop_tools_spark.registry import ORACLES, QUERIES  # noqa: E402

GROUPS = [
    ("TPC-H-shaped relational suite", ("q",)),
    ("Layer A — filesystem surface", ("fs_",)),
    ("Relational core", ("project_", "filter_", "join_", "agg_", "win_",
                         "sort_", "topk_", "set_", "sample_", "scan_",
                         "sink_")),
    ("Scalar functions", ("fn_",)),
    ("Streaming (batch-equivalent declared form)", ("stream_",)),
    ("LLM data pipeline", ("llm_",)),
    ("UDF / UDAF / UDTF", ("udf_", "udaf_", "udtf_")),
]


def group_of(key: str) -> str:
    for title, prefixes in GROUPS:
        if any(key.startswith(p) for p in prefixes):
            return title
    return "Other"


def main() -> None:
    out = [
        "# KEYS — declared query inventory",
        "",
        "Auto-generated from the `@query` registry by"
        " `tools/gen_keys_md.py`; do not edit by hand.",
        "",
        f"**{len(QUERIES)} keys**: {len(ORACLES)} hash-matched against the"
        f" DuckDB oracle, {len(QUERIES) - len(ORACLES)} rows-only"
        " (approximate / randomized / binary / stub-backed by design —"
        " each carries recall or property tests instead).",
        "",
    ]
    grouped: dict[str, list[str]] = {}
    for key in sorted(QUERIES):
        grouped.setdefault(group_of(key), []).append(key)
    for title, _ in GROUPS + [("Other", ())]:
        keys = grouped.get(title)
        if not keys:
            continue
        out.append(f"## {title} ({len(keys)})")
        out.append("")
        out.append("| key | oracle | implementation |")
        out.append("| --- | --- | --- |")
        for key in keys:
            fn = QUERIES[key]
            mod = fn.__module__.replace("hadoop_tools_spark.", "")
            oracle = "hash-matched" if key in ORACLES else "rows-only"
            out.append(f"| `{key}` | {oracle} | `{mod}.{fn.__name__}` |")
        out.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "KEYS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"KEYS.md: {len(QUERIES)} keys, {len(ORACLES)} with oracles")


if __name__ == "__main__":
    main()
