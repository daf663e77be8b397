"""Local replica of the driver's correctness gate (SURVEY.md §5.2).

Runs every ``queries()`` key at a given scale factor, runs the matching
``oracle_sql()`` in DuckDB over the same parquet (views registered under
bare table names, mirroring the driver), and compares row count, column
names, and order-insensitive values. Strict by default: floats must be
bit-equal (declared queries round their float aggregates precisely so
this holds).

Usage:  python tools/verify_local.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
                else v
            )
    key = df.apply(lambda r: tuple(repr(v) for v in r), axis=1)
    return df.iloc[key.argsort(kind="stable").values].reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None or (isinstance(a, float) and math.isnan(a))) and (
        b is None or (isinstance(b, float) and math.isnan(b))
    ):
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b or repr(a) == repr(b)


def nonscalar_columns(df: pd.DataFrame) -> list[str]:
    """Columns holding list/array/dict cells — the driver's canonicalizer
    (pandas sort_values → Categorical) crashes on them with
    ``TypeError: unhashable type: 'list'`` (round-4 llm_inverted_index
    ERR). Serialize such columns (array_join / array_to_string) instead.
    """
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            # scan EVERY cell: a column can be all-null for its first
            # rows and still hold lists later (review finding r5)
            for v in df[c]:
                if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
                    bad.append(c)
                    break
    return bad


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    ns = nonscalar_columns(sdf)
    if ns:
        errs.append(
            f"non-scalar output columns {ns}: driver canonicalizer crashes "
            "on list cells — serialize with array_join(...)"
        )
        return errs
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    s, o = canon(sdf), canon(odf)
    # driver's value hash is type-sensitive: an int column on one side vs
    # float on the other (e.g. DuckDB HUGEINT SUM surfacing as float64)
    # hash-mismatches even when values are numerically equal
    for c in s.columns:
        if {s[c].dtype.kind, o[c].dtype.kind} == {"i", "f"}:
            errs.append(
                f"dtype mismatch col {c}: spark={s[c].dtype} oracle={o[c].dtype}"
                " (int-vs-float hash-mismatches in the driver)"
            )
    n = min(len(s), len(o))
    bad = 0
    for i in range(n):
        for c in s.columns:
            if not cells_equal(s[c].iloc[i], o[c].iloc[i]):
                bad += 1
                if bad <= 3:
                    errs.append(f"row {i} col {c}: spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}")
                break
    if bad > 3:
        errs.append(f"... {bad} mismatched rows total")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import __spark_entry__ as entry_mod
    from hadoop_tools_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {key}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if key not in oracles:
            ns = nonscalar_columns(sdf)
            if ns:
                print(f"FAIL {key}: non-scalar output columns {ns}")
                n_fail += 1
            else:
                print(f"rows-only {key}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
                n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[key]).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: oracle error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        errs = compare(key, sdf, odf)
        if errs:
            print(f"FAIL {key}  ({time.time()-t0:.1f}s)")
            for e in errs[:6]:
                print(f"   {e}")
            n_fail += 1
        else:
            print(f"PASS {key}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
