"""Per-operator oracle pairs (SURVEY.md §5.3 layer 1).

Replicates the driver's check locally at sf0.001 for every declared
key that ships an oracle: row count + column names + order-insensitive
exact values. Keys without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

sys_path_marker = True

from tools.verify_local import compare  # noqa: E402


def _keys():
    return sorted(entry_mod.queries())


@pytest.mark.parametrize("key", _keys())
def test_oracle_parity(key, spark, duck, sf_dir):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # a few Layer-A/binary oracles hardcode the driver's sf0.01 paths
    # (listing real files); run their Spark side against the same dir
    if "sf0.01" in oracles.get(key, ""):
        sf_dir = "/root/testdata/sf0.01"
    sdf = qs[key](spark, sf_dir).toPandas()
    if key not in oracles:
        assert len(sdf) >= 0  # rows-only: plan executes
        return
    odf = duck.execute(oracles[key]).fetchdf()
    errs = compare(key, sdf, odf)
    assert not errs, f"{key}: " + "; ".join(errs[:5])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
