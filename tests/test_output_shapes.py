"""Every registered key must emit driver-hashable (scalar-only) columns.

The driver's correctness comparator canonicalizes results with pandas
``sort_values`` → ``Categorical``, which raises ``TypeError: unhashable
type: 'list'`` on any array/map/struct cell (round-4 ``llm_inverted_index``
ERR, CORRECTNESS_r04.json). The repo convention is to serialize such
columns (``array_join(array_sort(...), ',')`` — see aggregates.py
``agg_collect``). This audit builds each key's DataFrame (schema only,
no execution) and fails on any complex-typed output column, closing the
local/driver harness gap the round-4 verdict flagged.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType


def test_no_complex_output_columns(spark, sf_dir):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    offenders = {}
    for key, fn in qs.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # build failure is its own (worse) bug
            offenders[key] = f"plan build failed: {type(e).__name__}: {e}"
            continue
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[key] = f"complex-typed columns {bad}"
    assert not offenders, (
        "keys emitting non-scalar columns (driver canonicalizer crashes on "
        f"these): {offenders}"
    )


def test_queries_and_oracles_consistent():
    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    orphan = sorted(set(oracles) - set(qs))
    assert not orphan, f"oracle_sql keys with no queries() entry: {orphan}"


def test_ordered_keys_stale_green_tier():
    """Stale greens (module changed since last driver sample) must rank
    ahead of untouched greens (r6 verdict ask #8): the order is a
    permutation of the registry, failures-first, and any stale key sits
    before every fresh-green key."""
    import __spark_entry__ as entry_mod
    from hadoop_tools_spark import registry

    keys = entry_mod._ordered_keys()
    assert sorted(keys) == sorted(registry.QUERIES)
    verdicts = entry_mod._driver_verdicts()
    stale = entry_mod._stale_green_keys()
    pos = {k: i for i, k in enumerate(keys)}
    fresh_green = [
        k for k in keys
        if verdicts.get(k) and k not in stale and k in registry.ORACLES
    ]
    if stale and fresh_green:
        assert max(pos[k] for k in stale if verdicts.get(k)) < min(
            pos[k] for k in fresh_green
        ), "a stale-green key ranked after an untouched green"
