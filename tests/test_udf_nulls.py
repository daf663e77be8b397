"""NULL-row guards on the §2.F UDF surface (r6 review findings).

A single NULL text/name must degrade to SQL NULL semantics, never
kill the Python worker — the 'one malformed row must not kill a
12-hour pipeline' failure mode. These tests drive the REGISTERED key
bodies against fixture dirs that contain a NULL row.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def null_sf_dir(spark, tmp_path):
    """A minimal sf_dir whose documents/part tables carry a NULL row."""
    spark.createDataFrame(
        [
            (1, None, None, None, None),
            (2, "alpha beta gamma delta epsilon zeta", "en", "s0", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        [(1, None, None, None, None), (2, "spring metal", "SMALL", "Brand#13", 5)],
        "p_partkey long, p_name string, p_type string, p_brand string,"
        " p_size long",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_udtf_shingles_null_text_yields_no_rows(spark, null_sf_dir):
    from hadoop_tools_spark import all_queries  # noqa: F401
    from hadoop_tools_spark.registry import QUERIES

    rows = QUERIES["udtf_shingles"](spark, null_sf_dir).collect()
    assert {r.doc_id for r in rows} == {2}  # NULL doc contributes 0 rows
    assert len(rows) == 2  # 6 words -> two 5-shingles


def test_udtf_analyze_null_text_yields_null_words(spark, null_sf_dir):
    from hadoop_tools_spark import all_queries  # noqa: F401
    from hadoop_tools_spark.registry import QUERIES

    got = {
        r.doc_id: (r.word_1, r.word_2, r.word_3)
        for r in QUERIES["udtf_analyze"](spark, null_sf_dir).collect()
    }
    assert got[1] == (None, None, None)  # string_split(NULL)[i] semantics
    assert got[2] == ("alpha", "beta", "gamma")


def test_udf_scalar_null_name_yields_null(spark, null_sf_dir):
    from hadoop_tools_spark import all_queries  # noqa: F401
    from hadoop_tools_spark.registry import QUERIES

    got = {
        r.p_partkey: r.glob_matched
        for r in QUERIES["udf_scalar"](spark, null_sf_dir).collect()
    }
    assert got == {1: None, 2: True}
