"""Fuzzy join/pairs vs the DuckDB levenshtein oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.operators.fuzzy import fuzzy_join, fuzzy_pairs
from tests.conftest import assert_matches


def test_fuzzy_pairs_part_names(tables, duck):
    out = fuzzy_pairs(
        tables["part"], "p_name", "p_partkey", max_dist=2, block_col="p_brand"
    )
    assert_matches(
        out,
        duck,
        """
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               levenshtein(a.p_name, b.p_name) AS edit_distance
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand
         AND a.p_partkey < b.p_partkey
         AND levenshtein(a.p_name, b.p_name) <= 2
        """,
    )


def test_fuzzy_join_typo_match(spark):
    clean = spark.createDataFrame(
        [("blue rod", "B", 1), ("cold widget", "C", 2)],
        "name string, blk string, cid int",
    )
    dirty = spark.createDataFrame(
        [("blue rdo", "B", 10), ("cold midget", "C", 20),
         ("utterly different", "B", 30)],
        "dname string, blk string, did int",
    )
    out = fuzzy_join(
        clean, dirty, "name", "dname", max_dist=2, block_col="blk"
    ).collect()
    got = {(r["cid"], r["did"]): r["edit_distance"] for r in out}
    assert got == {(1, 10): 2, (2, 20): 1}


def test_fuzzy_join_left_keeps_unmatched(spark):
    clean = spark.createDataFrame(
        [("blue rod", "B", 1), ("zzzz", "B", 2)],
        "name string, blk string, cid int",
    )
    dirty = spark.createDataFrame(
        [("blue rd", "B", 10)], "dname string, blk string, did int"
    )
    out = fuzzy_join(
        clean, dirty, "name", "dname", max_dist=2, block_col="blk", how="left"
    ).collect()
    by_cid = {r["cid"]: r for r in out}
    assert by_cid[1]["did"] == 10 and by_cid[1]["edit_distance"] == 1
    assert by_cid[2]["did"] is None and by_cid[2]["edit_distance"] is None


def test_fuzzy_requires_block(tables):
    with pytest.raises(ValueError, match="quadratic"):
        fuzzy_pairs(tables["part"], "p_name", "p_partkey")
    with pytest.raises(ValueError, match="quadratic"):
        fuzzy_join(tables["part"], tables["part"], "p_name", "p_name")


def test_fuzzy_threshold_sentinel_not_matched(spark):
    # Spark's thresholded levenshtein returns -1 over the bound; a
    # naive <= comparison would resurrect those pairs
    a = spark.createDataFrame([("abcdefgh", 1)], "v string, i int")
    b = spark.createDataFrame([("zzzzzzzz", 2)], "w string, j int")
    out = fuzzy_join(a, b, "v", "w", max_dist=2, allow_unblocked=True)
    assert out.count() == 0
