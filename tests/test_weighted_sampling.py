"""Weighted sampling: proportionality, determinism, fixed-size contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_olap_spark.functions.sampling import (
    weighted_sample,
    weighted_sample_n,
)
from tests.conftest import assert_matches


def test_weighted_bernoulli_oracle(tables, duck):
    out = weighted_sample(
        tables["documents"], "n_chars", "doc_id", rate_scale=1 / 1000.0
    )
    assert_matches(
        out,
        duck,
        """
        SELECT * FROM documents
        WHERE (('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 8))::BIGINT
               / 4294967296.0) < n_chars * (1.0 / 1000.0)
        """,
    )


def test_weighted_bernoulli_rate_scales_with_weight(spark):
    rows = [(i, 1.0 if i < 4000 else 8.0) for i in range(5000)]
    df = spark.createDataFrame(rows, ["k", "w"])
    kept = weighted_sample(df, "w", "k", rate_scale=0.05).groupBy(
        (F.col("w") > 1).alias("heavy")
    ).count().collect()
    by = {r["heavy"]: r["count"] for r in kept}
    light_rate = by.get(False, 0) / 4000
    heavy_rate = by.get(True, 0) / 1000
    # heavy rows kept ~8x as often (0.05 vs 0.4)
    assert 0.03 < light_rate < 0.08
    assert 0.3 < heavy_rate < 0.5


def test_weighted_sample_n_fixed_size_and_monotone(spark):
    rows = [(i, 10.0 if i % 10 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "w"])
    got = weighted_sample_n(df, 200, "w", "k").collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["w"] == 10.0)
    # 200 of 2000 rows are heavy (10% of rows, ~53% of total weight):
    # they must be strongly over-represented vs the 20 a uniform
    # sample would pick
    assert heavy > 60


def test_weighted_sample_n_deterministic_and_subset_stable(spark):
    rows = [(i, float(1 + i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "w"])
    a = {r["k"] for r in weighted_sample_n(df, 50, "w", "k").collect()}
    b = {
        r["k"]
        for r in weighted_sample_n(df.repartition(13), 50, "w", "k").collect()
    }
    assert a == b and len(a) == 50


def test_nonpositive_weights_never_kept(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)], ["k", "w"]
    )
    assert [r["k"] for r in weighted_sample_n(df, 10, "w", "k").collect()] == [4]
    kept = weighted_sample(df, "w", "k", rate_scale=10.0).collect()
    assert [r["k"] for r in kept] == [4]
