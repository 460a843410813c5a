"""Equal-frequency binning: size balance, ordering, oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_olap_spark.functions.binning import quantile_bucket
from tests.conftest import assert_matches


def test_buckets_balanced_and_ordered(spark):
    df = spark.range(1000).select(
        ((F.col("id") * 37 + 11) % 1000).alias("v"), F.col("id").alias("k")
    )
    out = quantile_bucket(df, "v", 10, "k")
    sizes = {
        r["bucket"]: r["count"]
        for r in out.groupBy("bucket").count().collect()
    }
    assert set(sizes) == set(range(10))
    assert all(s == 100 for s in sizes.values())
    # monotone: max(v) in bucket b < min(v) in bucket b+1 (v unique)
    rows = out.groupBy("bucket").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).orderBy("bucket").collect()
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"]


def test_uneven_sizes_differ_by_at_most_one(spark):
    df = spark.range(103).select(
        F.col("id").alias("v"), F.col("id").alias("k")
    )
    sizes = [
        r["count"]
        for r in quantile_bucket(df, "v", 10, "k")
        .groupBy("bucket").count().collect()
    ]
    assert sorted(sizes)[0] >= 10 and sorted(sizes)[-1] <= 11
    assert sum(sizes) == 103


def test_ties_split_deterministically(spark):
    df = spark.createDataFrame(
        [(1.0, i) for i in range(10)], ["v", "k"]
    )
    a = {(r["k"], r["bucket"]) for r in quantile_bucket(df, "v", 2, "k").collect()}
    b = {
        (r["k"], r["bucket"])
        for r in quantile_bucket(df.repartition(7), "v", 2, "k").collect()
    }
    assert a == b
    assert sum(1 for _, bk in a if bk == 0) == 5


def test_oracle_parity_on_orders(tables, duck):
    out = quantile_bucket(
        tables["orders"], "o_totalprice", 8, "o_orderkey"
    ).select("o_orderkey", "o_totalprice", "bucket")
    assert_matches(
        out,
        duck,
        """
        WITH r AS (
          SELECT o_orderkey, o_totalprice,
                 row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                     - 1 AS rk,
                 count(*) OVER () AS total
          FROM orders
        )
        SELECT o_orderkey, o_totalprice,
               ((rk * 8) // total)::INT AS bucket
        FROM r
        """,
    )


def test_target_encode_loo_hand_computed(spark):
    from semantic_olap_spark.functions.binning import target_encode

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("c", 5.0),
         ("a", None)],
        ["cat", "y"],
    )
    got = {
        (r["cat"], r["y"]): r["te"]
        for r in target_encode(df, "cat", "y").collect()
    }
    # LOO within 'a': each row sees the mean of the other two
    assert got[("a", 1.0)] == 2.5
    assert got[("a", 2.0)] == 2.0
    assert got[("a", 3.0)] == 1.5
    # null target: mean of the category's non-null rows
    assert got[("a", None)] == 2.0
    # singleton categories fall back to the global mean (21/5)
    assert got[("b", 10.0)] == 4.2
    assert got[("c", 5.0)] == 4.2


def test_target_encode_oracle_on_orders(tables, duck):
    from semantic_olap_spark.functions.binning import target_encode

    out = target_encode(
        tables["orders"], "o_orderpriority", "o_totalprice"
    ).select("o_orderkey", "o_orderpriority", "te")
    assert_matches(
        out,
        duck,
        """
        WITH s AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 sum(CAST(o_totalprice AS DECIMAL(38,6)))
                     OVER (PARTITION BY o_orderpriority) AS sg,
                 count(o_totalprice)
                     OVER (PARTITION BY o_orderpriority) AS ng
          FROM orders
        )
        SELECT o_orderkey, o_orderpriority,
               round((sg - CAST(o_totalprice AS DECIMAL(38,6)))::DOUBLE
                     / (ng - 1), 6) AS te
        FROM s
        """,
    )
