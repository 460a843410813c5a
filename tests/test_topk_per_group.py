"""topk_per_group vs the DuckDB row_number oracle."""

from __future__ import annotations

from semantic_olap_spark.operators.deterministic import topk_per_group
from tests.conftest import assert_matches


def test_topk_per_group_oracle(tables, duck):
    out = topk_per_group(
        tables["orders"], "o_custkey", "o_totalprice", k=3,
        tiebreak=["o_orderkey"], rank_col="rank",
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    assert_matches(
        out,
        duck,
        """
        SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rank
          FROM orders
        ) WHERE rank <= 3
        """,
    )


def test_topk_per_group_plan_language(tables):
    from semantic_olap_spark.plans.executor import PlanExecutor

    ex = PlanExecutor()
    out = ex.execute(
        tables["orders"],
        [{"operator": "topk_per_group",
          "params": {"group_by": "o_orderstatus", "order_col": "o_totalprice",
                     "k": 2, "tiebreak": ["o_orderkey"]}}],
    )
    assert out.count() == 6  # 3 statuses × 2
    assert "_rn" not in out.columns


def test_topk_per_group_asc_nulls_last(spark):
    df = spark.createDataFrame(
        [("g", "1"), ("g", "x"), ("g", "3")], "grp string, v string"
    )
    out = topk_per_group(df, "grp", "v", k=2, order="asc").collect()
    assert sorted(r["v"] for r in out) == ["1", "3"]  # unparseable last


def test_topk_per_group_date_column(tables):
    # "latest order per customer" — DATE order columns must work
    out = topk_per_group(
        tables["orders"], "o_custkey", "o_orderdate", k=1,
        tiebreak=["o_orderkey"],
    )
    from pyspark.sql import functions as F

    direct = (
        tables["orders"]
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("latest"))
    )
    j = out.join(direct, "o_custkey")
    assert j.filter("o_orderdate != latest").count() == 0


def test_topk_per_group_text_column_lexicographic(spark):
    df = spark.createDataFrame(
        [("g", "banana"), ("g", "apple"), ("g", "cherry")],
        "grp string, v string",
    )
    top = topk_per_group(df, "grp", "v", k=1, order="desc").collect()
    assert top[0]["v"] == "cherry"
    bot = topk_per_group(df, "grp", "v", k=1, order="asc").collect()
    assert bot[0]["v"] == "apple"
