"""Deterministic operators vs the DuckDB oracle (SURVEY.md §5 item 1)."""

from pyspark.sql import functions as F

from semantic_olap_spark.operators.deterministic import (
    count_op,
    keyword_filter,
    num_filter,
    num_reduce,
    num_topk,
)
from tests.conftest import assert_matches


def test_keyword_filter_contains_or(tables, duck):
    df = keyword_filter(
        tables["part"], ["p_name", "p_type"], ["green", "steel"], "or", "contains"
    )
    assert_matches(
        df,
        duck,
        """
        SELECT * FROM part
        WHERE contains(lower(concat_ws(' ', p_name, p_type)), 'green')
           OR contains(lower(concat_ws(' ', p_name, p_type)), 'steel')
        """,
    )


def test_keyword_filter_and(tables, duck):
    df = keyword_filter(
        tables["part"], ["p_name", "p_type"], ["green", "steel"], "and", "contains"
    )
    assert_matches(
        df,
        duck,
        """
        SELECT * FROM part
        WHERE contains(lower(concat_ws(' ', p_name, p_type)), 'green')
          AND contains(lower(concat_ws(' ', p_name, p_type)), 'steel')
        """,
    )


def test_keyword_filter_irrelevant(tables, duck):
    df = keyword_filter(tables["orders"], ["o_orderpriority"], ["urgent"], "and",
                        "irrelevant")
    assert_matches(
        df,
        duck,
        "SELECT * FROM orders WHERE NOT contains(lower(o_orderpriority), 'urgent')",
    )


def test_keyword_filter_irrelevant_multi_or(tables, duck):
    # reference semantics (Operaters.py:38-40): combine the contains
    # masks per logic FIRST, then negate the combined mask — so
    # logic='or' keeps rows containing NONE of the keywords
    df = keyword_filter(
        tables["orders"], ["o_orderpriority"], ["urgent", "high"], "or",
        "irrelevant",
    )
    assert_matches(
        df,
        duck,
        """
        SELECT * FROM orders
        WHERE NOT (contains(lower(o_orderpriority), 'urgent')
                OR contains(lower(o_orderpriority), 'high'))
        """,
    )


def test_keyword_filter_irrelevant_multi_and(tables, duck):
    # logic='and' + irrelevant: keep rows NOT containing all keywords
    df = keyword_filter(
        tables["part"], ["p_name", "p_type"], ["green", "steel"], "and",
        "irrelevant",
    )
    assert_matches(
        df,
        duck,
        """
        SELECT * FROM part
        WHERE NOT (contains(lower(concat_ws(' ', p_name, p_type)), 'green')
               AND contains(lower(concat_ws(' ', p_name, p_type)), 'steel'))
        """,
    )


def test_keyword_filter_equal(tables, duck):
    df = keyword_filter(tables["nation"], ["n_name"], ["france"], "or", "equal")
    assert_matches(df, duck, "SELECT * FROM nation WHERE lower(n_name) = 'france'")


def test_keyword_filter_contained_in(tables, duck):
    # cell ⊂ keyword: nation names that appear inside the phrase
    df = keyword_filter(
        tables["nation"], ["n_name"], ["the great republic of france"], "or",
        "contained_in",
    )
    assert_matches(
        df,
        duck,
        "SELECT * FROM nation WHERE contains('the great republic of france', lower(n_name))",
    )


def test_num_filter_and(tables, duck):
    df = num_filter(
        tables["lineitem"],
        [
            {"column": "l_quantity", "threshold": 30, "operator": ">"},
            {"column": "l_discount", "threshold": 0.05, "operator": "<="},
        ],
        "and",
    )
    assert_matches(
        df,
        duck,
        """
        SELECT * FROM lineitem
        WHERE coalesce(try_cast(l_quantity AS DOUBLE) > 30, false)
          AND coalesce(try_cast(l_discount AS DOUBLE) <= 0.05, false)
        """,
    )


def test_num_filter_or_null_false(spark, duck):
    # unparseable values must compare False, not error (Operaters.py:103)
    df = spark.createDataFrame(
        [("1", "a"), ("x", "b"), (None, "c"), ("5", "d")], ["v", "tag"]
    )
    out = num_filter(df, [{"column": "v", "threshold": 2, "operator": "<"}])
    assert sorted(r["tag"] for r in out.collect()) == ["a"]


def test_num_reduce_grouped(tables, duck):
    df = num_reduce(
        tables["lineitem"], ["l_quantity", "l_extendedprice"], "sum",
        "l_returnflag", round_to=2,
    )
    assert_matches(
        df,
        duck,
        """
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_l_quantity,
               round(sum(l_extendedprice), 2) AS sum_l_extendedprice
        FROM lineitem GROUP BY l_returnflag
        """,
    )


def test_num_reduce_global_avg(tables, duck):
    df = num_reduce(tables["orders"], ["o_totalprice"], "avg", round_to=4)
    assert_matches(
        df,
        duck,
        "SELECT round(avg(o_totalprice), 4) AS avg_o_totalprice FROM orders",
    )


def test_count_with_distinct(tables, duck):
    df = count_op(tables["orders"], "o_orderstatus", ["o_custkey"])
    assert_matches(
        df,
        duck,
        """
        SELECT o_orderstatus, count(*) AS count,
               count(DISTINCT o_custkey) AS distinct_o_custkey
        FROM orders GROUP BY o_orderstatus
        """,
    )


def test_count_global(tables, duck):
    df = count_op(tables["lineitem"])
    assert_matches(df, duck, "SELECT count(*) AS count FROM lineitem")


def test_num_topk_desc(tables, duck):
    df = num_topk(tables["orders"], "o_totalprice", 10, "desc",
                  tiebreak=["o_orderkey"])
    assert_matches(
        df,
        duck,
        "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    )


def test_num_topk_asc(tables, duck):
    df = num_topk(tables["orders"], "o_totalprice", 7, "asc",
                  tiebreak=["o_orderkey"])
    assert_matches(
        df,
        duck,
        "SELECT * FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 7",
    )


def test_num_topk_nulls_last(spark):
    df = spark.createDataFrame(
        [("9", 1), ("x", 2), ("3", 3), (None, 4)], ["v", "id"]
    )
    top = num_topk(df, "v", 3, "desc", tiebreak=["id"]).select("id").collect()
    assert [r["id"] for r in top] == [1, 3, 2]


def test_salted_agg_matches_plain_agg(tables, duck):
    from semantic_olap_spark.operators.skew import salted_agg

    df = salted_agg(
        tables["lineitem"], ["l_returnflag"],
        sum_cols=["l_quantity", "l_extendedprice"],
    )
    assert_matches(
        df,
        duck,
        """
        SELECT l_returnflag, count(*) AS count,
               round(sum(l_quantity), 2) AS sum_l_quantity,
               round(sum(l_extendedprice), 2) AS sum_l_extendedprice
        FROM lineitem GROUP BY l_returnflag
        """,
    )


def test_count_approx_distinct_close(tables):
    # the 100 TB path: HLL distinct within its standard error
    exact = {
        r["o_orderstatus"]: r["distinct_o_custkey"]
        for r in count_op(tables["orders"], "o_orderstatus", ["o_custkey"]).collect()
    }
    approx = {
        r["o_orderstatus"]: r["distinct_o_custkey"]
        for r in count_op(
            tables["orders"], "o_orderstatus", ["o_custkey"], approx=True
        ).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(5, 0.1 * v)


def test_num_filter_pushes_to_parquet_scan(tables):
    # scale check: the numeric predicate must reach the scan
    # (row-group skipping via min/max stats)
    df = num_filter(
        tables["lineitem"],
        [{"column": "l_quantity", "threshold": 30, "operator": ">"}],
    ).select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_run_filter_cheap_tree_pushes_num_predicate(tables):
    from semantic_olap_spark.plans.executor import run_filter

    out = run_filter(
        tables["lineitem"],
        [
            {"id": 1, "operator_name": "num_filter",
             "parameters": {"conditions": [
                 {"column": "l_quantity", "threshold": 30, "operator": ">"}]}},
            {"id": 2, "operator_name": "keyword_filter",
             "parameters": {"columns": ["l_returnflag"], "keywords": ["a"]}},
        ],
        ["AND", 1, 2],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(l_quantity,30.0)" in plan


def test_topk_plan_is_take_ordered(tables):
    # scale check: top-k must not global-sort
    df = num_topk(tables["orders"], "o_totalprice", 10, "desc", ["o_orderkey"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_salted_join_matches_plain_join(tables):
    from pyspark.sql import functions as F

    from semantic_olap_spark.operators.skew import salted_join

    orders = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    cust = tables["customer"].select("c_custkey", "c_nationkey")
    plain = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "c_nationkey")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust,
        on="c_custkey", salt_buckets=8,
    ).select("o_orderkey", "c_nationkey")
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b and len(a) > 0


def test_salted_join_left_keeps_unmatched_fact_rows(spark):
    from semantic_olap_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "x"]
    )
    dim = spark.createDataFrame([(1, "D1")], ["k", "d"])
    out = salted_join(fact, dim, on="k", how="left", salt_buckets=4)
    got = sorted((r["k"], r["d"]) for r in out.collect())
    assert got == [(1, "D1"), (2, None), (3, None)]


def test_salted_join_rejects_right_and_clash(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from semantic_olap_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, 2)], ["k", "v"])
    with _pytest.raises(ValueError):
        salted_join(a, a, on="k", how="right")
    with _pytest.raises(ValueError):
        salted_join(a.withColumn("_salt", F.lit(1)), a, on="k")
