"""Pivot / cube / rollup / grouping-sets vs the DuckDB oracle.

Value columns are chosen so sums are integer-valued doubles
(``l_quantity``) or order-free aggregates (``max``) — exact under
any summation order, no rounding epsilon in the compare.
"""

from __future__ import annotations

import pytest

from semantic_olap_spark.operators.reshape import (
    cube_agg,
    grouping_sets_agg,
    pivot_agg,
    rollup_agg,
)
from tests.conftest import assert_matches


def test_pivot_max_price(tables, duck):
    out = pivot_agg(
        tables["orders"],
        ["o_orderpriority"],
        "o_orderstatus",
        ["F", "O", "P"],
        "o_totalprice",
        agg="max",
    )
    assert_matches(
        out,
        duck,
        """
        SELECT o_orderpriority,
               MAX(o_totalprice) FILTER (WHERE o_orderstatus='F') AS o_orderstatus_F,
               MAX(o_totalprice) FILTER (WHERE o_orderstatus='O') AS o_orderstatus_O,
               MAX(o_totalprice) FILTER (WHERE o_orderstatus='P') AS o_orderstatus_P
        FROM orders GROUP BY o_orderpriority
        """,
    )


def test_pivot_missing_value_is_null(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)], "g string, s string, v double"
    )
    out = pivot_agg(df, ["g"], "s", ["x", "y", "z"], "v", agg="sum")
    rows = {r["g"]: r for r in out.collect()}
    assert rows["b"]["s_y"] is None and rows["b"]["s_z"] is None
    assert rows["a"]["s_x"] == 1.0 and rows["a"]["s_y"] == 2.0


def test_pivot_requires_values(tables):
    with pytest.raises(ValueError, match="explicit pivot_values"):
        pivot_agg(tables["orders"], ["o_orderpriority"], "o_orderstatus", [], "o_totalprice")


def test_cube_qty(tables, duck):
    out = cube_agg(
        tables["lineitem"], ["l_returnflag", "l_linestatus"], ["l_quantity"]
    )
    assert_matches(
        out,
        duck,
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING_ID(l_returnflag, l_linestatus) AS gid,
               SUM(l_quantity) AS sum_l_quantity
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
    )


def test_rollup_qty(tables, duck):
    out = rollup_agg(
        tables["lineitem"], ["l_returnflag", "l_linestatus"], ["l_quantity"]
    )
    assert_matches(
        out,
        duck,
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING_ID(l_returnflag, l_linestatus) AS gid,
               SUM(l_quantity) AS sum_l_quantity
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
    )


def test_grouping_sets_qty(tables, duck):
    out = grouping_sets_agg(
        tables["lineitem"],
        [["l_returnflag"], ["l_linestatus"], []],
        ["l_quantity"],
    )
    assert_matches(
        out,
        duck,
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING_ID(l_returnflag, l_linestatus) AS gid,
               SUM(l_quantity) AS sum_l_quantity
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
    )


def test_rollup_levels_consistent(tables):
    # the () level of the rollup equals the plain global sum
    out = rollup_agg(
        tables["lineitem"], ["l_returnflag", "l_linestatus"], ["l_quantity"]
    )
    total = out.filter("gid = 3").collect()[0]["sum_l_quantity"]
    direct = (
        tables["lineitem"].selectExpr("sum(cast(l_quantity as double)) s").collect()[0]["s"]
    )
    assert total == direct


def test_reshape_steps_in_plan_language(tables):
    # reshape ops are plan-language operators like every pipeline op
    from semantic_olap_spark.plans.executor import PlanExecutor

    ex = PlanExecutor()
    out = ex.execute(
        tables["lineitem"],
        [
            {"operator": "num_filter",
             "params": {"conditions": [
                 {"column": "l_quantity", "threshold": 10, "operator": ">"}
             ]}},
            {"operator": "cube",
             "params": {"dims": ["l_returnflag", "l_linestatus"],
                        "value_cols": ["l_quantity"]}},
        ],
    )
    direct = cube_agg(
        tables["lineitem"].filter("cast(l_quantity as double) > 10"),
        ["l_returnflag", "l_linestatus"],
        ["l_quantity"],
    )
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731 — None-safe sort
    assert sorted(map(key, out.collect())) == sorted(
        map(key, direct.collect())
    )
    assert ex.lineage[-1]["operator_name"] == "cube"


def test_cube_prereduce_plan(tables):
    # self-merging aggs pre-reduce to the finest group BEFORE the
    # 2^d Expand: the Expand must sit ABOVE the first aggregation
    # (it multiplies |finest groups| rows, not the raw scan), at the
    # cost of a second — tiny — exchange.  r05 scale study measured
    # the direct form at 10.7x per 10x data; this pins the fix.
    out = cube_agg(
        tables["lineitem"], ["l_returnflag", "l_linestatus"], ["l_quantity"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "Expand" in plan
    # Expand appears above (printed before) the scan-side aggregate:
    # everything below the first Expand line must already contain a
    # HashAggregate (the finest-group pre-reduce)
    below_expand = plan.split("Expand", 1)[1]
    assert "HashAggregate" in below_expand


def test_cube_avg_stays_single_pass(tables):
    # avg is not self-merging: direct Expand-then-aggregate plan,
    # one exchange, no pre-reduce
    out = cube_agg(
        tables["lineitem"], ["l_returnflag", "l_linestatus"],
        ["l_quantity"], agg="avg",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" in plan


def test_cube_null_dim_values_survive_prereduce(spark):
    # a genuine NULL dim value must stay distinct from a rolled-up
    # level through the pre-reduce (gid disambiguates); duckdb mirror
    # on the same literal rows
    import duckdb

    rows = [("a", None, 1.0), ("a", "x", 2.0), (None, "x", 4.0),
            (None, None, 8.0), ("a", None, 16.0)]
    df = spark.createDataFrame(rows, "d1 string, d2 string, v double")
    out = cube_agg(df, ["d1", "d2"], ["v"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES "
        "('a', NULL, 1.0), ('a', 'x', 2.0), (NULL, 'x', 4.0), "
        "(NULL, NULL, 8.0), ('a', NULL, 16.0)) AS t(d1, d2, v)"
    )
    want = con.execute(
        "SELECT d1, d2, GROUPING_ID(d1, d2) AS gid, SUM(v) AS sum_v "
        "FROM t GROUP BY CUBE (d1, d2)"
    ).fetchall()
    key = lambda r: tuple(str(x) for x in r)  # noqa: E731
    got = [
        (r["d1"], r["d2"], r["gid"], r["sum_v"])
        for r in (row.asDict() for row in out.collect())
    ]
    assert sorted(map(key, got)) == sorted(map(key, want))
