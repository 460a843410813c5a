"""Plan-language extensions: join step with table registry, custom
operator registration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.plans.executor import PlanExecutor
from tests.conftest import assert_matches


def test_join_step_star_schema(tables, duck):
    ex = PlanExecutor(tables=tables)
    out = ex.execute(
        tables["orders"],
        [
            {"operator": "join",
             "params": {"right": "customer", "broadcast": True,
                        "select": ["c_custkey", "c_nationkey"],
                        "left_on": "o_custkey", "right_on": "c_custkey"}},
            {"operator": "join",
             "params": {"right": "nation", "broadcast": True,
                        "select": ["n_nationkey", "n_name"],
                        "left_on": "c_nationkey", "right_on": "n_nationkey"}},
            {"operator": "num_reduce",
             "params": {"columns": ["o_totalprice"], "agg": "sum",
                        "group_by": "n_name", "round_to": 2}},
        ],
    )
    assert_matches(
        out,
        duck,
        """
        SELECT n_name, round(sum(o_totalprice), 2) AS sum_o_totalprice
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    )
    assert [s["operator_name"] for s in ex.lineage] == [
        "join", "join", "num_reduce"
    ]


def test_join_step_same_name_key(tables):
    li = tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
    ex = PlanExecutor(tables={"li": li})
    out = ex.execute(
        tables["orders"].select("o_orderkey", "o_orderpriority"),
        [{"operator": "join", "params": {"right": "li", "on": "o_orderkey"}}],
    )
    assert out.count() == tables["lineitem"].count()


def test_join_step_errors(tables):
    ex = PlanExecutor(tables=tables)
    with pytest.raises(ValueError, match="unknown table"):
        ex.execute(
            tables["orders"],
            [{"operator": "join", "params": {"right": "nope", "on": "x"}}],
        )
    with pytest.raises(ValueError, match="needs on="):
        ex.execute(
            tables["orders"],
            [{"operator": "join", "params": {"right": "nation"}}],
        )


def test_register_custom_operator(tables):
    ex = PlanExecutor()
    ex.register(
        "double_price",
        lambda df, p: df.withColumn(
            p.get("out", "doubled"), F.col(p["col"]) * 2
        ),
    )
    out = ex.execute(
        tables["orders"],
        [{"operator": "double_price", "params": {"col": "o_totalprice"}}],
    )
    row = out.select("o_totalprice", "doubled").first()
    assert row["doubled"] == row["o_totalprice"] * 2


def test_register_cannot_shadow_structural(tables):
    ex = PlanExecutor()
    with pytest.raises(ValueError, match="structural"):
        ex.register("join", lambda df, p: df)


def test_register_overrides_builtin(tables):
    # custom ops take precedence over the built-in table — the
    # documented override semantics
    ex = PlanExecutor()
    ex.register("dedup_exact", lambda df, p: df.limit(3))
    out = ex.execute(tables["orders"], [{"operator": "dedup_exact"}])
    assert out.count() == 3
