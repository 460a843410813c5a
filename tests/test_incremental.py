"""Incremental aggregate states: exact merge = exact recompute.

The contract under test: folding per-batch states with
``merge_agg_states`` is bit-identical to one global aggregate over
the concatenated data — for any batch split and any fold order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_olap_spark.functions.incremental import (
    agg_state,
    finalize_agg,
    merge_agg_states,
)
from tests.conftest import assert_matches

METRICS = ["o_totalprice"]


def _final(states, group_by="o_orderstatus"):
    return finalize_agg(
        merge_agg_states(states, METRICS, group_by=group_by), METRICS
    )


def test_two_batch_merge_equals_global(tables, duck):
    orders = tables["orders"]
    split = F.col("o_orderdate") < F.lit("1995-01-01")
    s1 = agg_state(orders.filter(split), METRICS, group_by="o_orderstatus")
    s2 = agg_state(orders.filter(~split), METRICS, group_by="o_orderstatus")
    assert_matches(
        _final([s1, s2]),
        duck,
        """
        SELECT o_orderstatus,
               count(*) AS n,
               count(o_totalprice) AS o_totalprice_count,
               round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)::DOUBLE
                 AS o_totalprice_sum,
               round(sum(CAST(o_totalprice AS DECIMAL(38,6)))::DOUBLE
                     / count(o_totalprice), 6) AS o_totalprice_avg,
               min(o_totalprice) AS o_totalprice_min,
               max(o_totalprice) AS o_totalprice_max
        FROM orders GROUP BY o_orderstatus
        """,
    )


def test_fold_order_irrelevant(tables):
    orders = tables["orders"]
    batches = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    states = [
        agg_state(b, METRICS, group_by="o_orderstatus") for b in batches
    ]
    a = _final(states).toPandas().sort_values("o_orderstatus")
    b = _final(states[::-1]).toPandas().sort_values("o_orderstatus")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # and both equal the unsplit aggregate
    c = (
        _final([agg_state(orders, METRICS, group_by="o_orderstatus")])
        .toPandas()
        .sort_values("o_orderstatus")
    )
    assert a.reset_index(drop=True).equals(c.reset_index(drop=True))


def test_disjoint_groups_union_semantics(spark):
    df1 = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "x"])
    df2 = spark.createDataFrame([("b", 5.0)], ["g", "x"])
    s = merge_agg_states(
        [agg_state(d, ["x"], group_by="g") for d in (df1, df2)],
        ["x"],
        group_by="g",
    )
    rows = {r["g"]: r for r in finalize_agg(s, ["x"]).collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["x_sum"] == 3.0
    assert rows["b"]["n"] == 1 and rows["b"]["x_avg"] == 5.0
    assert rows["b"]["x_min"] == 5.0 and rows["b"]["x_max"] == 5.0


def test_null_metric_rows_counted_in_n_only(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], ["g", "x"]
    )
    out = finalize_agg(
        agg_state(df, ["x"], group_by="g"), ["x"]
    ).collect()[0]
    assert out["n"] == 3
    assert out["x_sum"] == 4.0
    assert out["x_avg"] == 2.0  # sum / non-null count, not / n


def test_state_shuffles_only_state_rows(tables):
    # scale shape: the merge plan aggregates the unioned STATE frames
    # — no re-scan of the base table inside the merge
    orders = tables["orders"]
    s1 = agg_state(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        METRICS,
        group_by="o_orderstatus",
    )
    import io
    from contextlib import redirect_stdout

    merged = merge_agg_states([s1, s1], METRICS, group_by="o_orderstatus")
    buf = io.StringIO()
    with redirect_stdout(buf):
        merged.explain("formatted")
    plan = buf.getvalue()
    # partial aggregation on both legs before the union's exchange
    assert plan.count("HashAggregate") >= 2
