"""Regression pins for the round-4 ADVICE findings."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_scd2_same_seq_delete_closes_update(spark):
    """A delete sharing (key, seq) with an update closes it: the
    version row gets a zero-length interval and is_current=False —
    the delete wins, matching apply_cdc's tiebreak."""
    from semantic_olap_spark.functions.cdc import scd2_history

    changes = spark.createDataFrame(
        [(1, 10, "I", "a"), (1, 20, "U", "b"), (1, 20, "D", None)],
        ["k", "seq", "op", "v"],
    )
    rows = {
        (r["k"], r["valid_from"]): r
        for r in scd2_history(changes, "k", "seq").collect()
    }
    first = rows[(1, 10)]
    assert first["valid_to"] == 20 and first["is_current"] is False
    second = rows[(1, 20)]
    assert second["valid_to"] == 20  # closed by the same-seq delete
    assert second["is_current"] is False


def test_pivot_raw_sanitized_crossover_refused(spark):
    """pivot values {'x','p_x'} with pivot_col 'p': 'x' sanitizes to
    'p_x' which is also a raw value — sequential withColumnsRenamed
    would cascade both onto 'p_p_x'; must refuse instead."""
    from semantic_olap_spark.operators.reshape import pivot_agg

    df = spark.createDataFrame(
        [(1, "x", 1.0), (1, "p_x", 2.0)], ["g", "p", "v"]
    )
    with pytest.raises(ValueError, match="raw pivot values"):
        pivot_agg(df, ["g"], "p", ["x", "p_x"], "v")


def test_fuzzy_join_preserves_literal_rk_column(spark):
    """A right column genuinely named '_rk_foo' (left col different)
    must come through unrenamed — the rename-back is tracked by flag,
    not inferred from the prefix."""
    from semantic_olap_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame([("abc", "g")], ["name", "blk"])
    right = spark.createDataFrame([("abd", "g")], ["_rk_foo", "blk"])
    out = fuzzy_join(left, right, "name", "_rk_foo", max_dist=2,
                     block_col="blk")
    assert "_rk_foo" in out.columns
    assert "foo_right" not in out.columns
    assert out.count() == 1


def test_materialized_state_visible_without_success_marker(
    spark, tmp_path
):
    """Generations must be recognized by the explicit commit marker
    even when Hadoop's _SUCCESS files are absent (e.g. committers
    configured with marksuccessfuljobs=false)."""
    from semantic_olap_spark.functions.incremental import finalize_agg
    from semantic_olap_spark.streaming.materialized import (
        fold_batch,
        read_agg_state,
    )

    path = str(tmp_path / "state")
    batch = spark.createDataFrame([("a", 1.0), ("a", 3.0)], ["g", "x"])
    fold_batch(batch, 0, path, ["x"], group_by="g")
    # simulate a cluster that never writes _SUCCESS
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f == "_SUCCESS":
                os.remove(os.path.join(root, f))
    state = read_agg_state(spark, path)  # must not raise
    out = finalize_agg(state, ["x"]).collect()
    assert len(out) == 1

    # replay of epoch 1 folds on top and stays visible
    batch2 = spark.createDataFrame([("a", 5.0)], ["g", "x"])
    fold_batch(batch2, 1, path, ["x"], group_by="g")
    row = finalize_agg(read_agg_state(spark, path), ["x"]).collect()[0]
    assert row["x_sum"] == pytest.approx(9.0)


def test_probe_llm_cost_estimate_bounded_calls(spark):
    """probe_llm=True must stay within sample_rows × #llm-leaves
    judgments even against a non-caching backend: the undecided chain
    is persisted between stages so earlier probe columns never
    recompute (unpersisted, 4 AND leaves would cost ~n·(1+2+3)=6n)."""
    from semantic_olap_spark.llm.client import StubLLM, wrap_cost_tracking
    from semantic_olap_spark.plans.costmodel import estimate_filter_cost

    n = 20
    df = spark.createDataFrame(
        [(i, f"doc about sports cats happy fun {i}") for i in range(n)],
        ["id", "text"],
    )
    # every condition token appears in every row → nothing shrinks,
    # so without the persist the recompute blowup is maximal
    ops = [
        {"id": k, "operator_name": "sem_filter",
         "parameters": {"columns": ["text"], "condition": cond}}
        for k, cond in [
            (1, "about sports"), (2, "mentions cats"),
            (3, "is happy"), (4, "looks fun"),
        ]
    ]
    # StubLLM (the class as factory) is non-caching: every probe
    # judgment is a counted request
    factory, stats = wrap_cost_tracking(spark, StubLLM)
    est = estimate_filter_cost(
        df, ops, logic=[1, 2, 3, 4], sample_rows=n,
        llm_factory=factory, probe_llm=True,
    )
    assert est.probed
    assert 0 < stats.requests <= n * 4


def test_salted_agg_plan_shows_two_phase_salt(tables):
    """The physical plan must show the two-phase shape: a first
    aggregation keyed on (key, _salt) — spreading the hot key over
    salt_buckets reducers — then a final aggregation on the key
    alone.  (Row parity with the plain agg is pinned in
    test_deterministic.py; this pins the SHAPE the skew bench rows
    rely on.)"""
    from semantic_olap_spark.operators.skew import salted_agg, salted_join

    plan = salted_agg(
        tables["orders"], ["o_custkey"], sum_cols=["o_totalprice"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert "hashpartitioning" in plan.lower()
    agg_lines = [
        ln for ln in plan.splitlines() if "HashAggregate" in ln
    ]
    assert any("_salt" in ln for ln in agg_lines), agg_lines
    assert any(
        "_salt" not in ln and "o_custkey" in ln for ln in agg_lines
    ), agg_lines

    jplan = salted_join(
        tables["orders"].hint("merge"),
        tables["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in jplan
    assert "_salt" in jplan  # join key includes the salt
