"""Cost model: predicted LLM judged-row counts vs the executor's actuals.

The headline contract: with ``probe_llm=True`` and a sample covering
the whole input, the estimate must EQUAL the accumulator-measured
request count of the real staged execution — the simulation is the
executor, so on full data there is nothing left to diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_olap_spark.llm.client import (
    default_llm_factory,
    wrap_cost_tracking,
)
from semantic_olap_spark.plans.costmodel import estimate_filter_cost
from semantic_olap_spark.plans.executor import run_filter

OPS = [
    {"id": 1, "operator_name": "num_filter",
     "parameters": {"conditions": [
         {"column": "n_chars", "threshold": 200, "operator": ">"}]}},
    {"id": 2, "operator_name": "sem_filter",
     "parameters": {"columns": ["text"], "condition": "rows about spark"}},
    {"id": 3, "operator_name": "sem_filter",
     "parameters": {"columns": ["text"], "condition": "mentions window"}},
]
TREE = ["AND", 1, ["OR", 2, 3]]


def test_full_sample_probe_equals_actual_requests(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    est = estimate_filter_cost(
        docs, OPS, TREE, sample_rows=n, probe_llm=True
    )
    factory, stats = wrap_cost_tracking(spark, default_llm_factory)
    run_filter(docs, OPS, TREE, factory).count()
    assert est.total_llm_calls == stats.requests
    assert est.per_op[2] > est.per_op[3] > 0  # OR: stage 2 shrinks
    assert est.total_rows == n and est.sample_rows == n


def test_sampled_estimate_within_tolerance(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    full = estimate_filter_cost(
        docs, OPS, TREE, sample_rows=n, probe_llm=True
    )
    sampled = estimate_filter_cost(
        docs, OPS, TREE, sample_rows=200, probe_llm=True
    )
    assert sampled.sample_rows == 200
    # limit() is not uniform sampling; allow a loose factor-2 band —
    # the point is order-of-magnitude planning, not precision
    assert full.total_llm_calls / 2.5 <= sampled.total_llm_calls
    assert sampled.total_llm_calls <= full.total_llm_calls * 2.5


def test_prior_mode_makes_no_llm_calls(spark, tables):
    docs = tables["documents"]
    factory, stats = wrap_cost_tracking(spark, default_llm_factory)
    est = estimate_filter_cost(
        docs, OPS, TREE, sample_rows=300, probe_llm=False,
        llm_factory=factory,
    )
    assert stats.requests == 0
    # first LLM leaf bound: every cheap-undecided row; later leaves
    # halve under the 50% prior
    assert est.per_op[2] > 0
    assert est.per_op[3] <= est.per_op[2]


def test_cheap_only_plan_costs_zero(spark, tables):
    docs = tables["documents"]
    est = estimate_filter_cost(
        docs,
        [OPS[0]],
        [1],
        sample_rows=100,
    )
    assert est.total_llm_calls == 0


def test_engine_estimate_then_run(spark, tables):
    from semantic_olap_spark.engine import OlapEngine

    eng = OlapEngine(
        tables["documents"], order_by=["doc_id"], track_costs=True
    )
    n = tables["documents"].count()
    est = eng.estimate(
        "mentions spark in text", sample_rows=n, probe_llm=True
    )
    assert est["reused_node"] is None
    assert est["operators"]
    before = eng.cost_stats.requests
    eng.run("mentions spark in text").count()
    actual_rows_judged = eng.cost_stats.requests - before
    # the estimate covers the per-row judge work; the run also spends
    # bounded driver-side planning calls, so compare with slack for
    # those (they are O(1), not O(rows))
    assert est["total_llm_calls"] <= actual_rows_judged
    assert actual_rows_judged - est["total_llm_calls"] < 50
    # an Equal cache hit estimates zero
    est2 = eng.estimate("mentions spark in text")
    assert est2["total_llm_calls"] == 0 and est2["reused_node"] is not None


def test_snapshot_shape(spark, tables):
    est = estimate_filter_cost(
        tables["documents"], OPS, TREE, sample_rows=100
    )
    snap = est.snapshot()
    assert set(snap) == {
        "total_rows", "sample_rows", "probed", "per_op", "total_llm_calls"
    }
