"""BudgetLLM: the hard runaway-cost stop (llm/client.py).

Contracts: a semantic operator whose LLM spend exceeds the per-worker
cap FAILS (task error surfaces as a Spark exception) instead of
billing; a sufficient budget passes with identical results to the
unbudgeted stub; cache hits inside a CachingLLM cost nothing against
a budget placed inside it; batch charging is all-or-nothing.
"""

import pytest
from pyspark.sql.utils import PythonException

from semantic_olap_spark.llm.client import (
    BudgetLLM,
    CachingLLM,
    LLMBudgetExceeded,
    StubLLM,
)
from semantic_olap_spark.operators.semantic import sem_filter


def _docs(spark, n=40, parts=1):
    # spark.range with explicit partitioning: a createDataFrame local
    # relation arrives at the UDF as one tiny Arrow chunk per parent
    # slice, and each chunk gets a fresh factory — file-backed scans
    # (the deployment shape) evaluate one factory per task, which is
    # the scope the budget documents
    from pyspark.sql import functions as F

    return (
        spark.range(0, n, numPartitions=parts)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 3 == 0, "spark join")
            .otherwise("nothing"),
        )
    )


def test_operator_fails_hard_over_budget(spark):
    # one partition = one worker sees all 40 rows; the documented
    # per-evaluation-context scope means a multi-partition frame
    # splits the spend (test_budget_scope_is_per_process below)
    out = sem_filter(
        _docs(spark), ["text"], "rows about spark",
        llm_factory=lambda: BudgetLLM(StubLLM(), max_calls=5),
    )
    with pytest.raises(PythonException, match="budget exceeded"):
        out.count()


def test_operator_passes_under_budget(spark):
    df = _docs(spark)
    budgeted = sem_filter(
        df, ["text"], "rows about spark",
        llm_factory=lambda: BudgetLLM(StubLLM(), max_calls=100_000),
    )
    plain = sem_filter(df, ["text"], "rows about spark")
    assert sorted(r["doc_id"] for r in budgeted.collect()) == sorted(
        r["doc_id"] for r in plain.collect()
    )


def test_cache_hits_are_free():
    llm = CachingLLM(BudgetLLM(StubLLM(), max_calls=1))
    from semantic_olap_spark.llm import prompts as P

    p = P.filter_prompt("about spark", "text: spark")
    assert llm.predict(p) == llm.predict(p)  # second hit: cache, free
    with pytest.raises(LLMBudgetExceeded):
        llm.predict(P.filter_prompt("about spark", "text: other"))


def test_batch_charge_is_all_or_nothing():
    inner = StubLLM()
    llm = BudgetLLM(inner, max_calls=3)
    from semantic_olap_spark.llm import prompts as P

    batch = [P.filter_prompt("x", f"text: spark {i}") for i in range(4)]
    with pytest.raises(LLMBudgetExceeded):
        llm.predict_batch(batch)
    assert llm.calls == 0  # nothing spent on the refused batch
    llm.predict_batch(batch[:3])
    assert llm.calls == 3


def test_budget_scope_is_per_process(spark):
    # the same 40-row frame over many partitions stays under a
    # per-worker cap of 5 — the N × max_calls scope the docstring
    # tells users to size for
    out = sem_filter(
        _docs(spark, parts=16), ["text"], "rows about spark",
        llm_factory=lambda: BudgetLLM(StubLLM(), max_calls=5),
    )
    assert out.count() > 0  # no trip: spend split across workers


def test_validation():
    with pytest.raises(ValueError, match="max_calls"):
        BudgetLLM(StubLLM(), max_calls=0)
