"""LLM rerank cascade (functions/retrieval.py llm_rerank).

Contracts: rerank order matches a hand-computed stub scoring; LLM
calls are bounded by the candidate count (never the corpus); the
unbounded-input guard raises; malformed backend replies degrade to
score 0 rather than ejecting the candidate.
"""

import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

from tests.conftest import fuzz_budget
from semantic_olap_spark.functions.retrieval import llm_rerank
from semantic_olap_spark.llm.client import BaseLLM, CountingLLM, StubLLM

# executor workers can't import the test module — ship the garbage
# stub by value instead of by reference
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _docs(spark):
    rows = [
        (1, "spark join spark"),          # spark:2 join:1 -> 3
        (2, "join join join"),            # 3
        (3, "spark performance"),         # 2
        (4, "nothing relevant here"),     # 0
        (5, "spark spark spark spark"),   # 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rerank_order_and_scores(spark):
    out = llm_rerank(
        _docs(spark), "text", "spark join performance", k=3
    ).collect()
    # ties broken by doc_id asc: scores 4,3,3 -> ids 5,1,2
    assert [(r["doc_id"], r["llm_score"]) for r in out] == [
        (5, 4), (1, 3), (2, 3)
    ]


def test_calls_bounded_by_candidates(spark):
    acc = spark.sparkContext.accumulator(0)
    factory = lambda: CountingLLM(StubLLM(), acc)  # noqa: E731
    docs = _docs(spark)
    llm_rerank(docs, "text", "spark", k=2, llm_factory=factory).collect()
    assert acc.value == docs.count()  # one judgment per candidate


def test_unbounded_input_guard(spark):
    big = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    with pytest.raises(ValueError, match="prescreen first"):
        llm_rerank(big, "text", "q", k=5, max_candidates=10)
    # explicit opt-out accepted
    out = llm_rerank(big, "text", "q", k=5, max_candidates=None)
    assert out.count() == 5


def _garbage_factory():
    # built on the worker from importable pieces — the test module
    # itself is not importable there
    return type(
        "GarbageLLM", (BaseLLM,),
        {"predict": lambda self, prompt: "no idea, sorry!"},
    )()


def test_malformed_reply_scores_zero(spark):
    out = llm_rerank(
        _docs(spark), "text", "spark", k=5, llm_factory=_garbage_factory
    ).collect()
    assert all(r["llm_score"] == 0 for r in out)
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4, 5]  # id tiebreak


def test_cascade_equals_full_scan_on_covering_prescreen(spark):
    # when the prescreen keeps everything, rerank == scoring the corpus
    docs = _docs(spark)
    full = llm_rerank(docs, "text", "spark join", k=5)
    assert [tuple(r) for r in full.collect()] == [
        tuple(r)
        for r in llm_rerank(
            docs.limit(5), "text", "spark join", k=5
        ).collect()
    ]


# ---- hypothesis: stub scores equal an independent token count ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["spark", "join", "scan", "filter", "merge", "window", "row"]

_DOC = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=12
).map(" ".join)

_HSETTINGS = dict(
    max_examples=fuzz_budget(10, 5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_HSETTINGS)
@given(docs=st.lists(_DOC, min_size=1, max_size=12),
       qwords=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3,
                       unique=True))
def test_scores_match_independent_count(spark, docs, qwords):
    query = " ".join(qwords)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = llm_rerank(df, "text", query, k=len(docs)).collect()
    # independent mirror of the stub judge: substring occurrences of
    # each SIGNIFICANT query token (the documented rule: len >= 3,
    # not a stopword — 'row' in _WORDS exercises the stopword path)
    # in the "text: <text>" rendering
    from semantic_olap_spark.llm.prompts import condition_tokens

    toks = condition_tokens(query)

    def score(t):
        rendered = f"text: {t}".lower()
        return sum(rendered.count(w) for w in toks)

    want = {i: score(t) for i, t in enumerate(docs)}
    assert {r["doc_id"]: r["llm_score"] for r in out} == want
    # ordering contract: (score desc, id asc)
    ids = [r["doc_id"] for r in out]
    assert ids == sorted(ids, key=lambda i: (-want[i], i))
