"""LLM cost accounting: accumulator-backed call counting.

The one metric a semantic-OLAP user tunes against is backend LLM
calls (VERDICT r2 item 3 / the reference's palimpzest baseline
``print_statistics``, palimpzest_agent.py:434-451).  Counts must
come from Spark accumulators — the semantic operators run in
executor-side Arrow UDF workers, where driver-object counters are
invisible.
"""

from pyspark.sql import functions as F

from semantic_olap_spark.llm.client import (
    CachingLLM,
    CountingLLM,
    StubLLM,
    default_llm_factory,
    wrap_cost_tracking,
)


class _ListSink:
    def __init__(self):
        self.total = 0

    def add(self, n):
        self.total += n


def test_counting_llm_counts_requests_and_batches():
    sink = _ListSink()
    llm = CountingLLM(StubLLM(), sink)
    llm.predict(
        "### task: sem_filter\nCondition: x\n### content:\nabc"
    )
    llm.predict_batch(
        ["### task: sem_filter\nCondition: x\n### content:\n" + t
         for t in ("a", "b", "c")]
    )
    assert sink.total == 4


def test_cache_interposition_counts_only_misses():
    backend = _ListSink()
    llm = CachingLLM(CountingLLM(StubLLM(), backend))
    p = "### task: sem_filter\nCondition: x\n### content:\nabc"
    llm.predict(p)
    llm.predict(p)
    llm.predict_batch([p, p, p])
    assert backend.total == 1  # one miss, everything else cached


def test_staged_executor_fewer_backend_calls_than_naive(spark, tables):
    from semantic_olap_spark.operators.semantic import sem_filter
    from semantic_olap_spark.plans.executor import run_filter

    docs = tables["documents"]
    n = docs.count()

    # naive: both LLM predicates evaluated over every row
    naive_factory, naive_stats = wrap_cost_tracking(spark, default_llm_factory)
    sem_filter(docs, ["text"], "rows about spark", naive_factory).count()
    sem_filter(docs, ["text"], "mentions window", naive_factory).count()
    assert naive_stats.requests == 2 * n

    # staged: cheap num_filter decides most rows first; the second
    # LLM leaf runs only on rows the first left undecided (OR tree)
    ops = [
        {"id": 1, "operator_name": "num_filter",
         "parameters": {"conditions": [
             {"column": "n_chars", "threshold": 200, "operator": ">"}]}},
        {"id": 2, "operator_name": "sem_filter",
         "parameters": {"columns": ["text"], "condition": "rows about spark"}},
        {"id": 3, "operator_name": "sem_filter",
         "parameters": {"columns": ["text"], "condition": "mentions window"}},
    ]
    staged_factory, staged_stats = wrap_cost_tracking(
        spark, default_llm_factory
    )
    run_filter(docs, ops, ["AND", 1, ["OR", 2, 3]], staged_factory).count()
    assert 0 < staged_stats.requests < naive_stats.requests
    assert staged_stats.backend_calls <= staged_stats.requests


def test_cascade_fewer_calls_than_unfiltered_sem(spark, tables):
    from semantic_olap_spark.plans.executor import PlanExecutor

    docs = tables["documents"]
    n = docs.count()
    factory, stats = wrap_cost_tracking(spark, default_llm_factory)
    ex = PlanExecutor(factory)
    ex.execute(
        docs,
        [
            {"operator": "keyword_filter",
             "params": {"columns": ["text"], "keywords": ["spark"],
                        "logic": "or"}},
            {"operator": "sem_filter",
             "params": {"columns": ["text"], "condition": "rows about spark"}},
        ],
    ).count()
    # the keyword prefilter keeps the LLM off most rows
    assert 0 < stats.requests < n


def test_engine_track_costs_surfaces_statistics(spark, tables):
    from semantic_olap_spark.engine import OlapEngine

    eng = OlapEngine(
        tables["documents"], order_by=["doc_id"], track_costs=True
    )
    eng.run("mentions spark in text").count()
    s = eng.statistics()
    assert s["llm_requests"] > 0
    assert 0 < s["llm_backend_calls"] <= s["llm_requests"]
    assert 0.0 <= s["cache_hit_rate"] <= 1.0
    assert s["cube_nodes"] == 2  # root + the filtered node

    # Equal-node reuse: a repeat query adds driver-side planning calls
    # but no per-row UDF work
    before = s["llm_requests"]
    eng.run("mentions spark in text").count()
    after = eng.statistics()["llm_requests"]
    assert after - before < 50


def test_bench_cascade_llm_calls_pinned_at_candidates(spark):
    """BENCH llm_calls contract (VERDICT r4 item 3): the retrieval
    cascade's backend calls equal |candidates| (the bm25 recall cut),
    never corpus size — a prompt-shape regression that judged the
    corpus would move this exact number."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.01"
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    tracked, stats = wrap_cost_tracking(spark, default_llm_factory)
    out = entry._q_bm25_rerank_cascade(spark, sf_dir, llm_factory=tracked)
    assert out.count() == 10
    assert stats.backend_calls == 40  # == bm25 k, the candidate cut
    assert stats.backend_calls < corpus
