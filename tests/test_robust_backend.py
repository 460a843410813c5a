"""Integration: a backend that wraps every JSON answer in markdown
fences and prose must produce identical results to the plain stub —
the repair layer (llm/repair.py) absorbs the damage at every parse
site (operators, planner, rollup, engine)."""

import sys

from pyspark import cloudpickle

from semantic_olap_spark.engine import OlapEngine
from semantic_olap_spark.llm.client import CachingLLM, StubLLM
from semantic_olap_spark.operators.semantic import filter_enum_llm, sem_group
from semantic_olap_spark.plans.planner import dice_plan
from tests.conftest import assert_matches

# executor workers can't import the test module — ship the fenced
# stub by value instead of by reference
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class FencedStub(StubLLM):
    """Emits JSON the way real chat models do: fenced, with prose."""

    def predict(self, prompt: str) -> str:
        out = super().predict(prompt)
        if out.startswith(("{", "[")):
            return f"Sure! Here is the JSON you asked for:\n```json\n{out}\n```\nHope this helps."
        return out


def fenced_factory():
    return CachingLLM(FencedStub())


def test_filter_enum_with_fenced_backend(tables, duck):
    df = filter_enum_llm(
        tables["orders"], "o_orderpriority", "urgent priority",
        llm_factory=fenced_factory,
    )
    assert_matches(
        df,
        duck,
        "SELECT * FROM orders WHERE contains(lower(o_orderpriority), 'urgent')",
    )


def test_sem_group_with_fenced_backend(tables, duck):
    df = sem_group(
        tables["documents"], ["text"],
        "group by workload type, one of: scan, join, sort", "workload",
        llm_factory=fenced_factory,
    ).select("doc_id", "workload")
    assert_matches(
        df,
        duck,
        """
        SELECT doc_id,
               CASE WHEN contains(lower(text), 'scan') THEN 'scan'
                    WHEN contains(lower(text), 'join') THEN 'join'
                    WHEN contains(lower(text), 'sort') THEN 'sort'
                    ELSE 'other' END AS workload
        FROM documents
        """,
    )


def test_dice_plan_with_fenced_backend(tables):
    plan = dice_plan(
        tables["events"], "props", "value > 50", llm_factory=fenced_factory
    )
    assert plan["optimize"]["strategy"] == "pattern_extraction"


def test_engine_lifecycle_with_fenced_backend(tables):
    eng = OlapEngine(
        tables["documents"], llm_factory=fenced_factory, order_by=["doc_id"]
    )
    out = eng.run("mentions spark then group lang into lang_family and count")
    assert {"lang_family", "count_of_lang_family"} <= set(out.columns)
    plain = OlapEngine(tables["documents"], order_by=["doc_id"]).run(
        "mentions spark then group lang into lang_family and count"
    )
    got = {(r["lang_family"], r["count_of_lang_family"]) for r in out.collect()}
    want = {(r["lang_family"], r["count_of_lang_family"]) for r in plain.collect()}
    assert got == want


def test_concurrent_batch_speedup_and_parity():
    import time

    from semantic_olap_spark.llm.client import ConcurrentLLM, StubLLM

    class SlowBackend(StubLLM):
        """Mock network-bound endpoint: fixed per-prompt latency."""

        def predict(self, prompt):
            time.sleep(0.01)
            return super().predict(prompt)

    prompts = [
        "### task: sem_filter\nCondition: about spark\n### content:\n"
        + ("spark row" if i % 2 else "scan row") + str(i)
        for i in range(64)
    ]
    t0 = time.perf_counter()
    seq = SlowBackend().predict_batch(prompts)
    t_seq = time.perf_counter() - t0

    # best-of-2 on the concurrent sample: the 4x pin is about the
    # thread pool's shape, not the host's scheduler — a single
    # sample can lose 16 worker threads to an unrelated CPU-saturated
    # process (observed: 0.11s warm vs 1.77s under a full 32-core
    # Spark job) and fail a true contract
    conc = ConcurrentLLM(SlowBackend(), max_workers=16)
    t_par = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        par = conc.predict_batch(prompts)
        t_par = min(t_par, time.perf_counter() - t0)

    assert par == seq  # order-preserving, identical answers
    assert t_seq / t_par >= 4  # 64 prompts / 16 workers: ≥4x observed


def test_concurrent_llm_pickles_without_pool():
    import pickle

    from semantic_olap_spark.llm.client import ConcurrentLLM, StubLLM

    llm = ConcurrentLLM(StubLLM(), max_workers=4)
    llm.predict_batch([
        "### task: sem_filter\nCondition: x\n### content:\nabc",
    ] * 3)
    clone = pickle.loads(pickle.dumps(llm))
    assert clone._pool is None
    out = clone.predict_batch([
        "### task: sem_filter\nCondition: x\n### content:\nx y",
        "### task: sem_filter\nCondition: x\n### content:\nq",
    ])
    assert len(out) == 2


def test_concurrent_under_cache_results_unchanged(tables):
    from semantic_olap_spark.llm.client import (
        CachingLLM,
        ConcurrentLLM,
        StubLLM,
    )
    from semantic_olap_spark.operators.semantic import sem_filter

    def factory():
        return CachingLLM(ConcurrentLLM(StubLLM(), max_workers=8))

    base = sem_filter(tables["documents"], ["text"], "rows about spark")
    conc = sem_filter(
        tables["documents"], ["text"], "rows about spark", factory
    )
    assert sorted(r.doc_id for r in base.collect()) == sorted(
        r.doc_id for r in conc.collect()
    )
