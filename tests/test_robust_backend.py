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
