"""Property: staged Kleene execution ≡ naive full evaluation.

The staged executor's whole point is running LLM leaves on fewer
rows WITHOUT changing the result (SURVEY §4.2).  Specific trees are
pinned in test_executor.py; this is the randomized version — for
arbitrary AND/OR trees over a random mix of cheap and LLM leaves,
``run_filter`` must return exactly the rows of evaluating every
leaf on every row and filtering by the full tree (null→False).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import fuzz_budget
from semantic_olap_spark.llm.client import default_llm_factory
from semantic_olap_spark.operators.logic import compile_logic, normalize_logic
from semantic_olap_spark.plans.executor import _build_cond, run_filter

LEAF_POOL = [
    {"operator_name": "keyword_filter",
     "parameters": {"columns": ["text"], "keywords": ["spark", "join"],
                    "logic": "or"}},
    {"operator_name": "keyword_filter",
     "parameters": {"columns": ["text"], "keywords": ["window"],
                    "logic": "or", "relation": "irrelevant"}},
    {"operator_name": "num_filter",
     "parameters": {"conditions": [
         {"column": "n_chars", "threshold": 250, "operator": ">"}]}},
    {"operator_name": "num_filter",
     "parameters": {"conditions": [
         {"column": "n_chars", "threshold": 400, "operator": "<="}]}},
    {"operator_name": "sem_filter",
     "parameters": {"columns": ["text"], "condition": "mentions scan"}},
    {"operator_name": "sem_filter",
     "parameters": {"columns": ["text"], "condition": "about window",
                    "retain_if": False}},
    {"operator_name": "sem_filter",
     "parameters": {"columns": ["text"], "condition": "sort order"}},
]


def _trees():
    leaf = st.integers(1, len(LEAF_POOL))
    return st.recursive(
        leaf,
        lambda kids: st.tuples(
            st.sampled_from(["AND", "OR"]),
            st.lists(kids, min_size=1, max_size=3),
        ).map(lambda t: [t[0], *t[1]]),
        max_leaves=5,
    )


@pytest.fixture(scope="module")
def docs200(tables):
    d = tables["documents"].limit(200).cache()
    d.count()
    return d


def test_staged_equals_naive_on_random_trees(docs200):
    @settings(
        max_examples=fuzz_budget(8, 4),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(_trees())
    def run(tree):
        tree = normalize_logic(tree)
        from semantic_olap_spark.operators.logic import logic_leaves

        ids = sorted(set(logic_leaves(tree)))
        ops = [
            {"id": i, **LEAF_POOL[i - 1]} for i in ids
        ]
        staged = run_filter(docs200, ops, tree, default_llm_factory)
        # naive: every leaf evaluated on every row, full tree at once
        conds = {
            i: _build_cond(
                docs200,
                LEAF_POOL[i - 1]["operator_name"],
                LEAF_POOL[i - 1]["parameters"],
                default_llm_factory,
            )
            for i in ids
        }
        naive = docs200.filter(
            F.coalesce(compile_logic(tree, conds), F.lit(False))
        )
        a = sorted(r["doc_id"] for r in staged.select("doc_id").collect())
        b = sorted(r["doc_id"] for r in naive.select("doc_id").collect())
        assert a == b, f"tree {tree}: staged {len(a)} vs naive {len(b)}"

    run()
