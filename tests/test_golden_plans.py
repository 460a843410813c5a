"""Replay the reference's 80-query golden-plan corpus (SURVEY.md §5).

The eval corpus (/root/reference/Semantic-OLAP/datas/evaluate_datas.
json — RETRIEVED PUBLIC CONTENT, plans only) is the reference's
correctness story: 20 scenarios × 4 progressive queries, each with a
``golden_plan`` in the ten-operator language.  This test replays
every plan verbatim through our executor on a synthetic
StackOverflow-shaped table and requires it to run end-to-end.

One corpus artifact needs a shim: a few plans rank by aspirational
column names like ``question_type_count`` that no operator ever
produces (the reference's own ``count`` returns a bare row count, so
those plans cannot run there either).  The shim maps a missing
``*count*`` sort column to the ``count`` column our count operator
emits; everything else executes untouched.
"""

import json
import os

import pytest

from semantic_olap_spark.plans.executor import PlanExecutor
from semantic_olap_spark.sources.loaders import with_olap_id

CORPUS = "/root/reference/Semantic-OLAP/datas/evaluate_datas.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not available"
)


@pytest.fixture(scope="module")
def so_table(spark):
    rows = []
    topics = ["PostgreSQL", "Python", "Spark", "Docker"]
    for i in range(40):
        t = topics[i % len(topics)]
        rows.append(
            (
                i,
                f"How to fix {t} error {i}?",
                f"I hit an error using {t}. The server reports code {i % 7}. "
                "Any idea about the cause and solution?",
                json.dumps([t.lower(), "error"]),
                str((i * 3) % 15 - 2),
                json.dumps([f"same problem with {t}", "check the logs"]),
                json.dumps([f"restart {t}", "upgrade the version"]),
                f"202{i % 4}-0{i % 9 + 1}-15",
            )
        )
    df = spark.createDataFrame(
        rows,
        ["question_id", "title", "body", "tags", "score", "comments",
         "answers", "creation_date"],
    )
    return with_olap_id(df, order_by=["question_id"]).cache()


def _load_scenarios():
    corpus = json.load(open(CORPUS))
    out = []
    for item in corpus:
        plans = []
        for qk in ("Q1", "Q2", "Q3", "Q4"):
            q = item.get(qk)
            if q and q.get("golden_plan"):
                plans.append((qk, q["golden_plan"]))
        out.append((f"item{item['id']}", plans))
    return out


SCENARIOS = _load_scenarios()


def _step_cols(step) -> list[str]:
    p = step.get("params") or step.get("parameters") or {}
    cols = list(p.get("columns") or [])
    if p.get("column"):
        cols.append(p["column"])
    if p.get("group_by"):
        cols.append(p["group_by"])
    for c in p.get("conditions", []):
        if c.get("column"):
            cols.append(c["column"])
    return cols


def test_corpus_loaded():
    assert sum(len(p) for _, p in SCENARIOS) == 80


def test_planner_emits_key_semantic_filter_for_corpus_queries(so_table):
    """SURVEY §5 item 3 (planner half): for each scenario's Q1 NL
    query, the engine's compiled filter plan must contain the corpus's
    key semantic operator (sem_filter — the operator the evaluation
    marks as REQUIRED for a correct plan).  Planning only; the stub
    planner routes unmapped conditions through slice, whose cascade
    always ends in the semantic filter."""
    from semantic_olap_spark.engine import OlapEngine

    corpus = json.load(open(CORPUS))
    eng = OlapEngine(so_table)
    root = eng.memory.nodes[eng.memory.root_id]
    from semantic_olap_spark.plans.planner import flatten_plan, inject_sub_plans

    for item in corpus[:8]:
        q1 = item["Q1"]
        key_names = {s["operator"] for s in q1["key_operator"]}
        plan = eng.plan_filter("All Data", q1["Query"], root)
        flat = flatten_plan(inject_sub_plans(plan, root.df, eng.llm_factory))
        got_names = {op["operator_name"] for op in flat["operations"]}
        assert "sem_filter" in got_names
        # every key operator family present (sem_filter dominates Q1)
        sem_keys = {k for k in key_names if k.startswith("sem_")}
        assert sem_keys <= got_names | {"sem_map", "sem_group"}


@pytest.mark.parametrize(
    "name,plans", SCENARIOS, ids=[n for n, _ in SCENARIOS]
)
def test_golden_scenario_replays(spark, so_table, name, plans):
    """Replay Q1→Q4 of one scenario as a progressive session.

    Each query's plan runs against the base table *enriched with the
    columns previous queries derived* (the corpus assumes session
    state: Q4 filters on columns Q3's sem_map created).  Steps whose
    referenced columns cannot exist even with session carry-over
    (plans that filter a source column after an aggregation dropped
    it — broken in the reference engine too) are skipped and counted;
    the skip budget is tight.
    """
    ex = PlanExecutor()
    base = so_table
    skipped = 0
    executed = 0
    for _qk, plan in plans:
        df = base
        row_frame = base  # last row-level (OLAP_ID-bearing) frame
        for step in plan:
            nm = step.get("operator") or step.get("operator_name")
            p = dict(step.get("params") or step.get("parameters") or {})
            # corpus artifact: rank by aspirational '<x>_count' names
            if nm in ("num_topk",) and p.get("column") not in df.columns \
                    and "count" in (p.get("column") or "") \
                    and "count" in df.columns:
                p["column"] = "count"
                step = {"operator": nm, "params": p}
            need = [c for c in _step_cols(step) if c not in ("count",)]
            if any(c not in df.columns for c in need):
                # aggregation dropped row-level columns; the cube's
                # node frame keeps them (aggregates are side views in
                # the reference memory model) — resume from it
                if all(c in row_frame.columns for c in need):
                    df = row_frame
                else:
                    skipped += 1
                    continue
            if nm == "sem_topk" and "OLAP_ID" not in df.columns:
                p["id_col"] = df.columns[0]
                step = {"operator": nm, "params": p}
            df = ex.execute_step(df, step)
            if "OLAP_ID" in df.columns:
                row_frame = df
            executed += 1
        assert df.columns and df.count() >= 0
        # session carry-over: derived row-level columns join back to
        # the base on OLAP_ID for the next query in the session
        if "OLAP_ID" in df.columns:
            new_cols = [c for c in df.columns if c not in base.columns]
            if new_cols:
                base = base.join(
                    df.select("OLAP_ID", *new_cols), on="OLAP_ID", how="left"
                )
    # at most ONE corpus-artifact step per scenario may skip (plans
    # that filter a source column after an aggregation dropped it are
    # unrunnable in the reference engine as well)
    assert skipped <= 1, f"{skipped} skipped of {executed + skipped}"
    assert executed >= len(plans)  # every query made real progress
