"""Pre-execution LLM cost estimation for staged filter plans.

Cost *accounting* (llm/client.py accumulators) tells you what a
query spent after the fact; this module predicts it before —
the number the planner needs to choose between a cascade, a
different leaf order, or plain refusal ("this NL filter would judge
40M rows").

Method: simulate the EXACT staged executor (plans/executor.py
``run_filter`` — same leaf compilation, same PRIORITY_MAP ordering,
same Kleene undecided-set shrinkage) on a bounded sample, then
scale the per-stage undecided counts to the full row count.  No
independence assumptions between leaves: correlations are captured
because the real predicate columns run on the sample jointly.

LLM leaves on the sample are handled two ways:

- ``probe_llm=True``: actually judge the sample rows (bounded:
  ``sample_rows`` × #llm-leaves calls, against the configured
  backend, cache-absorbed).  Estimates then reflect true leaf
  selectivities — on a sample covering the whole input they equal
  the executor's actual judged-row counts exactly (pinned in
  tests/test_costmodel.py).
- ``probe_llm=False`` (default): a deterministic 50% prior — each
  sample row's outcome is a hash bit of its leaf input text.  Free,
  and unbiased when nothing is known about the condition.

Scale: the simulation runs ``O(#llm_leaves)`` tiny jobs over
≤``sample_rows`` rows; the full frame is touched only by
``df.limit(sample_rows)`` (a scan-stop) and, when ``total_rows`` is
not supplied, one ``count()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_olap_spark.llm.client import LLMFactory, default_llm_factory
from semantic_olap_spark.operators.logic import (
    compile_logic,
    logic_leaves,
    normalize_logic,
    null_bool,
)
from semantic_olap_spark.plans.executor import (
    PRIORITY_MAP,
    _build_cond,
    step_params,
)


@dataclass
class CostEstimate:
    """Predicted LLM work for one staged filter plan."""

    total_rows: int
    sample_rows: int
    probed: bool
    #: estimated rows each LLM leaf will judge, in stage order
    per_op: dict[int, int] = field(default_factory=dict)

    @property
    def total_llm_calls(self) -> int:
        return sum(self.per_op.values())

    def snapshot(self) -> dict:
        return {
            "total_rows": self.total_rows,
            "sample_rows": self.sample_rows,
            "probed": self.probed,
            "per_op": dict(self.per_op),
            "total_llm_calls": self.total_llm_calls,
        }


def _prior_cond(df: DataFrame, oid: int, p: Mapping):
    """Deterministic 50% prior: a hash bit of the leaf's input text."""
    cols = p.get("columns") or [p.get("column") or p.get("field")]
    cols = [c for c in cols if c and c in df.columns] or df.columns[:1]
    text = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return F.pmod(F.xxhash64(text, F.lit(oid)), F.lit(2)) == 0


def estimate_filter_cost(
    df: DataFrame,
    operations: Sequence[Mapping],
    logic=None,
    sample_rows: int = 2048,
    probe_llm: bool = False,
    llm_factory: LLMFactory = default_llm_factory,
    total_rows: int | None = None,
) -> CostEstimate:
    """Predict per-LLM-leaf judged-row counts for ``run_filter``.

    Mirrors the executor's staging exactly; see module docstring.
    """
    ops = {int(op["id"]): op for op in operations}
    tree = normalize_logic(
        logic if logic is not None else [int(op["id"]) for op in operations]
    )
    leaf_ids = logic_leaves(tree)

    def op_name(oid: int) -> str:
        o = ops[oid]
        return o.get("operator_name") or o.get("operator")

    if total_rows is None:
        total_rows = df.count()
    sample = df.limit(int(sample_rows)).persist()
    n_s = sample.count()
    est = CostEstimate(
        total_rows=int(total_rows), sample_rows=n_s, probed=probe_llm
    )
    cheap: dict[int, object] = {}
    expensive: list[int] = []
    for oid in leaf_ids:
        name = op_name(oid)
        if PRIORITY_MAP.get(name, 2) < 2:
            cheap[oid] = _build_cond(
                sample, name, step_params(ops[oid]), llm_factory
            )
        else:
            expensive.append(oid)
    if not expensive or n_s == 0:
        for oid in expensive:
            est.per_op[oid] = 0
        sample.unpersist()
        return est

    evaluated: dict[int, str] = {}

    def leaf_col(oid: int):
        if oid in cheap:
            return cheap[oid]
        if oid in evaluated:
            return F.col(evaluated[oid])
        return null_bool()

    undecided = sample
    scale = total_rows / n_s
    # When probing, persist after each stage so the next stage's
    # count() does not recompute every earlier probe UDF column —
    # keeping total judgments at the documented sample_rows × #leaves
    # bound even against a non-caching backend.
    persisted: list[DataFrame] = []
    try:
        for oid in expensive:
            tree_col = compile_logic(tree, leaf_col)
            undecided = undecided.filter(tree_col.isNull())
            cnt = undecided.count()
            est.per_op[oid] = int(round(cnt * scale))
            p = step_params(ops[oid])
            if probe_llm:
                cond = _build_cond(undecided, op_name(oid), p, llm_factory)
            else:
                cond = _prior_cond(undecided, oid, p)
            colname = f"__est_{oid}"
            undecided = undecided.withColumn(
                colname, F.coalesce(cond, F.lit(False))
            )
            evaluated[oid] = colname
            if probe_llm:
                undecided = undecided.persist()
                persisted.append(undecided)
    finally:
        sample.unpersist()
        for pdf in persisted:
            pdf.unpersist()
    return est


def choose_llm_leaf_order(
    df: DataFrame,
    operations: Sequence[Mapping],
    logic=None,
    sample_rows: int = 256,
    probe_llm: bool = True,
    llm_factory: LLMFactory = default_llm_factory,
) -> list[int]:
    """Order class-2 (LLM) leaves to minimize judged rows.

    The reference's PRIORITY_MAP (Exection_Agent.py:54-60) orders the
    three cost *classes* but leaves ties inside class 2 in plan
    order — at scale, two LLM leaves of very different selectivity in
    the wrong order dominate LLM spend.  This chooses the intra-class
    order from data:

    1. Probe every LLM leaf ONCE on a bounded sample restricted to
       rows the cheap leaves leave undecided (``probe_llm=True``:
       real judgments, ≤ ``sample_rows × #llm_leaves`` calls,
       cache-absorbed; ``False``: the free deterministic 50% prior).
    2. Greedy simulation on the probed sample — repeatedly pick the
       leaf whose addition leaves the FEWEST rows undecided under
       Kleene semantics (every candidate at a given step judges the
       same undecided set, so shrinkage for later stages is the only
       differentiator; exact for 2 leaves, standard greedy beyond).
       Ties break to plan order, keeping the choice deterministic.

    Step 2 is pure Catalyst counting over the persisted probed
    sample — no further LLM calls.  Returns a permutation of the
    LLM leaf ids; pass it to ``run_filter(llm_leaf_order=...)``.
    Result equality under any order is guaranteed by the staged
    executor's Kleene semantics (property-tested).
    """
    ops = {int(op["id"]): op for op in operations}
    tree = normalize_logic(
        logic if logic is not None else [int(op["id"]) for op in operations]
    )
    leaf_ids = logic_leaves(tree)

    def op_name(oid: int) -> str:
        o = ops[oid]
        return o.get("operator_name") or o.get("operator")

    cheap_ids = [
        oid for oid in leaf_ids if PRIORITY_MAP.get(op_name(oid), 2) < 2
    ]
    expensive = [
        oid for oid in leaf_ids if PRIORITY_MAP.get(op_name(oid), 2) >= 2
    ]
    if len(expensive) < 2:
        return expensive

    sample = df.limit(int(sample_rows))
    cheap = {
        oid: _build_cond(
            sample, op_name(oid), step_params(ops[oid]), llm_factory
        )
        for oid in cheap_ids
    }
    # only rows the cheap leaves leave undecided matter for ordering
    pre = compile_logic(tree, lambda o: cheap.get(o, null_bool()))
    # MATERIALIZE the bounded sample BEFORE attaching probe UDF
    # columns: deterministic projections get pushed below a
    # GlobalLimit by Catalyst, so probes added to a lazy limit(n)
    # plan are evaluated in the pre-limit stage — up to n rows PER
    # PARTITION, unbounded probe spend on a wide scan (measured:
    # 1000 judgments on a 500-row/32-partition corpus at
    # sample_rows=256).  The InMemoryRelation is an optimizer
    # barrier, so probes attached above the materialized cache judge
    # exactly the ≤ sample_rows cached rows.
    base_sample = sample.filter(pre.isNull()).persist()
    sample = base_sample
    probe_col = {oid: f"__probe_{oid}" for oid in expensive}
    try:
        if base_sample.count() == 0:  # materializes; zero LLM calls
            return list(expensive)  # nothing to learn from
        for oid in expensive:
            p = step_params(ops[oid])
            cond = (
                _build_cond(sample, op_name(oid), p, llm_factory)
                if probe_llm
                else _prior_cond(sample, oid, p)
            )
            sample = sample.withColumn(
                probe_col[oid], F.coalesce(cond, F.lit(False))
            )
        sample = sample.persist()

        def undecided_after(chosen: Sequence[int]) -> int:
            done = set(chosen)

            def leaf(oid: int):
                if oid in cheap:
                    return cheap[oid]
                if oid in done:
                    return F.col(probe_col[oid])
                return null_bool()

            return sample.filter(compile_logic(tree, leaf).isNull()).count()

        order: list[int] = []
        remaining = list(expensive)
        while len(remaining) > 1:
            best = min(
                remaining,
                key=lambda c: (undecided_after(order + [c]),
                               remaining.index(c)),
            )
            order.append(best)
            remaining.remove(best)
        order.extend(remaining)
        return order
    finally:
        base_sample.unpersist()
        if sample is not base_sample:
            sample.unpersist()
