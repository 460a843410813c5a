"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Coverage maps to SURVEY.md §2's operator inventory: every logical
operator (§2.1), the physical filter specializations (§2.2), the
logic-tree executor (§2.4), and the beyond-reference pipeline
functions (text analysis, dedup, similarity — SURVEY.md §7.1 M7).
Semantic operators run under the deterministic StubLLM whose rules
are exactly SQL-expressible (string containment / token counts), so
they get full value-hash oracle checks, not just row counts.
Even the sem_topk tournament has a full oracle (the deterministic
rotation pairing + stub judge reproduce exactly in SQL), and so do
the approximate near-dup / ANN ops: minhash_lsh_pairs and
winnow_overlap_pairs run in md5 ``exact_hash`` mode for the driver,
lsh_topk's hyperplanes embed as literals (pure function of seed +
dim), ivf_topk uses data-seeded centroids, and sem_group_cluster
applies a FROZEN fitted taxonomy (pinned KMeans centroids as SQL
literals over vocabulary-occurrence features — the shipped-tokenizer
pattern bpe_tokenize_docs established) — each whole pipeline
reproduces bit-for-bit in SQL.  The one remaining oracle-less row
(approx_distinct_merge — HLL binary state) carries golden-estimate +
error-band pytest pins instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _coverage_order(names: list[str]) -> list[str]:
    """Order registry names least-recently-driver-verified first.

    The driver hash-checks only the FIRST 50 names of ``queries()``
    in insertion order each round, so a static registry order leaves
    everything after position 50 permanently unsampled.  Ordering:

    1. names whose LATEST driver record failed (any of rows/schema/
       hash explicitly False, or a real error) — failures get no
       recency credit, so a claimed fix is always re-verified the
       very next round instead of hiding behind the rotation;
    2. names never driver-sampled — including names whose only
       record is ``no_oracle`` rows-only but which NOW have an
       oracle entry: the rows-only record is no evidence for the
       new hash check, so an upgraded query re-verifies immediately
       instead of waiting a full rotation cycle;
    3. everything else, least-recently-sampled first.

    Insertion order breaks ties.  Deterministic within a round: the
    correctness files only change between rounds.  ``no_oracle``
    rows-only records count as pass — that is their strongest
    possible check by construction (unless upgraded, above).
    """
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    rows_only_round: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for q, rec in data.items():
            if rnd < last_round.get(q, 0):
                continue
            last_round[q] = rnd
            ok = True
            if isinstance(rec, dict):
                if any(
                    rec.get(k) is False
                    for k in ("rows_match", "schema_match", "hash_match")
                ):
                    ok = False
                if rec.get("err") not in (None, "no_oracle"):
                    ok = False
                if rec.get("err") == "no_oracle":
                    rows_only_round[q] = rnd
            last_ok[q] = ok
    # upgraded queries: latest record is rows-only but an oracle now
    # exists → the hash check has never run; clear the recency credit
    oracled = set(oracle_sql())
    for q, rnd in rows_only_round.items():
        if last_round.get(q) == rnd and q in oracled:
            last_round[q] = 0
    idx = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            0 if not last_ok.get(n, True) else 1,
            last_round.get(n, 0),
            idx[n],
        ),
    )


def _t(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    # rebalance=True opts the scan into the layout-deficit
    # repartition (loaders.restore_scan_parallelism): set on the
    # rows whose per-row compute dominates and measurably wins from
    # it (A/B table in OPTIMIZATION_r13.md); left off where the
    # first real operation is already a keyed shuffle or the per-row
    # work is too cheap to pay for the extra exchange.
    from semantic_olap_spark.sources.loaders import load_table

    return load_table(spark, sf_dir, name, rebalance=rebalance)


def _lf(llm_factory):
    """Resolve the optional per-call LLM factory override.

    The driver calls every query as ``fn(spark, sf_dir)`` (stub
    backend); the bench additionally passes a cost-tracked factory
    (``llm/client.py wrap_cost_tracking``) so BENCH_LOCAL.json can
    report backend calls per query alongside seconds and shuffle
    bytes.  Semantics are identical either way — the wrapper only
    counts.
    """
    if llm_factory is None:
        from semantic_olap_spark.llm.client import default_llm_factory

        return default_llm_factory
    return llm_factory


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The SURVEY §7.2 minimum end-to-end slice re-expressed on the
    driver's ``documents`` table: keyword prefilter → semantic filter
    → numeric filter cascade, run through the plan executor (golden-
    plan language), then a per-source count roll-up.
    """
    from semantic_olap_spark.plans.executor import PlanExecutor

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    ex = PlanExecutor()
    return ex.execute(
        docs,
        [
            {"operator": "keyword_filter",
             "params": {"columns": ["text"], "keywords": ["spark", "join"],
                        "logic": "or"}},
            {"operator": "sem_filter",
             "params": {"columns": ["text"], "condition": "rows about spark"}},
            {"operator": "num_filter",
             "params": {"conditions": [
                 {"column": "n_chars", "threshold": 100, "operator": ">"}]}},
            {"operator": "count", "params": {"group_by": "source"}},
        ],
    )


# ---- §2.1 deterministic operators --------------------------------------


def _q_keyword_filter_or(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import keyword_filter

    return keyword_filter(
        _t(spark, sf_dir, "part"), ["p_name", "p_type"],
        ["red", "economy"], "or", "contains",
    )


def _q_keyword_filter_and(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import keyword_filter

    return keyword_filter(
        _t(spark, sf_dir, "part"), ["p_name", "p_type"],
        ["red", "economy"], "and", "contains",
    )


def _q_keyword_filter_irrelevant(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import keyword_filter

    return keyword_filter(
        _t(spark, sf_dir, "orders"), ["o_orderpriority"],
        ["urgent", "high"], "or", "irrelevant",
    )


def _q_keyword_filter_equal(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import keyword_filter

    return keyword_filter(
        _t(spark, sf_dir, "nation"), ["n_name"], ["nation_7"], "or", "equal"
    )


def _q_keyword_filter_contained_in(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import keyword_filter

    return keyword_filter(
        _t(spark, sf_dir, "nation"), ["n_name"],
        ["union of nation_3 and nation_13"], "or", "contained_in",
    )


def _q_num_filter_and(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_filter

    return num_filter(
        _t(spark, sf_dir, "lineitem"),
        [
            {"column": "l_quantity", "threshold": 30, "operator": ">"},
            {"column": "l_discount", "threshold": 0.05, "operator": "<="},
        ],
        "and",
    )


def _q_num_filter_or(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_filter

    return num_filter(
        _t(spark, sf_dir, "lineitem"),
        [
            {"column": "l_quantity", "threshold": 2, "operator": "<"},
            {"column": "l_quantity", "threshold": 49, "operator": ">"},
        ],
        "or",
    )


def _q_num_reduce_sum_by_flag(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_reduce

    return num_reduce(
        _t(spark, sf_dir, "lineitem"), ["l_quantity", "l_extendedprice"],
        "sum", "l_returnflag", round_to=2,
    )


def _q_num_reduce_avg_global(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_reduce

    return num_reduce(
        _t(spark, sf_dir, "orders"), ["o_totalprice"], "avg", round_to=4
    )


def _q_num_reduce_minmax(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_reduce

    mx = num_reduce(_t(spark, sf_dir, "lineitem"), ["l_extendedprice"],
                    "max", "l_linestatus")
    mn = num_reduce(_t(spark, sf_dir, "lineitem"), ["l_extendedprice"],
                    "min", "l_linestatus")
    return mx.join(mn, on="l_linestatus")


def _q_count_by_status_distinct(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import count_op

    return count_op(_t(spark, sf_dir, "orders"), "o_orderstatus", ["o_custkey"])


def _q_count_global(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import count_op

    return count_op(_t(spark, sf_dir, "lineitem"))


def _q_num_topk_desc(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_topk

    return num_topk(
        _t(spark, sf_dir, "orders"), "o_totalprice", 10, "desc",
        tiebreak=["o_orderkey"],
    )


def _q_num_topk_asc(spark, sf_dir):
    from semantic_olap_spark.operators.deterministic import num_topk

    return num_topk(
        _t(spark, sf_dir, "orders"), "o_totalprice", 7, "asc",
        tiebreak=["o_orderkey"],
    )


# ---- §2.1 semantic operators (deterministic StubLLM) -------------------


def _q_sem_filter(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.operators.semantic import sem_filter

    return sem_filter(
        _t(spark, sf_dir, "documents"), ["text"], "rows about spark",
        llm_factory=_lf(llm_factory),
    )


_HTTP_MOCK: dict = {}


def _q_sem_filter_http(spark, sf_dir):
    """sem_filter through the production HttpLLM transport.

    Backend-swap parity row: the same stub semantics served over the
    OpenAI-compatible wire (llm/http_client.py) by an in-process mock
    endpoint (llm/mock_server.py) — identical results to `sem_filter`,
    same DuckDB oracle, proving the HTTP path changes transport only.
    The server leaks intentionally (daemon threads) so the returned
    lazy DataFrame stays collectable for the driver.
    """
    from semantic_olap_spark.llm.http_client import http_llm_factory
    from semantic_olap_spark.operators.semantic import sem_filter

    if "srv" not in _HTTP_MOCK:
        from semantic_olap_spark.llm.mock_server import (
            start_mock_openai_server,
        )

        _HTTP_MOCK["srv"] = start_mock_openai_server()
    factory = http_llm_factory(
        _HTTP_MOCK["srv"].base_url, "mock-model", concurrency=8,
        max_retries=2, backoff_base=0.05,
    )
    return sem_filter(
        _t(spark, sf_dir, "documents"), ["text"], "rows about spark",
        llm_factory=factory,
    )


def _q_sem_filter_multi(spark, sf_dir):
    from semantic_olap_spark.operators.semantic import sem_filter

    return sem_filter(
        _t(spark, sf_dir, "documents"), ["text"], "mentions vector or stream"
    )


def _q_sem_map_topic(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.operators.semantic import sem_map

    return sem_map(
        _t(spark, sf_dir, "documents"), ["text"],
        "dominant topic, one of: vector, stream, window", "topic",
        _lf(llm_factory),
    ).select("doc_id", "topic")


def _q_sem_group_workload(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.operators.semantic import sem_group

    return sem_group(
        _t(spark, sf_dir, "documents"), ["text"],
        "group by workload type, one of: scan, join, sort", "workload",
        _lf(llm_factory),
    ).select("doc_id", "workload")


def _q_sem_reduce_by_region(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.operators.semantic import sem_reduce

    return sem_reduce(
        _t(spark, sf_dir, "nation"), ["n_name"], "n_regionkey",
        _lf(llm_factory), alias="names",
    )


def _q_sem_reduce_global(spark, sf_dir):
    from semantic_olap_spark.operators.semantic import sem_reduce

    return sem_reduce(_t(spark, sf_dir, "region"), ["r_name"], alias="names")


def _q_sem_group_cluster(spark, sf_dir):
    """Frozen cluster-taxonomy grouping (operators/semantic.py).

    The r9 upgrade of the one remaining rows-only §2.1 row to a full
    hash oracle, by the repo's shipped-tokenizer pattern (bpe.py
    PINNED_MERGES, lsh_topk literal hyperplanes): the taxonomy is
    FIT ONCE by fit_cluster_taxonomy (seeded KMeans over vocabulary-
    occurrence features + one stub call per cluster; provenance
    re-fit pinned by tests/test_semantic.py) and FROZEN as package
    constants.  The row applies the frozen centroids — pure Catalyst
    length-replace counts + literal-centroid argmin, zero LLM calls,
    exactly mirrored in the DuckDB oracle.  The cluster INDEX is
    exposed alongside the tag because the stub judge labels every
    cluster of this corpus "scan" (each bounded sample contains the
    word) — the index is the discriminative per-row output.  The
    HashingTF fit-per-call variant stays pytest-pinned
    (tests/test_semantic.py golden pin) as the non-SQL-expressible
    ceiling.
    """
    from semantic_olap_spark.operators.semantic import (
        PINNED_WORKLOAD_CENTROIDS,
        PINNED_WORKLOAD_TAGS,
        WORKLOAD_VOCAB,
        sem_group_cluster_apply,
    )

    return sem_group_cluster_apply(
        _t(spark, sf_dir, "documents"), ["text"], "workload",
        WORKLOAD_VOCAB, PINNED_WORKLOAD_CENTROIDS, PINNED_WORKLOAD_TAGS,
        cluster_col="cluster",
    ).select("doc_id", "cluster", "workload")


def _q_sem_topk_docs(spark, sf_dir):
    from semantic_olap_spark.operators.semantic import sem_topk
    from semantic_olap_spark.sources.loaders import with_olap_id

    docs = with_olap_id(_t(spark, sf_dir, "documents"), order_by=["doc_id"])
    return sem_topk(docs, ["text"], "spark join performance", k=10).select(
        "doc_id", "wins"
    )


def _q_sem_topk_prescreen(spark, sf_dir):
    """sem_topk with the prescreen scale path (operators/semantic.py).

    A cheap relevance score keeps the best 40 candidates and the
    rotation tournament runs only on that slice — LLM calls drop from
    ~2m·n to ~2m·40 regardless of table size (the SURVEY §2.1 #10
    scalable alternative to the reference's full ~5n budget,
    Operaters.py:465-466).  The driver row uses an integer
    token-occurrence prescreen score (exactly SQL-expressible, so the
    whole pipeline hash-matches); the default hash-embedding cosine
    score is pinned by tests/test_sem_topk_prescreen.py.
    """
    from semantic_olap_spark.operators.semantic import sem_topk

    docs = _t(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))

    def occ(w):
        return (F.length(t) - F.length(F.replace(t, F.lit(w)))) / len(w)

    score = occ("spark") + occ("join") + occ("performance")
    return sem_topk(
        docs, ["text"], "spark join performance", k=10,
        id_col="doc_id", prescreen_k=40, prescreen_score=score,
    ).select("doc_id", "wins")


# ---- §2.2 physical filter specializations ------------------------------


def _q_filter_enum(spark, sf_dir):
    from semantic_olap_spark.operators.semantic import filter_enum_llm

    return filter_enum_llm(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "urgent priority"
    )


def _q_filter_pattern(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.operators.semantic import filter_pattern

    return filter_pattern(
        _t(spark, sf_dir, "events"), "props", "value > 50", _lf(llm_factory)
    )


# ---- §2.4 logic trees + plan executor ----------------------------------


def _q_filter_group_tree(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.plans.executor import run_filter

    return run_filter(
        _t(spark, sf_dir, "documents"),
        [
            {"id": 1, "operator_name": "keyword_filter",
             "parameters": {"columns": ["text"], "keywords": ["spark"],
                            "logic": "or"}},
            {"id": 2, "operator_name": "num_filter",
             "parameters": {"conditions": [
                 {"column": "n_chars", "threshold": 200, "operator": ">"}]}},
            {"id": 3, "operator_name": "sem_filter",
             "parameters": {"columns": ["text"], "condition": "mentions window"}},
        ],
        ["AND", 1, ["OR", 2, 3]],
        llm_factory=_lf(llm_factory),
    )


def _q_filter_group_auto_order(spark, sf_dir):
    """Boolean tree with TWO LLM leaves under llm_leaf_order="auto".

    The cost model (plans/costmodel.py choose_llm_leaf_order) probes a
    sample and runs the most-decisive sem_filter first; Kleene staging
    makes results order-independent, so the oracle is the same flat
    SQL as plan order — the row proves the selectivity-aware path end
    to end (reference gap: Exection_Agent.py:54-60 orders classes,
    not leaves within class 2).
    """
    from semantic_olap_spark.plans.executor import run_filter

    return run_filter(
        _t(spark, sf_dir, "documents"),
        [
            {"id": 1, "operator_name": "num_filter",
             "parameters": {"conditions": [
                 {"column": "n_chars", "threshold": 120, "operator": ">"}]}},
            {"id": 2, "operator_name": "sem_filter",
             "parameters": {"columns": ["text"], "condition": "mentions scan"}},
            {"id": 3, "operator_name": "sem_filter",
             "parameters": {"columns": ["text"], "condition": "about vector"}},
        ],
        ["AND", 1, 2, 3],
        llm_leaf_order="auto",
    )


def _q_plan_cascade(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.plans.executor import PlanExecutor

    ex = PlanExecutor(llm_factory=_lf(llm_factory))
    return ex.execute(
        _t(spark, sf_dir, "documents"),
        [
            {"operator": "keyword_filter",
             "params": {"columns": ["text"], "keywords": ["spark", "join"],
                        "logic": "or"}},
            {"operator": "sem_filter",
             "params": {"columns": ["text"], "condition": "rows about spark"}},
            {"operator": "num_filter",
             "params": {"conditions": [
                 {"column": "n_chars", "threshold": 100, "operator": ">"}]}},
            {"operator": "count", "params": {"group_by": "source"}},
        ],
    )


# ---- pipeline functions: text analysis ---------------------------------


def _q_text_profile(spark, sf_dir):
    from semantic_olap_spark.functions.text import text_profile

    return text_profile(
        _t(spark, sf_dir, "documents", rebalance=True)
    ).select(
        "doc_id", "n_tokens", "n_tokens_bpe", "lang_pred", "quality",
        "fingerprint",
    )


# ---- pipeline functions: dedup -----------------------------------------


def _q_dedup_exact(spark, sf_dir):
    from semantic_olap_spark.functions.dedup import dedup_exact

    return dedup_exact(_t(spark, sf_dir, "documents"))


def _q_jaccard_pairs(spark, sf_dir):
    from semantic_olap_spark.functions.dedup import jaccard_pairs

    return jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.7, block_col="source"
    )


def _q_ngram_jaccard_pairs(spark, sf_dir):
    # order-sensitive word-2-gram Jaccard (shingle_n) — the exact
    # unit MinHash approximates; low threshold because the synthetic
    # token-bag corpus shares vocabulary, not word order
    from semantic_olap_spark.functions.dedup import jaccard_pairs

    return jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.1,
        block_col="source",
        shingle_n=2,
    )


# ---- r7 strategy twins: the driver verifies EVERY physical path ------
# The r7 size-adaptive picks mean the default rows exercise the
# small-input strategies at driver scale (allpairs, matmul, driver
# union-find / fixed point); these twins pin each operator's SCALE
# path under the same oracle, so neither side of a pick can rot
# unverified.  Oracles are strategy-independent by construction.


def _q_jaccard_pairs_prefix(spark, sf_dir):
    # forced prefix filtering — the plan that survives the sf1 blocks
    from semantic_olap_spark.functions.dedup import jaccard_pairs

    return jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.7,
        block_col="source", strategy="prefix",
    )


def _q_cosine_pairs_expr(spark, sf_dir):
    # forced pure-Catalyst pair scoring (the matmul twin's reference)
    from semantic_olap_spark.functions.similarity import cosine_pairs

    # threshold 0.4 (was 0.8, which emitted ZERO pairs on the contract
    # corpus — a vacuous row pinning sha256("") — advice r7): the
    # synthetic embeddings top out near cosine 0.5 within a label, so
    # 0.4 yields real pairs at every sf (5 at sf0.01, 86 at sf0.1)
    return cosine_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.4,
        block_col="label", strategy="expr",
    )


def _q_dedup_against_embeddings_expr(spark, sf_dir):
    # forced bucket equi-join scoring — the beyond-broadcast path
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    seen = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    return dedup_against_embeddings(
        batch, seen, threshold=0.42, nbits=4, seed=42, multiprobe=1,
        strategy="expr",
    ).select("vec_id", "label")


def _q_dedup_clusters_distributed(spark, sf_dir):
    # forced label-propagation + pointer-doubling loop
    from semantic_olap_spark.functions.dedup import (
        dedup_clusters,
        jaccard_pairs,
    )

    return dedup_clusters(
        jaccard_pairs(
            _t(spark, sf_dir, "documents"), threshold=0.7,
            block_col="source",
        ),
        driver_threshold=0,
    )


def _q_pagerank_suppliers_distributed(spark, sf_dir):
    # forced distributed fixed-point loop (broadcast hints active)
    from semantic_olap_spark.functions.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.lit(10_000_000) + F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, iterations=3, driver_threshold=0)


_BATCH_SRCS = ("src0", "src1", "src2", "src3", "src4")


def _q_minhash_dedup_against(spark, sf_dir):
    # incremental near-dup ingest: the batch (5 sources) is checked
    # against a MinHash index of the remaining corpus; rows sharing
    # an LSH band bucket AND verifying at shingle-Jaccard >= 0.5 are
    # dropped.  exact_hash=True (md5) so the whole index+probe
    # pipeline reproduces in the DuckDB oracle.
    from semantic_olap_spark.functions.dedup import (
        dedup_against_minhash,
        minhash_index,
    )

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("source").isin(*_BATCH_SRCS))
    corpus = docs.filter(~F.col("source").isin(*_BATCH_SRCS))
    idx = minhash_index(corpus, exact_hash=True)
    return dedup_against_minhash(
        batch, idx, threshold=0.5, exact_hash=True
    )


def _q_minhash_lsh_pairs(spark, sf_dir):
    # exact_hash=True swaps xxhash64 for md5 end to end so the WHOLE
    # pipeline (shingle → 64-fn signature → 16 band keys → candidate
    # join → Jaccard verify) reproduces bit-for-bit in the DuckDB
    # oracle; production keeps the xxhash64 default (bench uses it)
    from semantic_olap_spark.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        shingle_n=3,
        threshold=0.5,
        exact_hash=True,
    )


def _q_winnow_overlap_pairs(spark, sf_dir):
    # exact_hash=True: md5 k-gram hashes → the winnowing window-min
    # selection is lexicographic on hex strings, reproducible in SQL
    from semantic_olap_spark.functions.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _t(spark, sf_dir, "documents"), min_shared=3, exact_hash=True
    )


def _q_simhash_pairs(spark, sf_dir):
    from semantic_olap_spark.functions.dedup import simhash_pairs

    # exact mode (no skew cap): this query carries an exact SQL
    # oracle, so it must return ALL pairs at any scale factor; the
    # capped default is the production posture, not the oracle one
    return simhash_pairs(
        _t(spark, sf_dir, "documents"), max_distance=3, max_bucket_size=None
    )


def _q_dedup_clusters(spark, sf_dir):
    from semantic_olap_spark.functions.dedup import (
        dedup_clusters,
        jaccard_pairs,
    )

    return dedup_clusters(
        jaccard_pairs(
            _t(spark, sf_dir, "documents"), threshold=0.7, block_col="source"
        )
    )


def _q_dedup_keep_best(spark, sf_dir):
    from semantic_olap_spark.functions.dedup import (
        dedup_keep_best,
        jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    return dedup_keep_best(
        docs,
        jaccard_pairs(docs, threshold=0.7, block_col="source"),
        score_col="n_chars",
    )


def _q_dup_spans_docs(spark, sf_dir):
    # ExactSubstr span detection (Lee et al. 2022): duplicated
    # >=20-token windows corpus-wide, merged to maximal spans.  Pure
    # Catalyst (md5 k-gram fingerprints), so the DuckDB oracle
    # reproduces it bit-for-bit.
    from semantic_olap_spark.functions.dedup import duplicate_spans

    return duplicate_spans(
        _t(spark, sf_dir, "documents", rebalance=True),
        k=20, fingerprint="md5",
    ).select(
        "doc_id", "span_start", "span_end", "span_tokens"
    )


def _q_remove_dup_spans_docs(spark, sf_dir):
    # the removal half: ALL occurrences of each duplicated span are
    # dropped and the text rebuilt from surviving tokens.
    from semantic_olap_spark.functions.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        _t(spark, sf_dir, "documents", rebalance=True),
        k=20, fingerprint="md5",
    ).select("doc_id", "text", "removed_tokens", "orig_tokens")


def _q_remove_spans_against_strided(spark, sf_dir):
    # the sampled-suffix-array scale path: stride-3 index (1/3 the
    # fingerprints) probed by the full batch gram stream — detection
    # guaranteed for shared runs >= k+stride-1 = 22 tokens, edges may
    # under-cover by < stride per side (SCALE.md records the trade)
    from semantic_olap_spark.functions.dedup import (
        remove_spans_against,
        span_index,
    )

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    idx = span_index(
        docs.filter("doc_id % 2 = 0"), k=20, fingerprint="md5", stride=3
    )
    return remove_spans_against(
        docs.filter("doc_id % 2 = 1"), idx, k=20, fingerprint="md5"
    ).select("doc_id", "text", "removed_tokens", "orig_tokens")


def _q_span_coverage_by_source(spark, sf_dir):
    # the decide-before-you-strip diagnostic: per source, how many
    # tokens sit inside duplicated >=20-token spans.  One extra
    # broadcast join + one agg over the span frame.
    from semantic_olap_spark.functions.dedup import (
        _span_tokens,
        duplicate_spans,
    )

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    spans = duplicate_spans(docs, k=20, fingerprint="md5")
    totals = docs.groupBy("source").agg(
        F.sum(F.size(_span_tokens(F.col("text"))))
        .cast("long")
        .alias("total_tokens")
    )
    per_src = (
        spans.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("dup_tokens"),
        )
    )
    return (
        totals.join(per_src, "source", "left")
        .select(
            "source",
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            "total_tokens",
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                / F.col("total_tokens"),
                6,
            ).alias("dup_frac"),
        )
    )


def _q_span_stream_ingest(spark, sf_dir):
    # continuous ExactSubstr ingest (streaming/spans.py): even docs
    # arrive as epoch 0 (cleaned against an EMPTY index — pass
    # through with re-joined text), odd docs as epoch 1 (cleaned
    # against the index epoch 0 folded in).  The availableNow run +
    # read-back proves the whole stream loop — foreachBatch fold,
    # commit markers, delta index, output generations — against a
    # pure-SQL oracle: epoch 1 is exactly remove_spans_against_docs'
    # semantics, epoch 0 the whitespace-normalized identity.
    import os
    import shutil
    import tempfile

    from semantic_olap_spark.streaming.spans import (
        maintain_span_dedup,
        read_clean_output,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="solap_span_stream_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        for name, pred, mt in (
            ("b0", "doc_id % 2 = 0", 1_000),
            ("b1", "doc_id % 2 = 1", 2_000),
        ):
            staging = os.path.join(base, "stage_" + name)
            docs.filter(pred).coalesce(1).write.mode(
                "overwrite"
            ).parquet(staging)
            part = next(
                f for f in os.listdir(staging) if f.endswith(".parquet")
            )
            dst = os.path.join(src, name + ".parquet")
            shutil.copyfile(os.path.join(staging, part), dst)
            os.utime(dst, (mt, mt))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_span_dedup(
            stream,
            os.path.join(base, "idx"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            k=20,
            fingerprint="md5",
            trigger_once=True,
        )
        finished = q.awaitTermination(180)
        if not finished:
            # awaitTermination returns False on timeout instead of
            # raising — reading partial output would mis-hash
            q.stop()
            raise TimeoutError(
                "span_stream_ingest stream did not drain in 180s"
            )
        out = read_clean_output(
            spark, os.path.join(base, "out")
        ).select("doc_id", "text", "removed_tokens", "orig_tokens")
        # materialize BEFORE the finally removes the staging tree the
        # lazy plan reads from; documents is the corpus-sample table
        # (500 rows/sf0.01, 5k/sf0.1), so the driver-side copy is
        # bounded — the row exists to oracle the stream loop, not to
        # demo scale (the scale path streams straight to a sink)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _q_remove_spans_against_docs(spark, sf_dir):
    # incremental ExactSubstr: even-id docs are the frozen seen
    # corpus (span_index of distinct window fingerprints), odd-id
    # docs are the incoming batch — every batch span already present
    # in the corpus is removed (within-batch repeats deliberately
    # kept: that is remove_duplicate_spans' job)
    from semantic_olap_spark.functions.dedup import (
        remove_spans_against,
        span_index,
    )

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    idx = span_index(
        docs.filter("doc_id % 2 = 0"), k=20, fingerprint="md5"
    )
    return remove_spans_against(
        docs.filter("doc_id % 2 = 1"), idx, k=20, fingerprint="md5"
    ).select("doc_id", "text", "removed_tokens", "orig_tokens")


# ---- pipeline functions: similarity search -----------------------------


def _query_vec(spark, sf_dir, vec_id=0):
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )


def _query_vecs(spark, sf_dir, ids):
    """Fetch several query/centroid vectors in ONE collect job.

    ``[_query_vec(i) for i in ids]`` runs one scan+collect job per
    vector; for the 8 IVF seed centroids that is 8 driver round
    trips where one suffices.  Values are identical — same filter,
    same cast — just batched.
    """
    emb = _t(spark, sf_dir, "embeddings")
    rows = (
        emb.filter(F.col("vec_id").isin(list(ids)))
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    by_id = {r[0]: r[1] for r in rows}
    missing = [i for i in ids if i not in by_id]
    if missing:
        raise ValueError(f"query vectors not found in embeddings: {missing}")
    return [by_id[i] for i in ids]


def _q_cosine_topk(spark, sf_dir):
    from semantic_olap_spark.functions.similarity import cosine_topk

    q = _query_vec(spark, sf_dir)
    return cosine_topk(_t(spark, sf_dir, "embeddings"), q, k=10)


def _q_cosine_pairs(spark, sf_dir):
    from semantic_olap_spark.functions.similarity import cosine_pairs

    return cosine_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, block_col="label"
    )


def _q_lsh_topk(spark, sf_dir):
    from semantic_olap_spark.functions.similarity import lsh_topk

    q = _query_vec(spark, sf_dir)
    return lsh_topk(_t(spark, sf_dir, "embeddings"), q, k=10, nbits=4)


def _q_ivf_topk(spark, sf_dir):
    # Data-seeded coarse centroids (embeddings of vec_id 0..7 — the
    # seeding step of k-means, skipping Lloyd iterations) make the
    # whole IVF pipeline — assign: argmin-centroid, probe: 3 nearest
    # centroids, exact-rank within — reproducible in the DuckDB
    # oracle at any sf.  Trained-centroid quality is covered by the
    # recall contracts (tests/test_recall_contracts.py).
    import numpy as np

    from semantic_olap_spark.functions.similarity import ivf_topk

    seeds = _query_vecs(spark, sf_dir, list(range(8)))
    q = seeds[0]  # == _query_vec(vec_id=0), batched into one job
    cents = np.array(seeds)
    return ivf_topk(
        _t(spark, sf_dir, "embeddings"), q, k=10, centroids=cents, nprobe=3
    )


# ---- pipeline functions: multimodal ------------------------------------


def _q_multimodal_metadata(spark, sf_dir):
    from semantic_olap_spark.functions.multimodal import attach_binary_metadata

    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "utf-8")
    )
    return attach_binary_metadata(docs).select(
        "doc_id", "media_bytes", "media_format", "media_id"
    )


def _q_image_features(spark, sf_dir):
    from semantic_olap_spark.functions.multimodal import image_features

    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "utf-8")
    )
    return image_features(docs)


def _q_audio_features(spark, sf_dir):
    from semantic_olap_spark.functions.multimodal import audio_features

    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "utf-8")
    )
    return audio_features(docs)


def _q_sample_frames(spark, sf_dir):
    from semantic_olap_spark.functions.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "utf-8")
    )
    return sample_frames(docs, n_frames=2).select("doc_id", "frame_idx")


# ---- pipeline functions: deterministic sampling & packing --------------
# (functions/sampling.py, functions/packing.py — randomness is a pure
# function of (seed, key) via md5, so every query here carries a full
# value-hash oracle; Spark's own sample/randomSplit could not)


def _q_hash_sample(spark, sf_dir):
    from semantic_olap_spark.functions.sampling import hash_sample

    return hash_sample(_t(spark, sf_dir, "documents"), 0.3, "doc_id")


def _q_stratified_sample(spark, sf_dir):
    from semantic_olap_spark.functions.sampling import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        "source",
        {"src1": 1.0, "src2": 0.5, "src3": 0.25},
        "doc_id",
    )


def _q_train_test_split(spark, sf_dir):
    from semantic_olap_spark.functions.sampling import train_test_split

    return train_test_split(
        _t(spark, sf_dir, "documents"),
        {"train": 0.8, "test": 0.1, "val": 0.1},
        "doc_id",
    ).select("doc_id", "split")


def _q_reservoir_sample(spark, sf_dir):
    from semantic_olap_spark.functions.sampling import reservoir_sample

    return reservoir_sample(_t(spark, sf_dir, "documents"), 25, "doc_id")


def _q_pack_documents(spark, sf_dir):
    from semantic_olap_spark.functions.packing import pack_documents

    return pack_documents(
        _t(spark, sf_dir, "documents"), budget=512, order_col="doc_id"
    ).select("doc_id", "n_tokens", "bin", "offset")


def _q_leakage_safe_split(spark, sf_dir):
    # near-dup clusters (same pair graph as dedup_clusters) keyed
    # into the split hash: duplicates never straddle train/test
    from semantic_olap_spark.functions.dedup import jaccard_pairs
    from semantic_olap_spark.functions.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.7, block_col="source")
    return leakage_safe_split(
        docs, pairs, {"train": 0.9, "test": 0.1}, "doc_id"
    ).select("doc_id", "split")


def _q_leakage_safe_split_minhash(spark, sf_dir):
    # the SCALE path of the leakage-safe split: near-dup pairs come
    # from the banded MinHash-LSH candidate join (md5 exact mode so
    # the whole chain reproduces in SQL) instead of the quadratic
    # jaccard baseline — pairs → connected components → cluster-keyed
    # hash split, the pipeline a 100 TB corpus actually runs
    from semantic_olap_spark.functions.dedup import minhash_lsh_pairs
    from semantic_olap_spark.functions.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, shingle_n=3, threshold=0.5, exact_hash=True
    )
    return leakage_safe_split(
        docs, pairs, {"train": 0.9, "test": 0.1}, "doc_id"
    ).select("doc_id", "split")


def _q_redact_pii(spark, sf_dir):
    # the synthetic corpus has no PII, so both sides append a
    # deterministic doc_id-derived email/URL/IP/phone to every row;
    # redaction + per-kind counts then reproduce exactly in SQL
    from semantic_olap_spark.functions.cleaning import redact_pii

    docs = _t(spark, sf_dir, "documents", rebalance=True).select(
        "doc_id", "text"
    )
    d = F.col("doc_id").cast("string")
    docs = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), d, F.lit("@example.com"),
            F.lit(" via http://ex.com/p/"), d,
            F.lit(" from 10.0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 call +1415555"),
            (F.col("doc_id") % 10).cast("string"),
        ),
    )
    return redact_pii(docs).select(
        "doc_id", "text", "n_url", "n_email", "n_ip", "n_phone"
    )


def _q_repetition_profile(spark, sf_dir):
    from semantic_olap_spark.functions.cleaning import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents")).select(
        "doc_id", "top_token_frac", "dup_2gram_frac", "mean_token_len",
        "symbol_ratio",
    )


def _q_heuristic_filter(spark, sf_dir):
    from semantic_olap_spark.functions.cleaning import heuristic_filter

    return heuristic_filter(
        _t(spark, sf_dir, "documents"),
        min_tokens=20, max_top_token_frac=0.12, max_dup_2gram_frac=0.05,
    )


def _q_decontaminate_bench(spark, sf_dir):
    # benchmark decontamination: treat src0 as the eval set; drop any
    # other document sharing a verbatim 4-token span with it
    from semantic_olap_spark.functions.cleaning import decontaminate

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return decontaminate(corpus, bench, n=4)


def _q_contamination_report(spark, sf_dir):
    # audit companion of decontaminate_bench: annotate severity
    # instead of dropping
    from semantic_olap_spark.functions.cleaning import contamination_report

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return contamination_report(corpus, bench, n=4).select(
        "doc_id", "n_contaminated_grams", "contaminated"
    )


def _q_take_token_budget(spark, sf_dir):
    from semantic_olap_spark.functions.cleaning import take_token_budget

    return take_token_budget(
        _t(spark, sf_dir, "documents"), budget=1500, score_col="n_chars"
    ).select("doc_id", "n_chars", "n_tokens")


def _q_bm25_topk(spark, sf_dir):
    from semantic_olap_spark.functions.text import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents", rebalance=True),
        "spark join performance", k=10
    ).select("doc_id", "bm25")


def _q_bm25_rerank_cascade(spark, sf_dir, llm_factory=None):
    # the full production retrieval cascade, end-to-end with one
    # oracle: BM25 recall stage (top-40) → LLM precision stage
    # (rerank to 10).  Stage economics: BM25 is pure Catalyst over
    # the corpus; the judge reads exactly 40 candidates.  The stub
    # judge (token occurrences) reorders BM25's list — the oracle
    # reproduces both stages in SQL.
    from semantic_olap_spark.functions.retrieval import llm_rerank
    from semantic_olap_spark.functions.text import bm25_topk

    docs = _t(spark, sf_dir, "documents", rebalance=True).select(
        "doc_id", "text"
    )
    cands = bm25_topk(docs, "spark join performance", k=40).select("doc_id")
    with_text = docs.join(F.broadcast(cands), "doc_id")
    return llm_rerank(
        with_text, "text", "spark join performance", k=10, id_col="doc_id",
        llm_factory=llm_factory,
    ).select("doc_id", "llm_score")


def _q_chunk_documents(spark, sf_dir):
    # retrieval/context-window chunker: 32-token windows, stride 24
    from semantic_olap_spark.functions.packing import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents", rebalance=True), size=32, overlap=8
    ).select("doc_id", "chunk_id", "chunk", "n_chunk_tokens")


def _q_normalize_text(spark, sf_dir):
    from semantic_olap_spark.functions.cleaning import normalize_text

    return normalize_text(
        _t(spark, sf_dir, "documents", rebalance=True), out_col="norm"
    ).select("doc_id", "norm")


def _q_cap_per_source(spark, sf_dir):
    # anti-domination quota: best 3 docs per source by length
    from semantic_olap_spark.functions.cleaning import cap_per_group

    return cap_per_group(
        _t(spark, sf_dir, "documents"), "source", 3, order_col="n_chars"
    ).select("doc_id", "source", "n_chars")


def _q_rrf_fuse_hybrid(spark, sf_dir):
    # hybrid retrieval: BM25 lexical ranking fused with a document-
    # length prior by Reciprocal Rank Fusion.  Two lists per id →
    # the double sum is commutative, so round-6 scores are
    # bit-identical to the SQL oracle.
    from semantic_olap_spark.functions.retrieval import rrf_fuse
    from semantic_olap_spark.functions.text import bm25_topk

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    bm = bm25_topk(docs, "spark join performance", k=20).select(
        "doc_id", "bm25"
    )
    length = (
        docs.select(
            "doc_id", F.col("n_chars").cast("double").alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    return rrf_fuse([bm, length], k=10)


def _q_llm_rerank_docs(spark, sf_dir, llm_factory=None):
    # retrieval cascade stage 2 (functions/retrieval.py llm_rerank):
    # a cheap one-token prescreen bounds the candidate set to 40, the
    # LLM judge scores only that slice against the full query — LLM
    # cost ∝ candidates, never corpus.  Under the stub the judge is
    # the query-token occurrence count, so the whole cascade
    # hash-matches the SQL mirror.
    from semantic_olap_spark.functions.retrieval import llm_rerank

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.lower(F.col("text"))
    prescreen_score = (
        F.length(t) - F.length(F.replace(t, F.lit("spark")))
    ) / 5
    cands = (
        docs.withColumn("_ps", prescreen_score)
        .orderBy(F.col("_ps").desc(), F.col("doc_id").asc())
        .limit(40)
        .drop("_ps")
    )
    return llm_rerank(
        cands, "text", "spark join performance", k=10, id_col="doc_id",
        llm_factory=llm_factory,
    ).select("doc_id", "llm_score")


def _q_hash_embed(spark, sf_dir):
    # hashing-trick vectorizer (flattened — the compare sorts cells)
    from semantic_olap_spark.functions.text import hash_embed

    return hash_embed(
        _t(spark, sf_dir, "documents", rebalance=True), dim=16
    ).select(
        "doc_id", F.posexplode("embedding").alias("pos", "v")
    )


def _q_sentiment_docs(spark, sf_dir):
    from semantic_olap_spark.functions.text import sentiment_score

    return _t(spark, sf_dir, "documents", rebalance=True).select(
        "doc_id", sentiment_score(F.col("text")).alias("sentiment")
    )


def _q_extract_entities(spark, sf_dir):
    # the synthetic corpus has no entities, so both sides append a
    # deterministic doc_id-derived date/money/URL/proper-noun tail to
    # every row (same pattern as the redact_pii query)
    from semantic_olap_spark.functions.text import extract_entities

    docs = _t(spark, sf_dir, "documents", rebalance=True).select(
        "doc_id", "text"
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    name = (
        F.when(d % 3 == 0, F.lit("Alice Smith"))
        .when(d % 3 == 1, F.lit("Bob Jones"))
        .otherwise(F.lit("Carol White"))
    )
    docs = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" meet "), name,
            F.lit(" on 2024-"),
            F.lpad(((d % 12) + 1).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad(((d % 28) + 1).cast("string"), 2, "0"),
            F.lit(" at https://ex"), ds, F.lit(".org for $"),
            (d % 100).cast("string"), F.lit("."), ds,
        ),
    )
    return extract_entities(docs)


def _q_assemble_docs(spark, sf_dir):
    from semantic_olap_spark.functions.packing import assemble_docs

    return assemble_docs(
        _t(spark, sf_dir, "documents"), "source", sep="\n\n"
    )


def _q_dedup_against_embeddings(spark, sf_dir):
    # incremental semantic ingest: even vec_ids are the accumulated
    # corpus, odd the new batch; batch rows with cosine >= 0.42 to a
    # corpus row in an LSH bucket within Hamming 1 are dropped
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    seen = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    return dedup_against_embeddings(
        batch, seen, threshold=0.42, nbits=4, seed=42, multiprobe=1
    ).select("vec_id", "label")


def _q_quantized_topk(spark, sf_dir):
    from semantic_olap_spark.functions.similarity import quantized_topk

    q = _query_vec(spark, sf_dir)
    return quantized_topk(
        _t(spark, sf_dir, "embeddings"), q, k=10, rerank=4
    )


def _q_quantize_embeddings(spark, sf_dir):
    # flattened to scalar rows (the driver compare sorts cell values)
    from semantic_olap_spark.functions.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", "qscale", F.posexplode("qvec").alias("pos", "qi")
    )


def _q_ngram_lm_score(spark, sf_dir):
    # unigram LM trained on the corpus itself; ln() is libm on both
    # engines and the mean is rounded to 4 decimals, which absorbs
    # summation-order ulp differences (same tolerance class as the
    # avg/cosine oracles)
    from semantic_olap_spark.functions.text import ngram_lm_score

    return ngram_lm_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lm_score"
    )


def _q_mix_corpus(spark, sf_dir):
    # domain mixing to a 2:1:1 target over three sources; dyadic
    # weights keep the derived fractions bit-identical in the oracle
    from semantic_olap_spark.functions.sampling import mix_corpus

    return mix_corpus(
        _t(spark, sf_dir, "documents"), "source",
        {"src1": 0.5, "src2": 0.25, "src3": 0.25}, "doc_id",
    )


def _q_ngram_counts(spark, sf_dir):
    from semantic_olap_spark.functions.text import ngram_counts

    return ngram_counts(
        _t(spark, sf_dir, "documents"), n=2, min_count=5
    )


def _q_training_pipeline(spark, sf_dir):
    # the end-to-end corpus-curation story as ONE lazy plan:
    # quality gate → exact dedup → benchmark decontamination (src0
    # as the eval set) → deterministic train/test split.  Every
    # stage is scan-side or broadcast except dedup's one window
    # shuffle; the whole chain carries a single composed SQL oracle.
    from semantic_olap_spark.functions.cleaning import (
        decontaminate,
        heuristic_filter,
    )
    from semantic_olap_spark.caching import tracked_persist
    from semantic_olap_spark.functions.dedup import dedup_exact
    from semantic_olap_spark.functions.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    bench = docs.filter(F.col("source") == "src0")
    # tracked_persist (r13): decontaminate consumes `kept` twice
    # (the exploded n-gram hits side AND the anti-join keep side);
    # unpersisted, Catalyst re-executed the gate + dedup window per
    # consumer — the same multi-consumer shape the _spans twin
    # already persists.  Measured 3.6 s → 2.9 s at sf0.1, rows
    # identical; released via caching.release_caches().
    kept = tracked_persist(
        dedup_exact(
            heuristic_filter(
                docs, min_tokens=20,
                max_top_token_frac=0.12, max_dup_2gram_frac=0.05,
            )
        ).filter(F.col("source") != "src0")
    )
    clean = decontaminate(kept, bench, n=4)
    return train_test_split(
        clean, {"train": 0.9, "test": 0.1}, "doc_id"
    ).select("doc_id", "split")


def _q_training_pipeline_spans(spark, sf_dir):
    # the curation chain with ExactSubstr span removal inserted
    # between the quality gate and exact dedup: gate → strip
    # duplicated >=20-token spans (md5 oracle mode) → re-gate docs
    # that kept >=20 tokens → exact dedup on the REWRITTEN text →
    # decontaminate vs the ORIGINAL src0 eval set → hash split.
    # Span removal adds one fingerprint shuffle.  The strip output
    # feeds SIX downstream derivations (re-gate, dedup's two sides,
    # decontaminate's candidate chain, the split) and Catalyst does
    # not dedupe shared lineage — unpersisted, the plan re-executed
    # the gate + span strip per branch (measured: 7 parquet scan
    # nodes, 0 ReusedExchange).  tracked_persist is the caching.py
    # contract for exactly this multi-consumer shape: the strip runs
    # once, branches read the cache (LRU-safe, released via
    # release_caches()).
    from semantic_olap_spark.caching import tracked_persist
    from semantic_olap_spark.functions.cleaning import (
        decontaminate,
        heuristic_filter,
    )
    from semantic_olap_spark.functions.dedup import (
        _span_tokens,
        dedup_exact,
        remove_duplicate_spans,
    )
    from semantic_olap_spark.functions.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents", rebalance=True)
    gated = heuristic_filter(
        docs, min_tokens=20,
        max_top_token_frac=0.12, max_dup_2gram_frac=0.05,
    )
    cleaned = tracked_persist(
        remove_duplicate_spans(
            gated, k=20, fingerprint="md5"
        ).drop("removed_tokens", "orig_tokens")
    )
    regated = cleaned.filter(
        F.size(_span_tokens(F.col("text"))) >= 20
    )
    kept = dedup_exact(regated).filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    clean = decontaminate(kept, bench, n=4)
    return train_test_split(
        clean, {"train": 0.9, "test": 0.1}, "doc_id"
    ).select("doc_id", "split")


def _q_shuffle_rows_docs(spark, sf_dir):
    # deterministic global shuffle for training order: seeded-md5
    # key, parallel dense-ranks total order (no single-partition
    # window — the WindowExec warning class the repo bans)
    from semantic_olap_spark.functions.sampling import shuffle_rows

    return shuffle_rows(
        _t(spark, sf_dir, "documents"), ["doc_id"], seed=42
    ).select("doc_id", "shuffle_rank")


def _q_write_shards_roundtrip(spark, sf_dir):
    # the training-data last mile (sources/sinks.py write_shards):
    # seeded-shuffle documents into fixed-size shards, write them as
    # shard=K/ hive dirs + _manifest.json, then READ EVERYTHING BACK
    # — rows from the shard files, census from the manifest — and
    # join the two.  The oracle recomputes both sides from
    # `documents` alone (md5-seeded rank, shard = rank // 64, per-
    # shard count/min/max), so a wrong file layout, a dropped row, a
    # mis-sliced shard boundary, or a manifest that disagrees with
    # the files all hash-mismatch.
    import json
    import os
    import tempfile

    from semantic_olap_spark.sources.sinks import write_shards

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"solap_write_shards_{os.getpid()}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    manifest = write_shards(
        docs, out_dir, ["doc_id"], rows_per_shard=64, seed=42
    )
    census = spark.createDataFrame(
        [
            (m["shard"], m["rows"], m["min_rank"], m["max_rank"])
            for m in manifest["shards"]
        ],
        "shard long, shard_rows long, shard_min_rank long, shard_max_rank long",
    )
    # prove the read path, not the in-memory frame: reload the hive
    # layout AND re-read the manifest json from disk
    with open(os.path.join(out_dir, "_manifest.json")) as fh:
        disk = json.load(fh)
    assert disk["n_rows"] == manifest["n_rows"], "manifest file drift"
    back = spark.read.parquet(out_dir).select(
        "doc_id", "shuffle_rank", F.col("shard").cast("long").alias("shard")
    )
    return back.join(census, "shard").select(
        "doc_id", "shuffle_rank", "shard",
        "shard_rows", "shard_min_rank", "shard_max_rank",
    )


def _q_quantile_filter(spark, sf_dir):
    from semantic_olap_spark.functions.sampling import quantile_filter

    return quantile_filter(
        _t(spark, sf_dir, "orders"), "o_totalprice", 0.1, keep="top"
    )


def _q_dedup_against(spark, sf_dir):
    # incremental-ingest shape: treat src1 as the already-seen corpus
    from semantic_olap_spark.functions.dedup import dedup_against

    docs = _t(spark, sf_dir, "documents")
    seen = docs.filter(F.col("source") == "src1")
    return dedup_against(docs, seen)


def _q_profile_columns(spark, sf_dir):
    from semantic_olap_spark.functions.profiling import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_orderstatus", "o_totalprice", "o_custkey"],
    )


# ---- Spark-native relational breadth (SURVEY §2.5: joins/windows are
# gaps in the reference that Spark fills; these pin the physical
# strategy — broadcast dims, window without global sort) -----------------


def _q_join_revenue_by_nation(spark, sf_dir):
    # fact side rebalanced (r13): all three joins broadcast, so the
    # heavy per-row work — join probes + per-term decimal casts over
    # 600 k rows — is map-side only; the layout-deficit repartition
    # spreads it across cores (lineitem-only A/B 1.82 s → 1.49 s
    # median; rebalancing the dims too delays their broadcast builds
    # and loses, which is why the other _t calls stay plain).
    li = _t(spark, sf_dir, "lineitem", rebalance=True)
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # per-term decimal cast → exact (order-independent) summation, so
    # the result is bit-identical across engines; a double sum's
    # error bound (~1e-3 on 1e8) could flip the rounded cent
    revenue = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


def _q_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape: six-table star-snowflake join with a region
    # constraint and the customer-nation = supplier-nation "local"
    # condition.  Dimension chain (region→nation→supplier/customer)
    # broadcasts; lineitem⋈orders is the one genuine shuffle pair —
    # at 100 TB both sides are fact-scale, so that join stays a
    # shuffle hash join on the order key while every other edge is
    # broadcast (AQE confirms: one Exchange pair in the plan)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    o96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    revenue = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o96, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


def _q_pricing_summary(spark, sf_dir):
    # the TPC-H Q1 shape: one wide scan → one 4-group aggregate with
    # 8 measures.  Decimal casts per term make every sum
    # order-independent and the averages exact ratios, so the result
    # is bit-identical across engines (same trick as
    # join_revenue_by_nation).  100 TB posture: partial aggregation
    # map-side, 4 result rows cross the shuffle.
    li = _t(spark, sf_dir, "lineitem", rebalance=True)
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec(F.col("l_quantity"))), 2)
            .cast("double").alias("sum_qty"),
            F.round(F.sum(dec(F.col("l_extendedprice"))), 2)
            .cast("double").alias("sum_base_price"),
            F.round(F.sum(dec(disc)), 2)
            .cast("double").alias("sum_disc_price"),
            F.round(F.sum(dec(charge)), 2)
            .cast("double").alias("sum_charge"),
            # averages: exact decimal sum → double, THEN divide — the
            # engines' decimal-division scale rules differ, but a
            # double-by-int division of identical doubles does not
            F.round(F.sum(dec(F.col("l_quantity"))).cast("double") / cnt, 6)
            .alias("avg_qty"),
            F.round(
                F.sum(dec(F.col("l_extendedprice"))).cast("double") / cnt, 6
            ).alias("avg_price"),
            F.round(F.sum(dec(F.col("l_discount"))).cast("double") / cnt, 6)
            .alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def _q_shipping_priority(spark, sf_dir):
    # the TPC-H Q3 shape: selective date predicates on both sides of
    # a fact join, revenue per order, top-10.  Decimal per-term sums
    # (bit-exact), broadcast orders-side projection, then
    # TakeOrderedAndProject for the top-k.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.to_timestamp(F.lit("1995-03-15"))
    revenue = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            F.broadcast(
                orders.filter(F.col("o_orderdate") < cutoff).select(
                    "o_orderkey", "o_orderdate", "o_orderpriority"
                )
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def _q_asof_join_events(spark, sf_dir):
    from semantic_olap_spark.operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(left, right, "ts", ["user_id"]).select(
        "event_id", "user_id", "ts", "r_value", "r_ts"
    )


def _q_running_user_stats(spark, sf_dir):
    from semantic_olap_spark.streaming.stateful import running_user_stats

    return running_user_stats(_t(spark, sf_dir, "events"))


def _q_window_top_order_per_cust(spark, sf_dir):
    # grouped top-k operator (operators/deterministic.py:topk_per_group)
    from semantic_olap_spark.operators.deterministic import topk_per_group

    orders = _t(spark, sf_dir, "orders")
    return topk_per_group(
        orders, "o_custkey", "o_totalprice", k=1, tiebreak=["o_orderkey"]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


# ---- Spark-native analytics breadth (SURVEY §2.5 fill-ins) -------------
# The reference has no grouping sets / pivot / set ops / percentiles /
# date functions (SURVEY.md §2.5) — Spark built-ins provide them; these
# entries pin the exact semantics against the DuckDB oracle.


def _q_semi_join_urgent_custs(spark, sf_dir):
    # left-semi: customers with at least one urgent order.  The
    # probe side is the big fact table filtered then broadcast —
    # the customer scan is never shuffled.
    cust = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(
        F.broadcast(urgent), cust["c_custkey"] == F.col("o_custkey"),
        "left_semi",
    )


def _q_anti_join_custs_no_urgent(spark, sf_dir):
    # left-anti (TPC-H Q22 shape): customers with NO urgent order —
    # urgent-only filter keeps the row set nontrivial (every customer
    # in the synthetic data has at least one order of some priority)
    cust = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(
        F.broadcast(urgent), cust["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )


def _q_above_avg_orders(spark, sf_dir):
    # correlated-subquery shape (orders above their customer's own
    # average) decorrelated into ONE window pass — no self-join, no
    # second scan of the fact table
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("_cavg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("_cavg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def _q_range_join_events(spark, sf_dir):
    # interval containment: each click opens a 10-minute window; an
    # error event is matched to every same-user window containing it
    # (equi-part on user drives the hash join, the range condition is
    # a residual filter — relational.py range_join)
    from semantic_olap_spark.operators.relational import range_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
            F.col("value").alias("w_value"),
        )
    )
    return range_join(
        left, right, point="ts", start="w_start", end="w_end",
        by=["user_id"],
    ).select("event_id", "user_id", "ts", "w_start", "w_value")


def _q_rollup_order_revenue(spark, sf_dir):
    # pre-aggregate to the finest group BEFORE Expand (see
    # operators/reshape.py): count/decimal-sum merge losslessly, so
    # the (d+1)-way Expand runs over a handful of rows instead of
    # the whole fact scan
    orders = _t(spark, sf_dir, "orders")
    partial = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("_rev"),
    )
    return (
        partial.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n_orders"),
            F.round(F.sum("_rev"), 2).cast("double").alias("revenue"),
        )
    )


def _q_cube_shipping(spark, sf_dir):
    # same pre-reduce-then-Expand shape as rollup_order_revenue: the
    # 2^2 Expand multiplies only the ~6 finest groups, not the fact
    # scan (r05 scale study flagged the direct form at 10.7x per
    # 10x data; this makes the Expand cost O(groups))
    li = _t(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"),
    )
    return (
        partial.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n_items"),
            F.round(F.sum("_q"), 2).cast("double").alias("sum_qty"),
        )
    )


def _q_histogram_totalprice(spark, sf_dir):
    # equal-width histogram with dense bins: one groupBy on a
    # computed bucket + a bins-row spine join (functions/stats.py)
    from semantic_olap_spark.functions.stats import histogram

    return histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice",
        bins=10, lo=0.0, hi=600000.0,
    )


def _q_corr_matrix_lineitem(spark, sf_dir):
    # all pairwise Pearson correlations in ONE scan
    from semantic_olap_spark.functions.stats import corr_matrix

    return corr_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _q_k_anonymity_customers(spark, sf_dir):
    # privacy release gate: quasi-identifier groups smaller than k
    # (one map-side-combined groupBy; functions/quality.py)
    from semantic_olap_spark.functions.quality import (
        k_anonymity_violations,
    )

    return k_anonymity_violations(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=8
    )


def _q_quality_report_lineitem(spark, sf_dir):
    # expectation gate: every rule is a conditional-sum aggregate in
    # ONE scan (functions/quality.py); output rows = #rules
    from semantic_olap_spark.functions.quality import quality_report

    return quality_report(
        _t(spark, sf_dir, "lineitem"),
        [
            {"name": "qty_range", "between": ["l_quantity", 1, 50]},
            {"name": "disc_range", "between": ["l_discount", 0.0, 0.08]},
            {"name": "flag_set", "isin": ["l_returnflag", ["A", "N", "R"]]},
            {"name": "key_not_null", "not_null": "l_orderkey"},
            {"name": "price_pos", "expr": "l_extendedprice > 0"},
        ],
    )


def _q_referential_orphans(spark, sf_dir):
    # referential expectation: LEFT ANTI join against a (deliberately
    # truncated) parent — orphans are the violation rows
    from semantic_olap_spark.functions.quality import (
        referential_violations,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    parent = _t(spark, sf_dir, "orders").filter("o_orderkey % 3 = 0")
    return referential_violations(li, parent, "l_orderkey", "o_orderkey")


def _q_snapshot_diff_orders(spark, sf_dir):
    # snapshot audit: old = full orders; new drops every 7th order
    # and reprices every 5th — diff returns exactly the churn.  The
    # perturbation is an exact double addition (same IEEE result in
    # both engines; a ×1.1-and-round version trips half-way-rounding
    # differences between Spark and DuckDB)
    from semantic_olap_spark.functions.quality import snapshot_diff

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter("o_orderkey % 7 != 0")
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0,
                F.col("o_totalprice") + F.lit(1.5),
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return snapshot_diff(orders, new, "o_orderkey")


def _q_rolling_user_value(spark, sf_dir):
    # trailing 1-day window per user: incremental range frame, one
    # shuffle on the user key (functions/timeseries.py).  count is
    # exact; the windowed sum is re-derived bit-exactly in SQL via
    # the same decimal cast
    from semantic_olap_spark.functions.timeseries import rolling_agg

    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    out = rolling_agg(
        ev, "ts", "value", "user_id", window="1 days",
        aggs=("sum", "count"),
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("sum_value_1_days").cast("decimal(18,6)")
        .cast("double").alias("sum_1d"),
        F.col("count_value_1_days").alias("n_1d"),
    )


def _q_sessionize_events(spark, sf_dir):
    # row-level gap sessionization: lag + running sum over one
    # user-keyed window
    from semantic_olap_spark.functions.timeseries import sessionize

    return sessionize(
        _t(spark, sf_dir, "events"), "ts", "user_id", gap="30 minutes",
        tiebreak=("event_id",),
    ).select("event_id", "user_id", "ts", "session_id")


def _q_fuzzy_pairs_part_names(spark, sf_dir):
    # edit-distance entity resolution: brand-blocked candidate pairs,
    # length-band + thresholded-levenshtein pruning (operators/fuzzy.py)
    from semantic_olap_spark.operators.fuzzy import fuzzy_pairs

    return fuzzy_pairs(
        _t(spark, sf_dir, "part"), "p_name", "p_partkey",
        max_dist=2, block_col="p_brand",
    )


def _q_resample_daily_events(spark, sf_dir):
    # dense time axis: per-(type, day) aggregates including empty
    # days — agg first (one row per group-day crosses the shuffle),
    # then explode a per-group date spine (functions/timeseries.py)
    from semantic_olap_spark.functions.timeseries import resample

    ev = _t(spark, sf_dir, "events")
    return resample(ev, "ts", "day", "event_type", "value", "sum").withColumn(
        "sum_value", F.round("sum_value", 4)
    )


def _q_anomaly_events(spark, sf_dir):
    # rolling z-score anomalies (functions/timeseries.py): each value
    # vs the mean/stddev of its user's trailing 10 observations —
    # exact decimal rolling sums (no float reassociation) decoded
    # with one fixed double formula, so the SQL window mirror is
    # bit-exact.  One shuffle on user_id; sliding frame maintained
    # incrementally per task.
    from semantic_olap_spark.functions.timeseries import detect_anomalies

    ev = _t(spark, sf_dir, "events")
    flagged = detect_anomalies(
        ev.select("event_id", "ts", "user_id", "value"),
        "ts", "value", "user_id",
        n_prev=10, z=2.5, min_prev=5, order_by=["event_id"],
    )
    return flagged.filter(F.col("is_anomaly")).select(
        "user_id", "event_id", "ts", "value", "zscore"
    )


def _q_ffill_user_values(spark, sf_dir):
    # LOCF forward-fill per user: one group-keyed window, running
    # state independent of window length
    from semantic_olap_spark.functions.timeseries import ffill

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.when(
            F.pmod(F.col("event_id"), F.lit(2)) == 0, F.col("value")
        ).alias("v"),
    )
    return ffill(ev, ["v"], "ts", "user_id").withColumn(
        "v", F.round("v", 4)
    )


def _q_top_frequent_priority(spark, sf_dir):
    # exact heavy hitters: distinct-value counts (one shuffle, map-
    # side combined) + bounded per-group top-k window
    from semantic_olap_spark.functions.sketches import top_frequent

    orders = _t(spark, sf_dir, "orders")
    return top_frequent(
        orders, "o_orderpriority", k=3, group_by="o_orderstatus", support=0.0
    )


def _q_approx_distinct_merge(spark, sf_dir):
    # mergeable HLL sketches: per-batch sketch rows union-merged to
    # per-flag estimates — the incremental-ingest distinct path.  The
    # sketch binary is implementation-defined (no SQL oracle);
    # tests/test_sketches.py pins merge parity + error bounds
    from semantic_olap_spark.functions.sketches import (
        distinct_sketch,
        estimate_distinct,
        merge_distinct_sketches,
    )

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "_b", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(4))
    )
    per_batch = distinct_sketch(li, "l_orderkey", ["l_returnflag", "_b"])
    return estimate_distinct(
        merge_distinct_sketches(per_batch.drop("_b"), "l_returnflag")
    )


def _q_target_encode_orders(spark, sf_dir):
    # leave-one-out target encoding (functions/binning.py): one
    # map-side-combined category groupBy broadcast back onto the
    # frame; decimal sums + exact-sum-then-divide make the encoding
    # hash-exact.  Every priority class has thousands of rows, so
    # the LOO branch covers all of them.
    from semantic_olap_spark.functions.binning import target_encode

    return target_encode(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    ).select("o_orderkey", "o_orderpriority", "te")


def _q_stream_materialized_agg(spark, sf_dir):
    # continuous materialized view (streaming/materialized.py): an
    # availableNow file stream over events folds per-micro-batch
    # aggregate states into epoch-keyed generations; the query
    # returns the finalized newest generation.  Oracle = the one-shot
    # global aggregate — the stream-maintained state must equal it
    # bit-exactly (decimal sums).
    import shutil
    import tempfile

    from semantic_olap_spark.functions.incremental import finalize_agg
    from semantic_olap_spark.streaming.materialized import (
        maintain_agg_state,
        read_agg_state,
    )
    from semantic_olap_spark.streaming.windows import read_events_stream

    work = tempfile.mkdtemp(prefix="mvq_")
    try:
        stream = read_events_stream(spark, sf_dir).select(
            "event_type", "value"
        )
        q = maintain_agg_state(
            stream,
            f"{work}/state",
            ["value"],
            group_by="event_type",
            checkpoint=f"{work}/ckpt",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_materialized_agg did not drain in 300s"
            )
        out = finalize_agg(
            read_agg_state(spark, f"{work}/state"), ["value"]
        )
        # materialize BEFORE the finally removes the state tree the
        # lazy plan reads from; |groups| rows (one per event_type),
        # a bounded driver copy — same discipline as
        # _q_span_stream_ingest
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_stream_sem_filter(spark, sf_dir):
    """sem_filter inside Structured Streaming (streaming/semantic.py).

    The batch Arrow-UDF column runs unchanged per micro-batch; an
    availableNow run over the documents parquet must equal the batch
    operator, so the oracle is the same SQL as `sem_filter`.  Proves
    the "classify as it arrives" composition the reference never had.
    """
    from semantic_olap_spark.streaming.semantic import (
        read_documents_stream,
        run_stream_to_table,
        sem_filter_stream,
    )

    stream = sem_filter_stream(
        read_documents_stream(spark, sf_dir, max_files_per_trigger=1),
        ["text"], "rows about spark",
    )
    return run_stream_to_table(stream, spark, "drv_stream_sem_filter")


def _q_stream_anomalies(spark, sf_dir):
    """Rolling z-score anomalies inside Structured Streaming
    (streaming/stateful.py streaming_anomalies).

    applyInPandasWithState keeps the trailing n_prev value slots per
    user across micro-batches; score math reproduces the batch
    operator bit-for-bit (pytest pins stream==batch across a
    time-split), so the oracle is the same SQL window mirror as
    `anomaly_events` minus the timestamp column (the stream state
    schema carries unix-seconds doubles).
    """
    from semantic_olap_spark.streaming.semantic import run_stream_to_table
    from semantic_olap_spark.streaming.stateful import streaming_anomalies

    ev = _t(spark, sf_dir, "events")
    src = ev.select("event_id", "ts", "user_id", "value")
    # events.parquet is TIMESTAMP(NANOS): readStream lacks the batch
    # loader's nanos handling, so stage the normalized frame once
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="stream_anom_")
    try:
        staged = base + "/events"
        src.coalesce(1).write.mode("overwrite").parquet(staged)
        stream = spark.readStream.schema(src.schema).parquet(staged)
        out = run_stream_to_table(
            streaming_anomalies(stream, n_prev=10, z=2.5, min_prev=5),
            spark, "drv_stream_anomalies", output_mode="update",
        )
        out = out.filter(F.col("is_anomaly")).select(
            "user_id", "event_id", "value", "zscore"
        )
        # the memory sink holds rows on the driver, but materialize
        # anyway so the returned frame has no dependency on this
        # session's sink table either — then drop the staging tree
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _q_quantile_bucket_orders(spark, sf_dir):
    # exact equal-frequency binning (functions/binning.py): rank via
    # the parallel dense_ranks construction, bucket = all-integer
    # floor(rank*n/count) — reproducible anywhere, no single-
    # partition ntile, no engine-dependent approx edges.
    from semantic_olap_spark.functions.binning import quantile_bucket

    return quantile_bucket(
        _t(spark, sf_dir, "orders"), "o_totalprice", 8, "o_orderkey"
    ).select("o_orderkey", "o_totalprice", "bucket")


def _q_weighted_sample_docs(spark, sf_dir):
    # importance sampling ∝ document length: md5 uniform + one IEEE
    # multiply + compare — every step bit-identical in the oracle.
    # Scan-side filter, pushdown-safe, stable under corpus growth.
    from semantic_olap_spark.functions.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"), "n_chars", "doc_id",
        rate_scale=1 / 1000.0,
    )


def _q_sql_interface(spark, sf_dir):
    # the SQL-first surface (semantic_olap_spark/sql.py): temp views
    # + semantic UDFs make the whole engine reachable from
    # spark.sql; deterministic predicates still push to the scan
    # below the UDF (plan-pinned in tests/test_sql.py)
    from semantic_olap_spark.sql import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT source, count(*) AS n
        FROM documents
        WHERE n_chars > 200 AND sem_filter(text, 'mentions window')
        GROUP BY source
        """
    )


def _q_sem_dedup_pairs(spark, sf_dir):
    # LLM-verified near-dup cascade: md5 MinHash-LSH blocking (the
    # oracle-reproducible exact mode) proposes candidates, the stub
    # judge (token-set Jaccard >= 0.5 — mirrored in SQL) confirms.
    # The judge sees only blocked candidates, never n²/2 pairs.
    from semantic_olap_spark.operators.semantic import sem_dedup_pairs

    docs = _t(spark, sf_dir, "documents")
    return sem_dedup_pairs(
        docs, threshold=0.5, exact_hash=True, max_bucket_size=None
    )


def _q_cdc_upsert_customers(spark, sf_dir):
    # SCD-1 upsert (functions/cdc.py): reconcile the customer
    # snapshot with a deterministic synthetic change log (updates on
    # custkey%7, deletes on custkey%13; a later delete beats an
    # earlier update).  One shuffle on the business key; the oracle
    # states the post-image directly.
    from semantic_olap_spark.functions.cdc import apply_cdc

    cust = _t(spark, sf_dir, "customer")
    upd = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        cust.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("D"))
    )
    return apply_cdc(cust, upd.unionByName(dele), "c_custkey", "seq")


def _q_scd2_order_history(spark, sf_dir):
    # SCD-2 history (functions/cdc.py): per-customer order versions
    # with validity intervals from one lead window — the slowly-
    # changing-dimension build every warehouse needs.
    from semantic_olap_spark.functions.cdc import scd2_history

    orders = _t(spark, sf_dir, "orders")
    changes = orders.select(
        "o_custkey",
        "o_totalprice",
        F.col("o_orderkey").alias("seq"),
        F.lit("U").alias("op"),
    )
    return scd2_history(changes, "o_custkey", "seq")


def _q_temporal_join_events(spark, sf_dir):
    # point-in-time join (functions/cdc.py temporal_join): each click
    # meets the purchase "version" (SCD-2 interval per user) active
    # at its timestamp.  Key equality keeps it a plain equi-join with
    # the interval predicate as the residual — no nested loop.
    from semantic_olap_spark.functions.cdc import scd2_history, temporal_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("purchase_value"),
        F.col("ts").alias("pseq"),
        F.lit("U").alias("op"),
    )
    hist = scd2_history(purchases, "user_id", "pseq")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return temporal_join(clicks, hist, "user_id", "ts").select(
        "event_id", "purchase_value", "valid_from", "is_current"
    )


def _q_customer_order_distribution(spark, sf_dir):
    # the TPC-H Q13 shape: LEFT OUTER join + double aggregation.
    # customers with zero (non-urgent) orders must appear in the
    # c_count=0 bucket — the outer join is the point.  Aggregate
    # FIRST: the orders fact collapses to one count per custkey (one
    # shuffle, map-side combined) and THAT tiny frame is the
    # broadcast build side of the left join (BuildRight is legal for
    # LeftOuter) — the customer table is never shuffled, unlike the
    # naive outer-join-then-count which sort-merges BOTH sides.
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    per_cust = cust.join(
        F.broadcast(counts), cust["c_custkey"] == counts["o_custkey"], "left"
    ).select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("long"), "custdist")
    )


def _q_top_revenue_suppliers(spark, sf_dir):
    # the TPC-H Q15 shape: revenue view + scalar-max subquery.  The
    # per-supplier revenue aggregate runs once (one shuffle on
    # l_suppkey); the global max collapses to ONE row that broadcasts
    # back as the filter — at 100 TB the revenue frame is never
    # re-shuffled or re-scanned for the max compare.  Decimal revenue
    # keeps the equality compare bit-exact (a double max would make
    # "== max" float-fragile).
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (1 - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["_mx"])
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue"), 2)
            .cast("double")
            .alias("total_revenue"),
        )
    )


def _q_small_quantity_revenue(spark, sf_dir):
    # the TPC-H Q17 shape: correlated per-group average.  The
    # correlation decorrelates to a per-part aggregate joined back.
    # Selectivity FIRST: lineitem is semi-joined to the blue partkey
    # set BEFORE aggregating — per-part aggregates are keyed by
    # partkey, so restricting to blue parts is result-identical
    # (every line of a blue part survives the semi join) and shrinks
    # the broadcast agg by the predicate's selectivity instead of
    # carrying one row per part in the whole catalog.  The 0.2·avg
    # threshold is evaluated in EXACT integer-ish decimal
    # arithmetic: qty < 0.2·(sum/cnt)  ⟺  5·qty·cnt < sum — no
    # division, no float rounding hazard between engines.
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    blue = part.filter(F.col("p_name").contains("blue")).select(
        "p_partkey"
    )
    li_blue = li.join(
        F.broadcast(blue), li["l_partkey"] == blue["p_partkey"], "left_semi"
    )
    agg = li_blue.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_sq"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    small = li_blue.join(
        F.broadcast(agg), li_blue["l_partkey"] == agg["_pk"]
    ).filter(
        F.col("l_quantity").cast("decimal(18,6)") * 5 * F.col("_cnt")
        < F.col("_sq")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7, 2
        )
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def _q_late_supplier_blame(spark, sf_dir):
    # the TPC-H Q21 shape adapted to this schema (no commit/receipt
    # dates): for finalized multi-supplier orders, blame the supplier
    # whose line shipped STRICTLY LATEST — EXISTS (another supplier
    # in the order) + NOT EXISTS (another supplier shipping on/after
    # my date).  Both quantifiers run as semi/anti joins on
    # l_orderkey — self-joins on the fact's own key, no driver loop;
    # the supplier dim broadcasts.  No LIMIT: all qualifying
    # suppliers, no cross-engine tie-order hazard.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    sup = _t(spark, sf_dir, "supplier")
    l1 = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    exists_other = l1.join(
        l2,
        (l1["l_orderkey"] == l2["_ok2"]) & (l1["l_suppkey"] != l2["_sk2"]),
        "left_semi",
    )
    l3 = li.select(
        F.col("l_orderkey").alias("_ok3"),
        F.col("l_suppkey").alias("_sk3"),
        F.col("l_shipdate").alias("_sd3"),
    )
    blamed = exists_other.join(
        l3,
        (exists_other["l_orderkey"] == l3["_ok3"])
        & (exists_other["l_suppkey"] != l3["_sk3"])
        & (l3["_sd3"] >= exists_other["l_shipdate"]),
        "left_anti",
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select("s_suppkey", "s_name", "numwait")
    )


def _q_large_volume_orders(spark, sf_dir):
    # the TPC-H Q18 shape: aggregate-then-semi-join.  The heavy
    # groupBy runs FIRST (map-side combined, one shuffle on
    # l_orderkey); the HAVING filter collapses it to a tiny frame
    # that is then the broadcast side of BOTH enrichment joins — at
    # 100 TB orders/customer are never shuffled for this query.
    # Decimal quantity sums keep the threshold compare and output
    # bit-exact.  No LIMIT: all qualifying rows, so no cross-engine
    # tie-ordering hazard.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_sq")
        )
        .filter(F.col("_sq") > 300)
    )
    joined = orders.join(
        F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"]
    )
    return (
        cust.join(
            F.broadcast(joined), cust["c_custkey"] == joined["o_custkey"]
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice"),
            F.col("_sq").cast("double").alias("sum_qty"),
        )
    )


def _q_late_shipment_priority(spark, sf_dir):
    # TPC-H Q4 shape (EXISTS decorrelated to a compound-condition
    # semi join): orders in a window that had any lineitem shipped
    # after the order date.  The semi join is the one fact-fact
    # shuffle (on the order key, both sides pruned to 2 columns);
    # the count never materializes the match multiplicity.
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


def _q_returned_item_revenue(spark, sf_dir):
    # TPC-H Q10 shape: revenue lost to returns per customer over a
    # quarter window, top 20.  lineitem⋈orders is the fact-fact
    # shuffle; customer and nation broadcast; the final cut is a
    # TakeOrderedAndProject on (rounded revenue desc, custkey asc) —
    # rounding BEFORE the cut keeps the selection deterministic
    # cross-engine.
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def _q_supplier_variety(spark, sf_dir):
    # TPC-H Q16 shape (NOT IN as a broadcast anti join): distinct
    # suppliers per brand, excluding delinquent suppliers.  The
    # exclusion list and part dimension broadcast; the one big
    # shuffle is the count-distinct's own (brand, suppkey) partial
    # aggregate.  r13: the former pair-`distinct()` before the joins
    # was redundant — countDistinct dedupes anyway — and its extra
    # exchange + hash-agg pass cost ~0.3 s at sf0.1 (1.11 s → 0.80 s,
    # rows identical); partial aggregation on (brand, suppkey)
    # collapses the fact map-side just as well.
    pairs = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select("p_partkey", "p_brand")
    )
    return (
        pairs.join(F.broadcast(bad),
                   pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _q_volume_shipping(spark, sf_dir):
    # TPC-H Q7 shape: bilateral trade volume between two nations by
    # ship year.  Two independent dimension chains (supplier→nation,
    # orders→customer→nation) hang broadcast off the one
    # lineitem⋈orders shuffle; the nation-pair disjunction prunes
    # after both chains resolve.
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    revenue = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


def _q_promo_revenue_share(spark, sf_dir):
    # TPC-H Q14 shape (promo revenue share): a conditional-aggregate
    # RATIO in one pass.  The date-carrying lineitem scan broadcast-
    # joins the 2-column part dim; promo and total revenue are two
    # decimal sums over the SAME rows (map-side combined, one
    # shuffle), and the percentage is one fixed-order double division
    # at the end — no second scan, no self-join.  Reference scope:
    # conditional-agg ratios are the reference's num_reduce territory
    # (SURVEY §2.1) re-expressed as a relational plan shape.
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
            ).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            "ship_month",
            # both sums are exact decimals; the share is computed in
            # ONE double expression shape mirrored by the oracle:
            # (100.0 * promo) / total, round 6
            F.round(
                F.lit(100.0)
                * F.col("_promo").cast("double")
                / F.col("_total").cast("double"),
                6,
            ).alias("promo_share"),
            F.round(F.col("_total"), 2).cast("double").alias(
                "total_revenue"
            ),
        )
    )


def _q_disjunctive_band_revenue(spark, sf_dir):
    # TPC-H Q19 shape: an OR-of-ANDs predicate spanning BOTH join
    # sides (brand/size bands on part × quantity bands on lineitem).
    # The trap plan treats the disjunction as a join condition
    # (nested loop); the right plan keeps the equi-join on partkey
    # (part broadcasts), evaluates the disjunction ONCE post-join,
    # and lets Catalyst push each side's envelope to its scan — the
    # lineitem scan carries the quantity-band OR as a PushedFilter
    # and the part scan the brand/size OR, so neither side reads
    # rows no disjunct can accept.
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    qty = F.col("l_quantity")
    bands = (
        (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 30)
        )
    )
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .filter(bands)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def _q_dominant_supplier_share(spark, sf_dir):
    # TPC-H Q20-adapted (this star schema has no partsupp; lineitem
    # is the part-supplier bridge): suppliers that shipped MORE THAN
    # an EIGHTH of a cold-part's total shipped quantity (the uniform
    # synthetic corpus has no majority supplier — 12.5% is the
    # concentration cut that separates the top tail).  The correlated
    # per-part total decorrelates to a WINDOW over the pair-grain
    # aggregate — the fact is scanned and aggregated ONCE; a second
    # groupBy branch would re-execute the shared lineage (the exact
    # defect the r11 resample fix removed), while the window shuffles
    # only the (part, supplier)-grain frame.  The threshold compare
    # is exact decimal (8·q > total), division only for the reported
    # share.
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    cold = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("cold"))
        .select("p_partkey")
    )
    pairs = (
        li.join(
            F.broadcast(cold),
            li["l_partkey"] == cold["p_partkey"],
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q")
        )
    )
    tot = F.sum("_q").over(Window.partitionBy("l_partkey"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        pairs.withColumn("_tot", tot)
        .filter(F.col("_q") * 8 > F.col("_tot"))
        .join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            F.col("_q").cast("double").alias("supplier_qty"),
            F.col("_tot").cast("double").alias("part_total_qty"),
            F.round(
                F.col("_q").cast("double") / F.col("_tot").cast("double"),
                6,
            ).alias("share"),
        )
    )


def _q_market_share(spark, sf_dir):
    # TPC-H Q8 shape: one nation's share of a region's import revenue
    # per order year — a conditional-sum ratio in one aggregate pass
    # (never two scans).  Exact decimal numerator/denominator cast to
    # double for ONE fixed-order division, so the ratio is bit-exact
    # cross-engine.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    asia_cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
           ).cast("decimal(18,6)")
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                .otherwise(F.lit(0).cast("decimal(18,6)")))
    den = F.sum(vol)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust),
              F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation),
              F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(num.cast("double") / den.cast("double"), 6)
            .alias("mkt_share")
        )
    )


def _q_forecast_revenue_delta(spark, sf_dir):
    # TPC-H Q6 shape: the pure predicate-pushdown showcase — one
    # lineitem scan with ALL THREE filters (date band, discount band,
    # quantity cap) pushed to the parquet reader, one map-side-
    # combined global sum.  No join, no second pass; the 1-row output
    # crosses a SinglePartition exchange carrying per-partition
    # partials only.  Reference scope: num_filter+num_reduce
    # composition (SURVEY §2.1) as the canonical scan-agg plan.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount"))
                    .cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _q_product_profit(spark, sf_dir):
    # TPC-H Q9 shape adapted to this star schema (no partsupp, so
    # unit cost is modeled as 60% of p_retailprice): profit per
    # supplier nation per order year over the name-filtered part
    # slice.  The one fact-fact shuffle is lineitem⋈orders on the
    # order key; part/supplier/nation are broadcast dims, and the
    # p_name filter prunes the part side BEFORE the join so the
    # broadcast carries only matching keys.  Profit terms are exact
    # decimals summed map-side; one final round-to-double.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


def _q_important_part_stock(spark, sf_dir):
    # TPC-H Q11 shape adapted (no partsupp: "stock value" is one
    # nation's shipped value per part): per-part value HAVING value >
    # 0.08% of that nation's global value.  The Q11 decorrelation the
    # plan demonstrates: ONE fact scan feeds a per-part aggregate
    # that is tracked_persist-ed (bounded: ≤|parts| rows), the global
    # total re-aggregates THE CACHE (never the fact), and the 1-row
    # total broadcasts back as a cross join — no second lineitem
    # scan, no single-partition window over the fact.
    from semantic_olap_spark.caching import tracked_persist

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n3 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    val = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    grouped = tracked_persist(
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey"),
              "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("_val"))
    )
    total = grouped.agg(F.sum("_val").alias("_tot"))
    return (
        grouped.join(F.broadcast(total))
        .filter(
            F.col("_val").cast("double")
            > F.lit(0.0008) * F.col("_tot").cast("double")
        )
        .select(
            "l_partkey",
            F.round(F.col("_val"), 2).cast("double").alias("stock_value"),
        )
    )


def _q_min_cost_supplier(spark, sf_dir):
    # TPC-H Q2 shape adapted (no partsupp: a supplier's unit cost for
    # a part is its shipped extendedprice/quantity ratio): for every
    # LARGE part under size 15, the cheapest supplier with nation —
    # the correlated min-subquery decorrelated as a row_number window
    # PARTITIONED BY part (parallel, never a global sort), ties
    # broken by supplier key for determinism.  Part filter prunes
    # before the fact join; supplier+nation broadcast onto the
    # one-winner-per-part frame.
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    # rank on the UNROUNDED ratio (exact decimal sums → one IEEE
    # division, bit-identical cross-engine); rounding only the
    # projected output keeps a half-boundary value from flipping the
    # row_number winner between Spark's HALF_UP and DuckDB's
    # float-based round
    cost = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                .cast("double")
            ).alias("_cost")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("_cost").asc(), F.col("l_suppkey").asc()
    )
    return (
        cost.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.round(F.col("_cost"), 6).alias("unit_cost"),
        )
    )


def _q_idle_customers(spark, sf_dir):
    # TPC-H Q22 shape: above-average-balance customers with no RECENT
    # orders (the churn-risk cut) — a scalar subquery (broadcast
    # 1-row threshold) + an anti join that shuffles on the customer
    # key (orders is fact-scale; the date filter prunes it at the
    # scan).  Threshold math is decimal-sum/count in one fixed double
    # order, bit-exact cross-engine.
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
             / F.count("c_acctbal")).alias("_thr")
        )
    )
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_thr"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,6)")), 2)
            .cast("double").alias("total_bal"),
        )
    )


def _q_pagerank_suppliers(spark, sf_dir):
    # fixed-point PageRank (functions/graph.py) over the
    # supplier→customer service graph (distinct lineitem⋈orders
    # pairs; customer keys offset to keep the bipartite key spaces
    # apart).  Integer arithmetic makes the 3-iteration result
    # bit-exact, so the oracle replays the iterations as unrolled
    # CTEs and hash-matches — a full-value oracle for an ITERATIVE
    # graph algorithm.
    from semantic_olap_spark.functions.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.lit(10_000_000) + F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, iterations=3)


def _q_bpe_tokenize_docs(spark, sf_dir):
    # distributed BPE encode (functions/bpe.py) under the PINNED
    # tokenizer vocabulary — the production shape: the merge table is
    # learned once (one map-side-combined word-count pass + a bounded
    # driver merge loop; provenance pinned by tests/test_bpe.py) and
    # then FROZEN, exactly like a model's shipped tokenizer.  The
    # encode is an Arrow-batched UDF with broadcast merge ranks and a
    # per-batch word cache.  Because the merge table is a constant,
    # the row is a pure function of the input rows and gets a full
    # hash-match oracle: merges embed as SQL literals, the greedy
    # lowest-rank-first merge loop is a recursive CTE over distinct
    # words (the lsh_topk literal-hyperplane trick).  Merge LEARNING
    # stays pytest-pinned (hand-computed merges, roundtrip,
    # repartition determinism, sf0.01 provenance re-learn).
    from semantic_olap_spark.functions.bpe import (
        PINNED_MERGES,
        bpe_token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return bpe_token_count(docs, PINNED_MERGES, "text").select(
        "doc_id", "bpe_n_tokens"
    )


def _q_grouping_sets_qty(spark, sf_dir):
    # explicit grouping sets via the package operator: only the
    # marginals + grand total — Expand emits 3 rows per input row
    # instead of the cube's 4 (operators/reshape.py)
    from semantic_olap_spark.operators.reshape import grouping_sets_agg

    li = _t(spark, sf_dir, "lineitem")
    return grouping_sets_agg(
        li, [["l_returnflag"], ["l_linestatus"], []], ["l_quantity"]
    )


def _q_monthly_growth(spark, sf_dir):
    # window breadth: lag-delta and ntile quartile over the monthly
    # revenue series — one partition-less window over ~#months rows
    # (bounded output of the upstream agg, not a scale risk)
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month")
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(
            F.col("revenue") - F.lag("revenue").over(w), 2
        ).alias("delta"),
        F.ntile(4).over(Window.orderBy("revenue")).alias("rev_quartile"),
    )


def _q_pivot_priority_by_status(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    # explicit value list: the two-pass distinct scan pivot() would
    # otherwise run is the thing to avoid at 100 TB
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    renames = {p: f"p{p[0]}" for p in prios}
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p])
          for p in prios],
    )


def _q_unpivot_lineitem_metrics(spark, sf_dir):
    # wide→long reshape (df.unpivot/melt): per-metric totals after
    # melting three measure columns into (metric, value) rows
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric", "value",
    )
    total = F.sum(F.col("value").cast("decimal(18,6)"))
    return long.groupBy("l_returnflag", "metric").agg(
        F.round(total, 2).cast("double").alias("total")
    )


def _q_set_ops_custkeys(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    finished = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    negative = (
        cust.filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    # set semantics (distinct), mirroring SQL INTERSECT / EXCEPT
    return urgent.intersect(finished).subtract(negative)


def _q_percentile_quantity(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # exact percentiles (linear interpolation), not approx_percentile:
    # the oracle needs bit-stable values.  At 100 TB approx_percentile
    # is the right default; exact mode is the correctness referent.
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
    )


def _q_incremental_orders_agg(spark, sf_dir):
    # incremental view maintenance (functions/incremental.py): fold
    # two per-batch aggregate STATES (count / exact decimal sum /
    # min / max) with a pure state merge, then finalize.  The oracle
    # is the single global aggregate — the contract is that batchwise
    # maintenance is bit-identical to full recompute.  Batches split
    # by order date, the ingest-partition shape; the merge shuffles
    # only state rows (|groups|), never the base table.
    from semantic_olap_spark.functions.incremental import (
        agg_state,
        finalize_agg,
        merge_agg_states,
    )

    orders = _t(spark, sf_dir, "orders")
    split = F.col("o_orderdate") < F.lit("1995-01-01")
    metrics = ["o_totalprice"]
    s1 = agg_state(orders.filter(split), metrics, group_by="o_orderstatus")
    s2 = agg_state(orders.filter(~split), metrics, group_by="o_orderstatus")
    merged = merge_agg_states([s1, s2], metrics, group_by="o_orderstatus")
    return finalize_agg(merged, metrics)


def _q_quantile_state_orders(spark, sf_dir):
    # mergeable quantile states (functions/incremental.py): the
    # streaming-maintainable alternative to the exact sort-based
    # percentile — a fixed-bin histogram state folded batch-by-batch
    # (elementwise integer adds, bit-exact under any fold order),
    # finalized with deterministic IEEE-double bin math that the SQL
    # oracle reproduces bit-for-bit.  Error ≤ one bin width (pinned
    # by pytest against percentile()); one state row of 64 longs per
    # group crosses the wire per batch.
    from semantic_olap_spark.functions.incremental import (
        finalize_quantiles,
        merge_quantile_states,
        quantile_state,
    )

    orders = _t(spark, sf_dir, "orders")
    split = F.col("o_orderkey") % 2 == 0
    b1 = quantile_state(
        orders.filter(split), "o_totalprice", 0.0, 600000.0, 64,
        group_by="o_orderpriority",
    )
    b2 = quantile_state(
        orders.filter(~split), "o_totalprice", 0.0, 600000.0, 64,
        group_by="o_orderpriority",
    )
    merged = merge_quantile_states([b1, b2], group_by="o_orderpriority")
    return finalize_quantiles(merged, 0.0, 600000.0, qs=[0.5, 0.95])


def _q_monthly_revenue(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    revenue = F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
    # cast to DATE: Spark's date_trunc returns TIMESTAMP while
    # DuckDB's returns DATE for month granularity — pin one type so
    # the value-hash compare sees identical objects either way
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date").alias("month")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(revenue, 2).cast("double").alias("revenue"),
        )
    )


def _q_embedding_dedup_lsh(spark, sf_dir):
    # the scale path for embedding dedup: LSH-bucket the corpus once
    # (sign-bit signatures, seeded hyperplanes), then all-pairs only
    # WITHIN buckets — near-linear vs the unblocked O(n²) baseline
    # below.  Recall < 1 by construction (cross-bucket pairs are
    # missed); the oracle reproduces the bucketing exactly, so this
    # is still a full hash-match row, not rows-only.
    from semantic_olap_spark.functions.dedup import dedup_keep_best
    from semantic_olap_spark.functions.similarity import (
        cosine_pairs,
        lsh_assign,
    )

    emb = _t(spark, sf_dir, "embeddings")
    bucketed = lsh_assign(emb, nbits=4, seed=42, bucket_col="_bkt")
    pairs = cosine_pairs(
        bucketed, threshold=0.42, block_col="_bkt"
    )
    return dedup_keep_best(emb, pairs, id_col="vec_id").select(
        "vec_id", "label"
    )


def _q_embedding_dedup(spark, sf_dir):
    from semantic_olap_spark.functions.dedup import dedup_keep_best
    from semantic_olap_spark.functions.similarity import cosine_pairs

    # embedding-cosine near-dup → connected components → keep lowest
    # id per cluster: the end-to-end semantic-dedup pipeline over the
    # embeddings table (threshold tuned to the synthetic corpus's
    # cosine range so real clusters form)
    emb = _t(spark, sf_dir, "embeddings")
    pairs = cosine_pairs(emb, threshold=0.42, allow_unblocked=True)
    return dedup_keep_best(emb, pairs, id_col="vec_id").select(
        "vec_id", "label"
    )


# ---- streaming operators (batch-parity forms) --------------------------


def _q_events_props_agg(spark, sf_dir):
    # JSON payload flattening: parse events.props into typed columns
    # and aggregate — the inverse of load_json_flat's stringify
    from semantic_olap_spark.sources.loaders import flatten_json_col

    return (
        flatten_json_col(_t(spark, sf_dir, "events"), "props")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("props_k").cast("long")).alias("sum_k"),
        )
    )


def _q_funnel_stages(spark, sf_dir):
    # per-user funnel progression (streaming_funnel's batch path —
    # the stream path is pytest-verified for batch parity)
    from semantic_olap_spark.streaming.stateful import streaming_funnel

    return streaming_funnel(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def _q_funnel_events(spark, sf_dir):
    # view → click → purchase ordered funnel, earliest-first
    # chaining with strict "after"
    from semantic_olap_spark.functions.analytics import funnel

    return funnel(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def _q_cohort_retention(spark, sf_dir):
    from semantic_olap_spark.functions.analytics import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), period="day")


def _q_windowed_agg(spark, sf_dir):
    from semantic_olap_spark.streaming import windowed_agg

    return windowed_agg(
        _t(spark, sf_dir, "events"), "ts", "1 hour",
        group_by=["event_type"], agg_col="value", aggs=("sum",),
    )


def _q_session_agg(spark, sf_dir):
    from semantic_olap_spark.streaming import session_agg

    return session_agg(
        _t(spark, sf_dir, "events"), "ts", "5 minutes", ["user_id"]
    )


# ---- planner verbs (§2.3) ----------------------------------------------


def _q_nl_filter_pipeline(spark, sf_dir):
    from semantic_olap_spark.plans.planner import run_nl_filter

    return run_nl_filter(
        _t(spark, sf_dir, "documents"),
        [
            {"id": 1, "agent": "slice", "instruction": "mentions spark in text"},
            {"id": 2, "agent": "dice", "field": "n_chars",
             "instruction": "n_chars > 200"},
        ],
        ["AND", 1, 2],
    )


def _q_engine_lifecycle(spark, sf_dir):
    from semantic_olap_spark.engine import OlapEngine

    eng = OlapEngine(_t(spark, sf_dir, "documents"), order_by=["doc_id"])
    return eng.run("mentions spark in text").drop("OLAP_ID")


def _q_engine_star_lifecycle(spark, sf_dir):
    # the NL lifecycle over a STAR SCHEMA: OlapEngine.from_star
    # broadcast-denormalizes orders⋈customer, then the same
    # decompose → plan → staged-filter path runs over the flat frame.
    from semantic_olap_spark.engine import OlapEngine

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    eng = OlapEngine.from_star(
        orders,
        [(cust, "o_custkey", "c_custkey")],
        order_by=["o_orderkey"],
    )
    return eng.run("mentions BUILDING in c_mktsegment").drop("OLAP_ID")


def _q_roll_up_events(spark, sf_dir):
    from semantic_olap_spark.plans.memory import CubeMemory
    from semantic_olap_spark.plans.rollup import roll_up
    from semantic_olap_spark.sources.loaders import with_olap_id

    ev = with_olap_id(_t(spark, sf_dir, "events"), order_by=["event_id"])
    mem = CubeMemory(ev)
    _, out = roll_up(
        mem, mem.root_id, "event_type", None,
        [{"dimension": "self", "reduce_target": "count how many"}],
    )
    return out.select("event_type", "count_of_event_type")


def _q_sem_filter_negated(spark, sf_dir):
    from semantic_olap_spark.operators.semantic import sem_filter

    # retain_if=False keeps rows judged *No* — the reference's
    # filter_LLM(..., retain_if=False) (Operaters.py:45,71-77)
    return sem_filter(
        _t(spark, sf_dir, "documents"), ["text"], "rows about spark",
        retain_if=False,
    )


def _q_sem_join_topics(spark, sf_dir, llm_factory=None):
    from semantic_olap_spark.operators.semantic import sem_join

    # beyond-reference LOTUS-style semantic join: documents × topic
    # list, judged by the LLM; stub rule = every significant token of
    # the right row is a substring of the left content, so the whole
    # operator (cascade + judge) reproduces exactly in SQL
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    topics = spark.createDataFrame(
        [("spark",), ("scan window",), ("quorum",)], ["topic"]
    )
    return sem_join(
        docs, topics, ["text"], ["topic"], "document covers the topic",
        _lf(llm_factory),
    ).select("doc_id", "topic")


def _q_drill_down_topic(spark, sf_dir):
    from semantic_olap_spark.plans.memory import CubeMemory
    from semantic_olap_spark.plans.rollup import drill_down
    from semantic_olap_spark.sources.loaders import with_olap_id

    docs = with_olap_id(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        order_by=["doc_id"],
    )
    mem = CubeMemory(docs)
    _, out = drill_down(
        mem, mem.root_id, "topic",
        "dominant topic, one of: vector, stream, window",
    )
    return out.select("doc_id", "topic")


def _q_topk_dispatch_num(spark, sf_dir):
    from semantic_olap_spark.plans.planner import topk_dispatch, understand_topk

    # full dispatch path (OLAP_Agent.py:437-476): intent detection →
    # numeric-column check → num_topk
    orders = _t(spark, sf_dir, "orders")
    params = understand_topk("top 10 orders by o_totalprice", orders.columns)
    return topk_dispatch(orders, params)


def _q_dimension_catalog(spark, sf_dir):
    from semantic_olap_spark.plans.memory import CubeMemory
    from semantic_olap_spark.sources.loaders import OLAP_ID, with_olap_id

    # get_dimension / get_granularity (engine.py ReAct observations):
    # the catalog listing those verbs read, one row per dimension
    ev = with_olap_id(_t(spark, sf_dir, "events"), order_by=["event_id"])
    mem = CubeMemory(ev)
    node = mem.nodes[mem.root_id]
    mem.register_granularity(
        node.id, "event_type", "event_type",
        node.df.select(OLAP_ID, "event_type"), description="root",
    )
    mem.register_granularity(
        node.id, "event_type", "evt_class",
        node.df.select(OLAP_ID, F.col("event_type").alias("evt_class")),
        description="coarser rollup",
    )
    rows = [
        (c, "; ".join(node.col_views[c].names()) if c in node.col_views else "")
        for c in sorted(node.dimensions())
    ]
    return spark.createDataFrame(
        rows, "dimension string, granularities string"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + M7.

    Insertion order is rotated by :func:`_coverage_order` so the
    driver's first-50 correctness sample covers a fresh slice of the
    contract each round; the name → callable mapping itself is
    stable.
    """
    reg = _registry()
    return {name: reg[name] for name in _coverage_order(list(reg))}


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # §2.1 deterministic
        "keyword_filter_or": _q_keyword_filter_or,
        "keyword_filter_and": _q_keyword_filter_and,
        "keyword_filter_irrelevant": _q_keyword_filter_irrelevant,
        "keyword_filter_equal": _q_keyword_filter_equal,
        "keyword_filter_contained_in": _q_keyword_filter_contained_in,
        "num_filter_and": _q_num_filter_and,
        "num_filter_or": _q_num_filter_or,
        "num_reduce_sum_by_flag": _q_num_reduce_sum_by_flag,
        "num_reduce_avg_global": _q_num_reduce_avg_global,
        "num_reduce_minmax": _q_num_reduce_minmax,
        "count_by_status_distinct": _q_count_by_status_distinct,
        "count_global": _q_count_global,
        "num_topk_desc": _q_num_topk_desc,
        "num_topk_asc": _q_num_topk_asc,
        # §2.1 semantic (StubLLM)
        "sem_filter": _q_sem_filter,
        "sem_filter_http": _q_sem_filter_http,
        "sem_filter_multi": _q_sem_filter_multi,
        "sem_map_topic": _q_sem_map_topic,
        "sem_group_workload": _q_sem_group_workload,
        # cluster-then-label scale path: O(n_clusters) LLM calls —
        # KMeans assignment is not SQL-expressible → rows-only
        "sem_group_cluster": _q_sem_group_cluster,
        "sem_reduce_by_region": _q_sem_reduce_by_region,
        "sem_reduce_global": _q_sem_reduce_global,
        "sem_topk_docs": _q_sem_topk_docs,
        "sem_topk_prescreen": _q_sem_topk_prescreen,
        # §2.2 physical filters
        "filter_enum": _q_filter_enum,
        "filter_pattern": _q_filter_pattern,
        # §2.4 logic trees + executor
        "filter_group_tree": _q_filter_group_tree,
        "filter_group_auto_order": _q_filter_group_auto_order,
        "plan_cascade": _q_plan_cascade,
        # pipeline: text analysis
        "text_profile": _q_text_profile,
        # pipeline: dedup
        "dedup_exact": _q_dedup_exact,
        "jaccard_pairs": _q_jaccard_pairs,
        "jaccard_pairs_prefix": _q_jaccard_pairs_prefix,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "minhash_dedup_against": _q_minhash_dedup_against,
        "simhash_pairs": _q_simhash_pairs,
        "winnow_overlap_pairs": _q_winnow_overlap_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_clusters_distributed": _q_dedup_clusters_distributed,
        "dedup_keep_best": _q_dedup_keep_best,
        "dup_spans_docs": _q_dup_spans_docs,
        "remove_dup_spans_docs": _q_remove_dup_spans_docs,
        "remove_spans_against_docs": _q_remove_spans_against_docs,
        "span_stream_ingest": _q_span_stream_ingest,
        "remove_spans_against_strided": _q_remove_spans_against_strided,
        "span_coverage_by_source": _q_span_coverage_by_source,
        # pipeline: similarity
        "cosine_topk": _q_cosine_topk,
        "cosine_pairs": _q_cosine_pairs,
        "cosine_pairs_expr": _q_cosine_pairs_expr,
        "lsh_topk": _q_lsh_topk,
        "ivf_topk": _q_ivf_topk,
        # Spark-native relational breadth
        "join_revenue_by_nation": _q_join_revenue_by_nation,
        "window_top_order_per_cust": _q_window_top_order_per_cust,
        "asof_join_events": _q_asof_join_events,
        "range_join_events": _q_range_join_events,
        "semi_join_urgent_custs": _q_semi_join_urgent_custs,
        "anti_join_custs_no_urgent": _q_anti_join_custs_no_urgent,
        "above_avg_orders": _q_above_avg_orders,
        "running_user_stats": _q_running_user_stats,
        # pipeline: multimodal
        "multimodal_metadata": _q_multimodal_metadata,
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        "sample_frames": _q_sample_frames,
        # pipeline: deterministic sampling & packing
        "hash_sample": _q_hash_sample,
        "stratified_sample": _q_stratified_sample,
        "train_test_split": _q_train_test_split,
        "shuffle_rows_docs": _q_shuffle_rows_docs,
        "write_shards_roundtrip": _q_write_shards_roundtrip,
        "reservoir_sample": _q_reservoir_sample,
        "pack_documents": _q_pack_documents,
        "leakage_safe_split": _q_leakage_safe_split,
        "quantile_filter": _q_quantile_filter,
        "dedup_against": _q_dedup_against,
        "profile_columns": _q_profile_columns,
        # pipeline: corpus cleaning
        "mix_corpus": _q_mix_corpus,
        "ngram_counts": _q_ngram_counts,
        "ngram_lm_score": _q_ngram_lm_score,
        "bm25_topk": _q_bm25_topk,
        "redact_pii": _q_redact_pii,
        "repetition_profile": _q_repetition_profile,
        "heuristic_filter": _q_heuristic_filter,
        "decontaminate_bench": _q_decontaminate_bench,
        "contamination_report": _q_contamination_report,
        "take_token_budget": _q_take_token_budget,
        "chunk_documents": _q_chunk_documents,
        "normalize_text": _q_normalize_text,
        "cap_per_source": _q_cap_per_source,
        "rrf_fuse_hybrid": _q_rrf_fuse_hybrid,
        "hash_embed": _q_hash_embed,
        "llm_rerank_docs": _q_llm_rerank_docs,
        "bm25_rerank_cascade": _q_bm25_rerank_cascade,
        "sentiment_docs": _q_sentiment_docs,
        "extract_entities": _q_extract_entities,
        "assemble_docs": _q_assemble_docs,
        "quantize_embeddings": _q_quantize_embeddings,
        "quantized_topk": _q_quantized_topk,
        "pricing_summary": _q_pricing_summary,
        "local_supplier_volume": _q_local_supplier_volume,
        "shipping_priority": _q_shipping_priority,
        "dedup_against_embeddings": _q_dedup_against_embeddings,
        "dedup_against_embeddings_expr": _q_dedup_against_embeddings_expr,
        "training_pipeline": _q_training_pipeline,
        "training_pipeline_spans": _q_training_pipeline_spans,
        # Spark-native analytics breadth (§2.5 fill-ins)
        "rollup_order_revenue": _q_rollup_order_revenue,
        "cube_shipping": _q_cube_shipping,
        "pivot_priority_by_status": _q_pivot_priority_by_status,
        "grouping_sets_qty": _q_grouping_sets_qty,
        "monthly_growth": _q_monthly_growth,
        "top_frequent_priority": _q_top_frequent_priority,
        "fuzzy_pairs_part_names": _q_fuzzy_pairs_part_names,
        "rolling_user_value": _q_rolling_user_value,
        "sessionize_events": _q_sessionize_events,
        "quality_report_lineitem": _q_quality_report_lineitem,
        "k_anonymity_customers": _q_k_anonymity_customers,
        "histogram_totalprice": _q_histogram_totalprice,
        "corr_matrix_lineitem": _q_corr_matrix_lineitem,
        "referential_orphans": _q_referential_orphans,
        "snapshot_diff_orders": _q_snapshot_diff_orders,
        "resample_daily_events": _q_resample_daily_events,
        "ffill_user_values": _q_ffill_user_values,
        "anomaly_events": _q_anomaly_events,
        "approx_distinct_merge": _q_approx_distinct_merge,
        "bpe_tokenize_docs": _q_bpe_tokenize_docs,
        "pagerank_suppliers": _q_pagerank_suppliers,
        "pagerank_suppliers_distributed": _q_pagerank_suppliers_distributed,
        "large_volume_orders": _q_large_volume_orders,
        "customer_order_distribution": _q_customer_order_distribution,
        "top_revenue_suppliers": _q_top_revenue_suppliers,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "late_supplier_blame": _q_late_supplier_blame,
        "late_shipment_priority": _q_late_shipment_priority,
        "returned_item_revenue": _q_returned_item_revenue,
        "supplier_variety": _q_supplier_variety,
        "volume_shipping": _q_volume_shipping,
        "promo_revenue_share": _q_promo_revenue_share,
        "disjunctive_band_revenue": _q_disjunctive_band_revenue,
        "dominant_supplier_share": _q_dominant_supplier_share,
        "market_share": _q_market_share,
        "idle_customers": _q_idle_customers,
        "forecast_revenue_delta": _q_forecast_revenue_delta,
        "product_profit": _q_product_profit,
        "important_part_stock": _q_important_part_stock,
        "min_cost_supplier": _q_min_cost_supplier,
        "cdc_upsert_customers": _q_cdc_upsert_customers,
        "sem_dedup_pairs": _q_sem_dedup_pairs,
        "temporal_join_events": _q_temporal_join_events,
        "sql_interface": _q_sql_interface,
        "weighted_sample_docs": _q_weighted_sample_docs,
        "quantile_bucket_orders": _q_quantile_bucket_orders,
        "stream_materialized_agg": _q_stream_materialized_agg,
        "stream_sem_filter": _q_stream_sem_filter,
        "stream_anomalies": _q_stream_anomalies,
        "target_encode_orders": _q_target_encode_orders,
        "scd2_order_history": _q_scd2_order_history,
        "set_ops_custkeys": _q_set_ops_custkeys,
        "unpivot_lineitem_metrics": _q_unpivot_lineitem_metrics,
        "percentile_quantity": _q_percentile_quantity,
        "incremental_orders_agg": _q_incremental_orders_agg,
        "quantile_state_orders": _q_quantile_state_orders,
        "monthly_revenue": _q_monthly_revenue,
        "embedding_dedup": _q_embedding_dedup,
        "embedding_dedup_lsh": _q_embedding_dedup_lsh,
        # event analytics
        "funnel_events": _q_funnel_events,
        "funnel_stages": _q_funnel_stages,
        "events_props_agg": _q_events_props_agg,
        "cohort_retention": _q_cohort_retention,
        # streaming (batch-parity forms)
        "windowed_agg": _q_windowed_agg,
        "session_agg": _q_session_agg,
        # §2.3 planner verbs + §3.1 lifecycle
        "nl_filter_pipeline": _q_nl_filter_pipeline,
        "roll_up_events": _q_roll_up_events,
        "engine_lifecycle": _q_engine_lifecycle,
        "engine_star_lifecycle": _q_engine_star_lifecycle,
        "sem_filter_negated": _q_sem_filter_negated,
        "sem_join_topics": _q_sem_join_topics,
        "drill_down_topic": _q_drill_down_topic,
        "topk_dispatch_num": _q_topk_dispatch_num,
        "dimension_catalog": _q_dimension_catalog,
        # r6 addition — registered LAST so the rotation keeps the
        # pre-existing never-sampled names ahead of it
        "leakage_safe_split_minhash": _q_leakage_safe_split_minhash,
    }



# bm25 scoring CTEs (d: tokenized docs, st: corpus stats, sc:
# round-4 scores) shared by the bm25_topk and rrf_fuse_hybrid
# oracles
_BM25_CTES = r"""d AS (
              SELECT doc_id,
                     str_split_regex(lower(trim(text)), '\s+') AS toks,
                     (CASE WHEN trim(text) = '' THEN 0
                           ELSE len(str_split_regex(trim(text), '\s+'))
                      END)::DOUBLE AS dl
              FROM documents
            ),
            st AS (
              SELECT count(*)::DOUBLE AS n,
                     avg(dl) AS avgdl,
                     sum(CASE WHEN list_contains(toks, 'spark')
                              THEN 1 ELSE 0 END)::DOUBLE AS df0,
                     sum(CASE WHEN list_contains(toks, 'join')
                              THEN 1 ELSE 0 END)::DOUBLE AS df1,
                     sum(CASE WHEN list_contains(toks, 'performance')
                              THEN 1 ELSE 0 END)::DOUBLE AS df2
              FROM d
            ),
            sc AS (
              SELECT doc_id,
                     round(
                       0.0
                       + ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
                         * (len(list_filter(toks, x -> x = 'spark'))::DOUBLE
                            * 2.2)
                         / (len(list_filter(toks, x -> x = 'spark'))::DOUBLE
                            + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
                         * (len(list_filter(toks, x -> x = 'join'))::DOUBLE
                            * 2.2)
                         / (len(list_filter(toks, x -> x = 'join'))::DOUBLE
                            + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
                         * (len(list_filter(toks,
                                x -> x = 'performance'))::DOUBLE * 2.2)
                         / (len(list_filter(toks,
                                x -> x = 'performance'))::DOUBLE
                            + 1.2 * (0.25 + 0.75 * dl / avgdl))
                     , 4) AS bm25
              FROM d, st
            )"""


_NORM_MD5 = r"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"


def _sent_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


from semantic_olap_spark.functions.text import (  # noqa: E402
    SENTIMENT_NEG as _SN,
    SENTIMENT_POS as _SP,
)

_SENT_POS = _sent_list(_SP)
_SENT_NEG = _sent_list(_SN)

# repetition metrics (functions/cleaning.py repetition_profile) as a
# DuckDB CTE chain; rounding and operand order mirror the Spark exprs
# so doubles are bit-identical
_REPETITION_CTE = r"""
        t AS (
          SELECT doc_id, text,
                 str_split_regex(lower(trim(text)), '\s+') AS toks
          FROM documents
        ),
        m AS (
          SELECT doc_id, text, toks, len(toks) AS n,
                 [array_to_string(toks[i + 1 : i + 2], ' ')
                  for i in generate_series(0, greatest(len(toks) - 2, 0))]
                     AS g2
          FROM t
        ),
        prof AS (
          SELECT doc_id, n,
                 round(CASE WHEN trim(text) = '' THEN 0
                       ELSE list_max(list_transform(list_distinct(toks),
                                s -> len(list_filter(toks, x -> x = s))
                            ))::DOUBLE / n
                       END, 6) AS top_token_frac,
                 round(CASE WHEN trim(text) = '' OR n < 2 THEN 0
                       ELSE 1 - len(list_distinct(g2))::DOUBLE / len(g2)
                       END, 6) AS dup_2gram_frac,
                 round(CASE WHEN trim(text) = '' THEN 0
                       ELSE list_sum(list_transform(toks, s -> len(s)))::DOUBLE
                            / n
                       END, 6) AS mean_token_len,
                 round(CASE WHEN len(text) > 0 THEN
                           len(regexp_replace(text, '[A-Za-z0-9\s]', '',
                               'g'))::DOUBLE / len(text)
                       ELSE 0 END, 6) AS symbol_ratio
          FROM m
        )
"""
_STOPS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "los", "las", "y", "es", "uno", "una", "en", "para", "por"),
}


def _hits(lang: str) -> str:
    vals = ", ".join(f"'{w}'" for w in _STOPS[lang])
    return (
        r"len(list_filter(str_split_regex(lower(trim(text)), '\s+'),"
        f" t -> t IN ({vals})))"
    )


def _lang_case() -> str:
    # mirror functions/text.py lang_id: first lang in (en,de,fr,es)
    # order with hits>0, strict > vs earlier langs, >= vs later
    langs = ("en", "de", "fr", "es")
    arms = []
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"h_{lang} > h_{other}")
            elif j > i:
                conds.append(f"h_{lang} >= h_{other}")
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(arms) + " ELSE 'unknown' END"


def _simhash_votes_sql() -> str:
    # one vote term per bit: majority of token-hash bits sets the bit
    return " + ".join(
        f"(sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0)::UBIGINT"
        f" * {1 << i}::UBIGINT"
        for i in range(64)
    )


def _lsh_bucket_sql(vec_expr: str, nbits: int = 4, seed: int = 42,
                    dim: int = 64) -> str:
    # The sign-bit LSH signature as a SQL expression.  Hyperplanes
    # depend only on (seed, dim) — exactly lsh_assign's UDF-side
    # derivation (similarity.py _hyperplanes) — so they embed as
    # full-precision literals; repr() round-trips float64 exactly.
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((nbits, dim))
    terms = []
    for i in range(nbits):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[i]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}::DOUBLE[]) > 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _bpe_merges_sql() -> str:
    # functions/bpe.py PINNED_MERGES as a VALUES literal table
    # (ml, mr, rank) — the frozen tokenizer vocabulary both sides
    # encode with; provenance pinned by tests/test_bpe.py.
    from semantic_olap_spark.functions.bpe import PINNED_MERGES

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return ", ".join(
        f"({q(left)}, {q(right)}, {i})"
        for i, (left, right) in enumerate(PINNED_MERGES)
    )


def _sgc_oracle_sql() -> str:
    # frozen cluster-taxonomy mirror: vocabulary-occurrence features
    # via the same length-replace trick, squared distance to each
    # pinned centroid as LEFT-ASSOCIATED double sums (the Spark
    # expression's IEEE evaluation order), first-occurrence argmin
    # via list_position(dists, list_min(dists)).  ::DOUBLE casts are
    # load-bearing — DuckDB parses bare decimal literals as DECIMAL,
    # whose exact arithmetic would diverge from Spark's doubles.
    from semantic_olap_spark.operators.semantic import (
        PINNED_WORKLOAD_CENTROIDS,
        PINNED_WORKLOAD_TAGS,
        WORKLOAD_VOCAB,
    )

    feats = ",\n                 ".join(
        f"length(t) - length(replace(t, '{w}', '')) AS c{d}"
        for d, w in enumerate(WORKLOAD_VOCAB)
    )
    dists = ",\n                 ".join(
        " + ".join(
            f"(c{d} - {v!r}::DOUBLE) * (c{d} - {v!r}::DOUBLE)"
            for d, v in enumerate(cen)
        )
        for cen in PINNED_WORKLOAD_CENTROIDS
    )
    tags = ", ".join(f"'{t}'" for t in PINNED_WORKLOAD_TAGS)
    return f"""
        WITH f AS (
          SELECT doc_id,
                 {feats}
          FROM (SELECT doc_id, lower(text) AS t FROM documents)
        ), d AS (
          SELECT doc_id,
                 [{dists}] AS dists
          FROM f
        )
        SELECT doc_id,
               (list_position(dists, list_min(dists)) - 1)::INTEGER
                 AS cluster,
               ([{tags}])[list_position(dists, list_min(dists))]
                 AS workload
        FROM d
    """


def _uhash_sql(key_expr: str, seed: int = 42) -> str:
    # functions/sampling.py uniform_hash: U[0,1) = first 32 md5 bits
    # of 'seed:key' / 2^32 — bit-identical in Spark and DuckDB
    return (
        f"(('0x' || substr(md5('{seed}:' || ({key_expr})::VARCHAR), 1, 8))"
        f"::BIGINT / 4294967296.0)"
    )


def _split_case_sql(weights: dict[str, float], key_expr: str,
                    seed: int = 42) -> str:
    # mirrors train_test_split's cumulative-range construction,
    # INCLUDING its float accumulation order (sorted labels), so the
    # literal boundaries are bit-identical to the Spark plan's
    total = float(sum(weights.values()))
    items = sorted(weights.items())
    u = _uhash_sql(key_expr, seed)
    parts = []
    cum = 0.0
    for label, w in items[:-1]:
        cum += float(w) / total
        parts.append(f"WHEN {u} < {cum!r} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{items[-1][0]}' END"


def _oracle_sql_literal() -> dict[str, str]:
    """DuckDB-ANSI mirrors for every SQL-expressible query above.

    The r7 strategy-twin rows (``*_prefix``/``*_expr``/
    ``*_distributed``) alias their default row's oracle verbatim in
    :func:`oracle_sql`: the oracles are strategy-independent by
    construction, and an alias (rather than a copy) keeps that a
    single source of truth.
    """
    text_profile_sql = rf"""
        WITH t AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(str_split_regex(trim(text), '\s+')) END AS n_tok,
                 len(regexp_extract_all(text,
                     '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe,
                 {_hits('en')} AS h_en, {_hits('de')} AS h_de,
                 {_hits('fr')} AS h_fr, {_hits('es')} AS h_es,
                 length(text)::DOUBLE AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                     AS n_alpha
          FROM documents
        )
        SELECT doc_id,
               n_tok AS n_tokens,
               n_bpe AS n_tokens_bpe,
               {_lang_case()} AS lang_pred,
               floor((0.4 * (CASE WHEN n_tok > 0
                                  THEN h_en / n_tok::DOUBLE ELSE 0 END)
                   + 0.3 * least(1.0, n_tok / 50.0)
                   + 0.3 * (CASE WHEN n_chars > 0
                                 THEN n_alpha / n_chars ELSE 0 END))
                     * 10000.0) / 10000.0
                   AS quality,
               {_NORM_MD5} AS fingerprint
        FROM t
    """
    jaccard_sql = r"""
        WITH t AS (
          SELECT doc_id, source,
                 list_distinct(str_split_regex(lower(trim(text)), '\s+'))
                     AS toks
          FROM documents
        ),
        p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(len(list_intersect(a.toks, b.toks))::DOUBLE
                       / len(list_distinct(list_concat(a.toks, b.toks))), 4)
                     AS jaccard
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
        )
        SELECT * FROM p WHERE jaccard >= 0.7
    """
    # connected components of the jaccard pair graph: recursive-CTE
    # reachability, component label = min reachable id (mirrors
    # dedup_clusters' min-label propagation fixpoint)
    clusters_cte = rf"""
        p AS ({jaccard_sql}),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM p
          UNION ALL SELECT id_b, id_a FROM p
        ),
        cnodes AS (SELECT DISTINCT u FROM edges),
        reach(u, r) AS (
          SELECT u, u FROM cnodes
          UNION
          SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
        ),
        cl AS (
          SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u
        )
    """
    return {
        "keyword_filter_or": """
            SELECT * FROM part
            WHERE contains(lower(concat_ws(' ', p_name, p_type)), 'red')
               OR contains(lower(concat_ws(' ', p_name, p_type)), 'economy')
        """,
        "keyword_filter_and": """
            SELECT * FROM part
            WHERE contains(lower(concat_ws(' ', p_name, p_type)), 'red')
              AND contains(lower(concat_ws(' ', p_name, p_type)), 'economy')
        """,
        "keyword_filter_irrelevant": """
            SELECT * FROM orders
            WHERE NOT (contains(lower(o_orderpriority), 'urgent')
                    OR contains(lower(o_orderpriority), 'high'))
        """,
        "keyword_filter_equal":
            "SELECT * FROM nation WHERE lower(n_name) = 'nation_7'",
        "keyword_filter_contained_in":
            "SELECT * FROM nation "
            "WHERE contains('union of nation_3 and nation_13', lower(n_name))",
        "num_filter_and": """
            SELECT * FROM lineitem
            WHERE coalesce(try_cast(l_quantity AS DOUBLE) > 30, false)
              AND coalesce(try_cast(l_discount AS DOUBLE) <= 0.05, false)
        """,
        "num_filter_or": """
            SELECT * FROM lineitem
            WHERE coalesce(try_cast(l_quantity AS DOUBLE) < 2, false)
               OR coalesce(try_cast(l_quantity AS DOUBLE) > 49, false)
        """,
        "num_reduce_sum_by_flag": """
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS sum_l_quantity,
                   round(sum(l_extendedprice), 2) AS sum_l_extendedprice
            FROM lineitem GROUP BY l_returnflag
        """,
        "num_reduce_avg_global":
            "SELECT round(avg(o_totalprice), 4) AS avg_o_totalprice FROM orders",
        "num_reduce_minmax": """
            SELECT l_linestatus,
                   max(l_extendedprice) AS max_l_extendedprice,
                   min(l_extendedprice) AS min_l_extendedprice
            FROM lineitem GROUP BY l_linestatus
        """,
        "count_by_status_distinct": """
            SELECT o_orderstatus, count(*) AS count,
                   count(DISTINCT o_custkey) AS distinct_o_custkey
            FROM orders GROUP BY o_orderstatus
        """,
        "count_global": "SELECT count(*) AS count FROM lineitem",
        "num_topk_desc":
            "SELECT * FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
        "num_topk_asc":
            "SELECT * FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 7",
        "sem_filter":
            "SELECT * FROM documents WHERE contains(lower(text), 'spark')",
        "sem_filter_http":
            "SELECT * FROM documents WHERE contains(lower(text), 'spark')",
        "stream_sem_filter":
            "SELECT * FROM documents WHERE contains(lower(text), 'spark')",
        "sem_filter_multi": """
            SELECT * FROM documents
            WHERE contains(lower(text), 'vector')
               OR contains(lower(text), 'stream')
        """,
        "sem_map_topic": """
            SELECT doc_id,
                   CASE WHEN contains(lower(text), 'vector') THEN 'vector'
                        WHEN contains(lower(text), 'stream') THEN 'stream'
                        WHEN contains(lower(text), 'window') THEN 'window'
                        ELSE 'NA' END AS topic
            FROM documents
        """,
        "sem_group_workload": """
            SELECT doc_id,
                   CASE WHEN contains(lower(text), 'scan') THEN 'scan'
                        WHEN contains(lower(text), 'join') THEN 'join'
                        WHEN contains(lower(text), 'sort') THEN 'sort'
                        ELSE 'other' END AS workload
            FROM documents
        """,
        "sem_reduce_by_region": """
            SELECT n_regionkey,
                   string_agg(n_name, '; ' ORDER BY n_name) AS names
            FROM (SELECT DISTINCT n_regionkey, n_name FROM nation)
            GROUP BY n_regionkey
        """,
        "sem_reduce_global":
            "SELECT string_agg(r_name, '; ' ORDER BY r_name) AS names "
            "FROM (SELECT DISTINCT r_name FROM region)",
        # sem_topk: the rotation tournament is deterministic under the
        # stub (win = more occurrences of the query's tokens; tie → A),
        # so the whole tournament is SQL-expressible: reproduce ranks,
        # the (rank+h) mod n pairing, per-side scores, and win counts
        "sem_topk_docs": r"""
            WITH d AS (
              SELECT doc_id, lower(text) AS t,
                     row_number() OVER (ORDER BY doc_id) - 1 AS rnk
              FROM documents
            ),
            tot AS (SELECT count(*) AS n FROM d),
            score AS (
              SELECT doc_id, rnk,
                     (length(t) - length(replace(t, 'spark', ''))) / 5
                   + (length(t) - length(replace(t, 'join', ''))) / 4
                   + (length(t) - length(replace(t, 'performance', ''))) / 11
                       AS s
              FROM d
            ),
            pairs AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb, a.s AS sa, b.s AS sb
              FROM score a
              CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS h) h
              JOIN score b ON b.rnk = (a.rnk + h.h) % (SELECT n FROM tot)
            ),
            wins AS (
              SELECT CASE WHEN sa >= sb THEN ida ELSE idb END AS wid
              FROM pairs
            ),
            w AS (SELECT wid AS doc_id, count(*) AS wins FROM wins GROUP BY wid)
            SELECT d.doc_id, coalesce(w.wins, 0) AS wins
            FROM d LEFT JOIN w USING (doc_id)
            ORDER BY wins DESC, d.doc_id LIMIT 10
        """,
        "sem_topk_prescreen": r"""
            WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
            score AS (
              SELECT doc_id, t,
                     (length(t) - length(replace(t, 'spark', ''))) / 5
                   + (length(t) - length(replace(t, 'join', ''))) / 4
                   + (length(t) - length(replace(t, 'performance', ''))) / 11
                       AS s
              FROM d
            ),
            slice AS (
              SELECT doc_id, s FROM score ORDER BY s DESC, doc_id LIMIT 40
            ),
            r AS (
              SELECT doc_id, s,
                     row_number() OVER (ORDER BY doc_id) - 1 AS rnk
              FROM slice
            ),
            tot AS (SELECT count(*) AS n FROM r),
            pairs AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb, a.s AS sa, b.s AS sb
              FROM r a
              CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS h) h
              JOIN r b ON b.rnk = (a.rnk + h.h) % (SELECT n FROM tot)
            ),
            wins AS (
              SELECT CASE WHEN sa >= sb THEN ida ELSE idb END AS wid
              FROM pairs
            ),
            w AS (SELECT wid AS doc_id, count(*) AS wins FROM wins GROUP BY wid)
            SELECT r.doc_id, coalesce(w.wins, 0) AS wins
            FROM r LEFT JOIN w USING (doc_id)
            ORDER BY wins DESC, r.doc_id LIMIT 10
        """,
        "filter_enum":
            "SELECT * FROM orders "
            "WHERE contains(lower(o_orderpriority), 'urgent')",
        "filter_pattern": r"""
            SELECT * FROM events
            WHERE coalesce(
                try_cast(regexp_extract(props, '(\d+)', 1) AS DOUBLE) > 50,
                false)
        """,
        "filter_group_tree": """
            SELECT * FROM documents
            WHERE contains(lower(text), 'spark')
              AND (n_chars > 200 OR contains(lower(text), 'window'))
        """,
        "filter_group_auto_order": """
            SELECT * FROM documents
            WHERE n_chars > 120
              AND contains(lower(text), 'scan')
              AND contains(lower(text), 'vector')
        """,
        "plan_cascade": """
            SELECT source, count(*) AS count FROM documents
            WHERE (contains(lower(text), 'spark')
                   OR contains(lower(text), 'join'))
              AND contains(lower(text), 'spark')
              AND n_chars > 100
            GROUP BY source
        """,
        "text_profile": text_profile_sql,
        "dedup_exact": rf"""
            SELECT * FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY {_NORM_MD5} ORDER BY doc_id) = 1
        """,
        "jaccard_pairs": jaccard_sql,
        # word-2-gram shingle Jaccard: DuckDB rebuilds the shingle
        # sets with the same slice semantics (clamped slices, whole
        # text when < n tokens)
        "ngram_jaccard_pairs": r"""
            WITH sh AS (
              SELECT doc_id, source,
                list_distinct(list_transform(
                  range(0, greatest(
                    len(str_split_regex(lower(trim(text)), '\s+')) - 2,
                    0) + 1),
                  i -> array_to_string(
                    str_split_regex(lower(trim(text)), '\s+')[i+1:i+2],
                    ' ')
                )) AS sg
              FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.sg, b.sg))::DOUBLE /
                         (len(a.sg) + len(b.sg)
                          - len(list_intersect(a.sg, b.sg))), 4)
                       AS jaccard
            FROM sh a JOIN sh b
              ON a.doc_id < b.doc_id AND a.source = b.source
            WHERE round(len(list_intersect(a.sg, b.sg))::DOUBLE /
                        (len(a.sg) + len(b.sg)
                         - len(list_intersect(a.sg, b.sg))), 4) >= 0.1
        """,
        # minhash_lsh_pairs runs in exact_hash (md5) mode for the
        # driver, so the whole pipeline — word 3-gram shingles → 64
        # min-hash functions md5('i:'||shingle) → 16 band keys
        # md5(h0|h1|h2|h3) → candidate equi-join → exact-Jaccard
        # verify — reproduces bit-for-bit in SQL
        "minhash_lsh_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id, list_distinct([
                  array_to_string(toks[j + 1 : j + 3], ' ')
                  for j in generate_series(0, greatest(len(toks) - 3, 0))
              ]) AS shingles
              FROM t
            ),
            hs AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
              CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
              GROUP BY doc_id, i
            ),
            bands AS (
              SELECT doc_id, i // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY i)) AS bh
              FROM hs GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bh = b.bh
               AND a.doc_id < b.doc_id
            ),
            p AS (
              SELECT c.id_a, c.id_b,
                     round(len(list_intersect(x.shingles, y.shingles))::DOUBLE
                           / len(list_distinct(
                                 list_concat(x.shingles, y.shingles))), 4)
                         AS jaccard
              FROM cand c
              JOIN sh x ON c.id_a = x.doc_id
              JOIN sh y ON c.id_b = y.doc_id
            )
            SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
        """,
        # sem_dedup_pairs: the md5 minhash pipeline above + the stub
        # judge mirrored in SQL (whitespace-token-set Jaccard of the
        # full texts >= 0.5)
        "sem_dedup_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id, list_distinct([
                  array_to_string(toks[j + 1 : j + 3], ' ')
                  for j in generate_series(0, greatest(len(toks) - 3, 0))
              ]) AS shingles
              FROM t
            ),
            hs AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
              CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
              GROUP BY doc_id, i
            ),
            bands AS (
              SELECT doc_id, i // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY i)) AS bh
              FROM hs GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bh = b.bh
               AND a.doc_id < b.doc_id
            ),
            p AS (
              SELECT c.id_a, c.id_b,
                     round(len(list_intersect(x.shingles, y.shingles))::DOUBLE
                           / len(list_distinct(
                                 list_concat(x.shingles, y.shingles))), 4)
                         AS jaccard
              FROM cand c
              JOIN sh x ON c.id_a = x.doc_id
              JOIN sh y ON c.id_b = y.doc_id
            )
            SELECT p.id_a, p.id_b, p.jaccard
            FROM p
            JOIN t a2 ON p.id_a = a2.doc_id
            JOIN t b2 ON p.id_b = b2.doc_id
            WHERE p.jaccard >= 0.5
              AND len(list_intersect(list_distinct(a2.toks),
                                     list_distinct(b2.toks)))::DOUBLE
                  / len(list_distinct(list_concat(a2.toks, b2.toks)))
                  >= 0.5
        """,
        # minhash_dedup_against: the same md5 signature/band pipeline
        # for BOTH sides, candidates = batch band keys hitting corpus
        # band keys, verify = exact shingle Jaccard, anti-join
        "minhash_dedup_against": f"""
            WITH t AS (
              SELECT doc_id, source,
                     str_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id, source, list_distinct([
                  array_to_string(toks[j + 1 : j + 3], ' ')
                  for j in generate_series(0, greatest(len(toks) - 3, 0))
              ]) AS shingles
              FROM t
            ),
            hs AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
              CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
              GROUP BY doc_id, i
            ),
            bands AS (
              SELECT doc_id, i // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY i)) AS bh
              FROM hs GROUP BY doc_id, i // 4
            ),
            batch AS (SELECT doc_id FROM documents
                      WHERE source IN {_BATCH_SRCS}),
            corp AS (SELECT doc_id FROM documents
                     WHERE source NOT IN {_BATCH_SRCS}),
            cand AS (
              SELECT DISTINCT a.doc_id AS qid, b.doc_id AS cid
              FROM bands a
              JOIN batch ON a.doc_id = batch.doc_id
              JOIN bands b ON a.band = b.band AND a.bh = b.bh
              JOIN corp ON b.doc_id = corp.doc_id
            ),
            dup AS (
              SELECT DISTINCT c.qid
              FROM cand c
              JOIN sh x ON c.qid = x.doc_id
              JOIN sh y ON c.cid = y.doc_id
              WHERE len(list_intersect(x.shingles, y.shingles))::DOUBLE
                    / len(list_distinct(
                          list_concat(x.shingles, y.shingles))) >= 0.5
            )
            SELECT d.* FROM documents d
            JOIN batch ON d.doc_id = batch.doc_id
            WHERE d.doc_id NOT IN (SELECT qid FROM dup)
        """,
        # winnow_overlap_pairs: exact_hash (md5) mode — k-gram md5
        # hashes, window-of-4 lexicographic min, distinct prints,
        # pairs sharing >= 3
        "winnow_overlap_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, [
                  md5(array_to_string(toks[j + 1 : j + 5], ' '))
                  for j in generate_series(0, greatest(len(toks) - 5, 0))
              ] AS grams
              FROM t
            ),
            fp AS (
              SELECT doc_id, list_distinct([
                  list_aggregate(grams[j + 1 : j + 4], 'min')
                  for j in generate_series(0, greatest(len(grams) - 4, 0))
              ]) AS prints
              FROM g
            ),
            e AS (SELECT doc_id, unnest(prints) AS fp FROM fp),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS shared
              FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, shared FROM pairs WHERE shared >= 3
        """,
        # simhash IS md5-based, so its whole pipeline (token hashes →
        # bit votes → chunk-banded candidates → Hamming verify)
        # reproduces exactly in SQL
        "simhash_pairs": rf"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_distinct(
                         str_split_regex(lower(trim(text)), '\s+'))) AS tok
              FROM documents
            ),
            hashed AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
              FROM toks
            ),
            sh AS (
              SELECT doc_id, {_simhash_votes_sql()} AS s
              FROM hashed GROUP BY doc_id
            ),
            keyed AS (
              SELECT doc_id, s, c, (s >> (c*16)) & 65535 AS cv
              FROM sh, (SELECT unnest([0, 1, 2, 3]) AS c)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                              a.s AS sa, b.s AS sb
              FROM keyed a JOIN keyed b
                ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, bit_count(xor(sa, sb))::INT AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "dedup_clusters": rf"""
            WITH RECURSIVE {clusters_cte}
            SELECT doc_id, cluster_id FROM cl
        """,
        "dedup_keep_best": rf"""
            WITH RECURSIVE {clusters_cte}
            SELECT d.* FROM documents d
            LEFT JOIN cl ON d.doc_id = cl.doc_id
            QUALIFY row_number() OVER (
                PARTITION BY coalesce(cl.cluster_id, d.doc_id)
                ORDER BY d.n_chars DESC, d.doc_id) = 1
        """,
        # ExactSubstr span dedup: k-gram md5 fingerprints → corpus-wide
        # dup filter → per-doc gaps-and-islands merge; bit-exact in SQL
        "dup_spans_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM t, unnest(CASE WHEN len(toks) >= 20
                                  THEN range(1, len(toks) - 18)
                                  ELSE range(1, 1) END) AS u(i)
            ),
            dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
            hit AS (
              SELECT g.doc_id, g.start, g.start + 19 AS e
              FROM g JOIN dup USING (h)
            ),
            pe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM hit
            ),
            isl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM pe
            )
            SELECT doc_id,
                   min(start)::BIGINT AS span_start,
                   max(e)::BIGINT     AS span_end,
                   (max(e) - min(start) + 1)::BIGINT AS span_tokens
            FROM isl GROUP BY doc_id, island
        """,
        "remove_dup_spans_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM t, unnest(CASE WHEN len(toks) >= 20
                                  THEN range(1, len(toks) - 18)
                                  ELSE range(1, 1) END) AS u(i)
            ),
            dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
            hit AS (
              SELECT g.doc_id, g.start, g.start + 19 AS e
              FROM g JOIN dup USING (h)
            ),
            pe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM hit
            ),
            isl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM pe
            ),
            spans AS (
              SELECT doc_id, min(start) AS s, max(e) AS e2
              FROM isl GROUP BY doc_id, island
            ),
            tok AS (
              SELECT doc_id, toks[u.i] AS tok, u.i AS pos
              FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
            ),
            kept AS (
              SELECT tp.doc_id, tp.pos, tp.tok FROM tok tp
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tp.doc_id
                  AND tp.pos BETWEEN s.s AND s.e2)
            ),
            agg AS (
              SELECT doc_id,
                     string_agg(tok, ' ' ORDER BY pos) AS text,
                     count(*) AS kept_n
              FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id, coalesce(a.text, '') AS text,
                   (len(t.toks) - coalesce(a.kept_n, 0))::BIGINT
                       AS removed_tokens,
                   len(t.toks)::BIGINT AS orig_tokens
            FROM t LEFT JOIN agg a USING (doc_id)
        """,
        # span coverage report: per source, tokens inside duplicated
        # >=20-token spans over the same md5 span pipeline
        "span_coverage_by_source": r"""
            WITH t AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM t, unnest(CASE WHEN len(toks) >= 20
                                  THEN range(1, len(toks) - 18)
                                  ELSE range(1, 1) END) AS u(i)
            ),
            dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
            hit AS (
              SELECT g.doc_id, g.start, g.start + 19 AS e
              FROM g JOIN dup USING (h)
            ),
            pe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM hit
            ),
            isl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM pe
            ),
            spans AS (
              SELECT doc_id,
                     (max(e) - min(start) + 1)::BIGINT AS span_tokens
              FROM isl GROUP BY doc_id, island
            ),
            totals AS (
              SELECT source, sum(len(toks))::BIGINT AS total_tokens
              FROM t GROUP BY source
            ),
            per_src AS (
              SELECT t.source,
                     count(*)::BIGINT AS n_spans,
                     sum(s.span_tokens)::BIGINT AS dup_tokens
              FROM spans s JOIN t ON s.doc_id = t.doc_id
              GROUP BY t.source
            )
            SELECT totals.source,
                   coalesce(p.n_spans, 0)::BIGINT AS n_spans,
                   coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
                   totals.total_tokens,
                   round(coalesce(p.dup_tokens, 0)
                         / totals.total_tokens::DOUBLE, 6) AS dup_frac
            FROM totals LEFT JOIN per_src p USING (source)
        """,
        # strided variant: the index samples every 3rd window position
        # (range step 3); the batch probe is unchanged
        "remove_spans_against_strided": r"""
            WITH tb AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents WHERE doc_id % 2 = 1
            ),
            idx AS (
              SELECT DISTINCT
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM (SELECT list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS toks
                    FROM documents WHERE doc_id % 2 = 0) tc,
                   unnest(CASE WHEN len(toks) >= 20
                               THEN range(1, len(toks) - 18, 3)
                               ELSE range(1, 1) END) AS u(i)
            ),
            g AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM tb, unnest(CASE WHEN len(toks) >= 20
                                   THEN range(1, len(toks) - 18)
                                   ELSE range(1, 1) END) AS u(i)
            ),
            hit AS (
              SELECT g.doc_id, g.start, g.start + 19 AS e
              FROM g JOIN idx USING (h)
            ),
            pe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM hit
            ),
            isl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM pe
            ),
            spans AS (
              SELECT doc_id, min(start) AS s, max(e) AS e2
              FROM isl GROUP BY doc_id, island
            ),
            tok AS (
              SELECT doc_id, toks[u.i] AS tok, u.i AS pos
              FROM tb, unnest(range(1, len(toks) + 1)) AS u(i)
            ),
            kept AS (
              SELECT tp.doc_id, tp.pos, tp.tok FROM tok tp
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tp.doc_id
                  AND tp.pos BETWEEN s.s AND s.e2)
            ),
            agg AS (
              SELECT doc_id,
                     string_agg(tok, ' ' ORDER BY pos) AS text,
                     count(*) AS kept_n
              FROM kept GROUP BY doc_id
            )
            SELECT tb.doc_id, coalesce(a.text, '') AS text,
                   (len(tb.toks) - coalesce(a.kept_n, 0))::BIGINT
                       AS removed_tokens,
                   len(tb.toks)::BIGINT AS orig_tokens
            FROM tb LEFT JOIN agg a USING (doc_id)
        """,
        # incremental ExactSubstr: batch windows whose fingerprints
        # exist in the even-id corpus index are removed from odd-id
        # batch docs
        "remove_spans_against_docs": r"""
            WITH tb AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents WHERE doc_id % 2 = 1
            ),
            idx AS (
              SELECT DISTINCT
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM (SELECT list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS toks
                    FROM documents WHERE doc_id % 2 = 0) tc,
                   unnest(CASE WHEN len(toks) >= 20
                               THEN range(1, len(toks) - 18)
                               ELSE range(1, 1) END) AS u(i)
            ),
            g AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM tb, unnest(CASE WHEN len(toks) >= 20
                                   THEN range(1, len(toks) - 18)
                                   ELSE range(1, 1) END) AS u(i)
            ),
            hit AS (
              SELECT g.doc_id, g.start, g.start + 19 AS e
              FROM g JOIN idx USING (h)
            ),
            pe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM hit
            ),
            isl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM pe
            ),
            spans AS (
              SELECT doc_id, min(start) AS s, max(e) AS e2
              FROM isl GROUP BY doc_id, island
            ),
            tok AS (
              SELECT doc_id, toks[u.i] AS tok, u.i AS pos
              FROM tb, unnest(range(1, len(toks) + 1)) AS u(i)
            ),
            kept AS (
              SELECT tp.doc_id, tp.pos, tp.tok FROM tok tp
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tp.doc_id
                  AND tp.pos BETWEEN s.s AND s.e2)
            ),
            agg AS (
              SELECT doc_id,
                     string_agg(tok, ' ' ORDER BY pos) AS text,
                     count(*) AS kept_n
              FROM kept GROUP BY doc_id
            )
            SELECT tb.doc_id, coalesce(a.text, '') AS text,
                   (len(tb.toks) - coalesce(a.kept_n, 0))::BIGINT
                       AS removed_tokens,
                   len(tb.toks)::BIGINT AS orig_tokens
            FROM tb LEFT JOIN agg a USING (doc_id)
        """,
        # span_stream_ingest: epoch 0 (even docs, empty index) is the
        # whitespace-normalized identity; epoch 1 (odd docs) is
        # exactly remove_spans_against_docs' oracle — the stream loop
        # (foreachBatch fold, delta index, output generations) must
        # land on the same values
        "span_stream_ingest": r"""
            WITH tb AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents WHERE doc_id % 2 = 1
            ),
            idx AS (
              SELECT DISTINCT
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM (SELECT list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS toks
                    FROM documents WHERE doc_id % 2 = 0) tc,
                   unnest(CASE WHEN len(toks) >= 20
                               THEN range(1, len(toks) - 18)
                               ELSE range(1, 1) END) AS u(i)
            ),
            g AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM tb, unnest(CASE WHEN len(toks) >= 20
                                   THEN range(1, len(toks) - 18)
                                   ELSE range(1, 1) END) AS u(i)
            ),
            hit AS (
              SELECT g.doc_id, g.start, g.start + 19 AS e
              FROM g JOIN idx USING (h)
            ),
            pe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM hit
            ),
            isl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM pe
            ),
            spans AS (
              SELECT doc_id, min(start) AS s, max(e) AS e2
              FROM isl GROUP BY doc_id, island
            ),
            tok AS (
              SELECT doc_id, toks[u.i] AS tok, u.i AS pos
              FROM tb, unnest(range(1, len(toks) + 1)) AS u(i)
            ),
            kept AS (
              SELECT tp.doc_id, tp.pos, tp.tok FROM tok tp
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tp.doc_id
                  AND tp.pos BETWEEN s.s AND s.e2)
            ),
            agg AS (
              SELECT doc_id,
                     string_agg(tok, ' ' ORDER BY pos) AS text,
                     count(*) AS kept_n
              FROM kept GROUP BY doc_id
            )
            SELECT doc_id,
                   array_to_string(
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> ''), ' ') AS text,
                   0::BIGINT AS removed_tokens,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> ''))::BIGINT AS orig_tokens
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT tb.doc_id, coalesce(a.text, '') AS text,
                   (len(tb.toks) - coalesce(a.kept_n, 0))::BIGINT
                       AS removed_tokens,
                   len(tb.toks)::BIGINT AS orig_tokens
            FROM tb LEFT JOIN agg a USING (doc_id)
        """,
        # image_features: the stub decode derives features from the
        # md5 content hash — exactly reproducible in SQL
        "image_features": """
            WITH h AS (SELECT md5(text) AS m FROM documents)
            SELECT m AS media_id,
                   64 + ('0x' || substr(m, 1, 2))::INT * 4 AS width,
                   64 + ('0x' || substr(m, 3, 2))::INT * 4 AS height,
                   round(('0x' || substr(m, 5, 2))::INT / 255.0, 6)
                       AS mean_luma
            FROM h
        """,
        # audio_features: like image_features, the stub decode derives
        # every feature from the md5 content hash; duration is dyadic
        # (x/16) so the DOUBLE cast is lossless on both sides
        "audio_features": """
            WITH h AS (SELECT md5(text) AS m FROM documents)
            SELECT m AS media_id,
                   (0.5 + ('0x' || substr(m, 7, 2))::INT / 16.0)::DOUBLE
                       AS duration_s,
                   8000 * (1 + ('0x' || substr(m, 9, 2))::INT % 5)
                       AS sample_rate,
                   round(('0x' || substr(m, 11, 2))::INT / 255.0, 6) AS rms
            FROM h
        """,
        "cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv),
                         6) AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, e.vec_id LIMIT 10
        """,
        "cosine_pairs": """
            WITH p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 6)
                         AS cosine
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
            )
            SELECT * FROM p WHERE cosine >= 0.4
        """,
        # lsh_topk: the hyperplanes are a pure function of (seed,
        # dim), so they embed as literals; candidates = corpus rows
        # whose 4-bit signature is within Hamming 1 of the query's
        # (== multiprobe=1's flip set); exact-rank the candidates
        "lsh_topk": f"""
            WITH c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            q AS (SELECT v AS qv FROM c WHERE vec_id = 0),
            b AS (
              SELECT vec_id, v, {_lsh_bucket_sql('v')} AS bkt FROM c
            ),
            qb AS (SELECT bkt AS qbkt FROM b WHERE vec_id = 0)
            SELECT b.vec_id,
                   round(list_cosine_similarity(b.v, q.qv), 6) AS cosine
            FROM b, q, qb
            WHERE bit_count(xor(b.bkt::BIGINT, qb.qbkt::BIGINT)) <= 1
            ORDER BY cosine DESC, b.vec_id LIMIT 10
        """,
        # ivf_topk: data-seeded centroids (embeddings 0..7) — assign
        # = nearest centroid (cid tiebreak, matching numpy argmin),
        # probe the 3 nearest the query, exact-rank within
        "ivf_topk": """
            WITH c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            q AS (SELECT v AS qv FROM c WHERE vec_id = 0),
            cents AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id < 8),
            assigned AS (
              SELECT c.vec_id, c.v, ce.cid
              FROM c CROSS JOIN cents ce
              QUALIFY row_number() OVER (
                  PARTITION BY c.vec_id
                  ORDER BY list_distance(c.v, ce.cv) ASC, ce.cid ASC) = 1
            ),
            probes AS (
              SELECT ce.cid FROM cents ce, q
              ORDER BY list_distance(q.qv, ce.cv) ASC, ce.cid ASC LIMIT 3
            )
            SELECT a.vec_id,
                   round(list_cosine_similarity(a.v, q.qv), 6) AS cosine
            FROM assigned a, q
            WHERE a.cid IN (SELECT cid FROM probes)
            ORDER BY cosine DESC, a.vec_id LIMIT 10
        """,
        "join_revenue_by_nation": """
            SELECT n_name,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_top_order_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) = 1
        """,
        "asof_join_events": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.value AS r_value, r.ts AS r_ts
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'error') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'click') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join_events": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.ts AS w_start, r.value AS w_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'error') l
            JOIN (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'click') r
              ON l.user_id = r.user_id
             AND l.ts >= r.ts
             AND l.ts < r.ts + INTERVAL '10 minutes'
        """,
        "semi_join_urgent_custs": """
            SELECT * FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')
        """,
        "anti_join_custs_no_urgent": """
            SELECT * FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')
        """,
        "above_avg_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                         avg(o_totalprice) OVER (PARTITION BY o_custkey)
                             AS cavg
                  FROM orders)
            WHERE o_totalprice > cavg
        """,
        "running_user_stats": """
            SELECT user_id, count(*) AS running_count,
                   round(sum(coalesce(value, 0)), 2) AS running_sum
            FROM events GROUP BY user_id
        """,
        "multimodal_metadata": """
            SELECT doc_id,
                   octet_length(encode(text)) AS media_bytes,
                   'unknown' AS media_format,
                   md5(text) AS media_id
            FROM documents
        """,
        "sample_frames": """
            SELECT doc_id, f.frame_idx
            FROM documents, (SELECT unnest([0, 1]) AS frame_idx) f
            WHERE text IS NOT NULL
        """,
        # deterministic sampling: u(key) = md5-derived U[0,1) — the
        # whole point of hash-based sampling is that this reproduces
        # exactly anywhere, including in the oracle
        "hash_sample": f"""
            SELECT * FROM documents
            WHERE {_uhash_sql('doc_id')} < 0.3
        """,
        # target_encode: leave-one-out mean via per-category decimal
        # window sums (every priority class is multi-row at sf>=0.001,
        # so no global-mean fallback rows appear)
        "target_encode_orders": """
            WITH s AS (
              SELECT o_orderkey, o_orderpriority, o_totalprice,
                     sum(CAST(o_totalprice AS DECIMAL(38,6)))
                         OVER (PARTITION BY o_orderpriority) AS sg,
                     count(o_totalprice)
                         OVER (PARTITION BY o_orderpriority) AS ng
              FROM orders
            )
            SELECT o_orderkey, o_orderpriority,
                   round((sg - CAST(o_totalprice AS DECIMAL(38,6)))::DOUBLE
                         / (ng - 1), 6) AS te
            FROM s
        """,
        # stream_materialized_agg: stream-maintained state ==
        # one-shot aggregate (the incremental-maintenance contract,
        # through the real Structured Streaming machinery)
        "stream_materialized_agg": """
            SELECT event_type,
                   count(*) AS n,
                   count(value) AS value_count,
                   round(sum(CAST(value AS DECIMAL(38,6))), 6)::DOUBLE
                       AS value_sum,
                   round(sum(CAST(value AS DECIMAL(38,6)))::DOUBLE
                         / count(value), 6) AS value_avg,
                   min(value) AS value_min,
                   max(value) AS value_max
            FROM events GROUP BY event_type
        """,
        # quantile_bucket: rank-based equal-frequency bins; the
        # bucket formula is all-integer so it replays exactly
        "quantile_bucket_orders": """
            WITH r AS (
              SELECT o_orderkey, o_totalprice,
                     row_number() OVER (ORDER BY o_totalprice,
                                        o_orderkey) - 1 AS rk,
                     count(*) OVER () AS total
              FROM orders
            )
            SELECT o_orderkey, o_totalprice,
                   ((rk * 8) // total)::INT AS bucket
            FROM r
        """,
        # weighted_sample: keep iff u(doc_id) < n_chars * scale — the
        # multiply and compare are IEEE-exact in both engines
        "weighted_sample_docs": f"""
            SELECT * FROM documents
            WHERE {_uhash_sql('doc_id')} < n_chars * (1.0 / 1000.0)
        """,
        "stratified_sample": f"""
            SELECT * FROM documents
            WHERE {_uhash_sql('doc_id')} <
                  CASE source WHEN 'src3' THEN 0.25
                              WHEN 'src2' THEN 0.5
                              WHEN 'src1' THEN 1.0
                              ELSE 0.0 END
        """,
        "train_test_split": f"""
            SELECT doc_id,
                   {_split_case_sql({'train': 0.8, 'test': 0.1, 'val': 0.1},
                                    'doc_id')} AS split
            FROM documents
        """,
        "reservoir_sample": f"""
            SELECT * FROM documents
            ORDER BY {_uhash_sql('doc_id')} ASC, doc_id ASC
            LIMIT 25
        """,
        "leakage_safe_split": f"""
            WITH RECURSIVE {clusters_cte}
            SELECT d.doc_id,
                   {_split_case_sql({'train': 0.9, 'test': 0.1},
                                    'coalesce(cl.cluster_id, d.doc_id)')}
                       AS split
            FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
        """,
        # leakage_safe_split_minhash: the SCALE-path variant — the
        # md5 MinHash-LSH pair chain (same CTEs as the
        # minhash_lsh_pairs oracle, threshold 0.5 / 3-gram shingles)
        # feeds the SAME connected-components + cluster-keyed hash
        # split as leakage_safe_split above
        "leakage_safe_split_minhash": rf"""
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id, list_distinct([
                  array_to_string(toks[j + 1 : j + 3], ' ')
                  for j in generate_series(0, greatest(len(toks) - 3, 0))
              ]) AS shingles
              FROM t
            ),
            hs AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
              CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
              GROUP BY doc_id, i
            ),
            bands AS (
              SELECT doc_id, i // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY i)) AS bh
              FROM hs GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bh = b.bh
               AND a.doc_id < b.doc_id
            ),
            p AS (
              SELECT c.id_a, c.id_b
              FROM cand c
              JOIN sh x ON c.id_a = x.doc_id
              JOIN sh y ON c.id_b = y.doc_id
              WHERE round(len(list_intersect(x.shingles, y.shingles))::DOUBLE
                          / len(list_distinct(
                                list_concat(x.shingles, y.shingles))), 4)
                    >= 0.5
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION ALL SELECT id_b, id_a FROM p
            ),
            cnodes AS (SELECT DISTINCT u FROM edges),
            reach(u, r) AS (
              SELECT u, u FROM cnodes
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
            ),
            cl AS (
              SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u
            )
            SELECT d.doc_id,
                   {_split_case_sql({'train': 0.9, 'test': 0.1},
                                    'coalesce(cl.cluster_id, d.doc_id)')}
                       AS split
            FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
        """,
        "quantile_filter": """
            SELECT * FROM orders
            WHERE o_totalprice::DOUBLE >= (
                SELECT quantile_cont(o_totalprice::DOUBLE, 0.9) FROM orders)
        """,
        "dedup_against": f"""
            SELECT * FROM documents
            WHERE {_NORM_MD5} NOT IN (
                SELECT {_NORM_MD5} FROM documents WHERE source = 'src1')
        """,
        # mix_corpus: the achievable-total/fraction arithmetic redone
        # in SQL with ::DOUBLE casts (DuckDB literals default to
        # DECIMAL) so the derived fractions are bit-identical
        "mix_corpus": f"""
            WITH cnt AS (
              SELECT source, count(*) AS c FROM documents
              WHERE source IN ('src1', 'src2', 'src3')
              GROUP BY source
            ),
            w AS (
              SELECT source, c,
                     (CASE source WHEN 'src1' THEN 0.5
                                  WHEN 'src2' THEN 0.25
                                  WHEN 'src3' THEN 0.25 END)::DOUBLE AS wt
              FROM cnt
            ),
            t AS (SELECT min(c / wt) AS tmax FROM w),
            fr AS (
              SELECT source, least(1.0::DOUBLE, tmax * wt / c) AS f
              FROM w, t
            )
            SELECT d.* FROM documents d
            JOIN fr ON d.source = fr.source
            WHERE {_uhash_sql('d.doc_id')} < fr.f
        """,
        # bm25: corpus stats (N, avgdl, per-term df) in one CTE, then
        # the scoring arithmetic written operand-for-operand like the
        # Spark expression (1-b precomputed to 0.25, fixed term
        # order, parenthesization matching Python's left-assoc) so
        # the round-4 doubles are bit-identical
        # rerank cascade: the prescreen cut (one-token score, top-40
        # by (score desc, id asc)) and the stub judge (full-query
        # token occurrences over the "text: <text>" rendering) are
        # both integer-exact, so the cascade hash-matches end-to-end
        "llm_rerank_docs": """
            WITH pres AS (
              SELECT doc_id, lower(text) AS t
              FROM documents
              ORDER BY (length(lower(text))
                        - length(replace(lower(text), 'spark', ''))) / 5
                       DESC, doc_id ASC
              LIMIT 40
            )
            SELECT doc_id,
                   CAST((length(t) - length(replace(t, 'spark', ''))) / 5
                      + (length(t) - length(replace(t, 'join', ''))) / 4
                      + (length(t) - length(replace(t, 'performance', '')))
                        / 11 AS BIGINT) AS llm_score
            FROM pres
            ORDER BY llm_score DESC, doc_id ASC
            LIMIT 10
        """,
        "bm25_topk": "WITH " + _BM25_CTES + """
            SELECT doc_id, bm25 FROM sc
            ORDER BY bm25 DESC, doc_id ASC LIMIT 10
        """,
        # both cascade stages in SQL: the bm25 CTEs cut top-40 with
        # the package-wide (score desc, id asc) tiebreak, then the
        # stub judge's occurrence count reranks to 10
        "bm25_rerank_cascade": "WITH " + _BM25_CTES + """,
            cands AS (
              SELECT doc_id FROM sc
              ORDER BY bm25 DESC, doc_id ASC LIMIT 40
            )
            SELECT d.doc_id,
                   CAST((length(lower(d.text))
                         - length(replace(lower(d.text), 'spark', ''))) / 5
                      + (length(lower(d.text))
                         - length(replace(lower(d.text), 'join', ''))) / 4
                      + (length(lower(d.text))
                         - length(replace(lower(d.text), 'performance', '')))
                        / 11 AS BIGINT) AS llm_score
            FROM documents d JOIN cands USING (doc_id)
            ORDER BY llm_score DESC, d.doc_id ASC
            LIMIT 10
        """,
        # rrf_fuse_hybrid: the bm25 scoring CTEs verbatim, a length-
        # prior top-20, 1-based ranks per list, fused 1/(60+r) —
        # two terms per id, commutative double sum, round-6 exact
        "rrf_fuse_hybrid": "WITH " + _BM25_CTES + """,
            bm AS (
              SELECT doc_id, bm25 FROM sc
              ORDER BY bm25 DESC, doc_id ASC LIMIT 20
            ),
            ln_prior AS (
              SELECT doc_id, n_chars::DOUBLE AS s FROM documents
              ORDER BY s DESC, doc_id ASC LIMIT 20
            ),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (
                       ORDER BY bm25 DESC, doc_id ASC) AS r
              FROM bm
              UNION ALL
              SELECT doc_id,
                     row_number() OVER (ORDER BY s DESC, doc_id ASC)
              FROM ln_prior
            )
            SELECT doc_id,
                   round(sum(1.0 / (60 + r)), 6) AS rrf
            FROM ranked GROUP BY doc_id
            ORDER BY rrf DESC, doc_id ASC LIMIT 10
        """,
        "ngram_lm_score": r"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(str_split_regex(lower(trim(text)), '\s+'))
                         AS gram
              FROM documents
            ),
            st AS (SELECT gram, count(*) AS c FROM tk GROUP BY gram),
            tot AS (
              SELECT sum(c)::DOUBLE AS t, count(*)::DOUBLE AS v FROM st
            ),
            lp AS (
              SELECT tk.doc_id,
                     ln((coalesce(st.c, 0)::DOUBLE + 0.5)
                        / (tot.t + 0.5 * tot.v)) AS l
              FROM tk LEFT JOIN st USING (gram), tot
            ),
            sc AS (
              SELECT doc_id, round(avg(l), 4) AS lm_score
              FROM lp GROUP BY doc_id
            )
            SELECT d.doc_id, sc.lm_score
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        "ngram_counts": r"""
            WITH t AS (
              SELECT str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            g AS (
              SELECT unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                     ELSE [array_to_string(toks[i + 1 : i + 2], ' ')
                           for i in generate_series(0, len(toks) - 2)]
                     END) AS gram
              FROM t
            )
            SELECT gram, count(*) AS count FROM g
            GROUP BY gram HAVING count(*) >= 5
        """,
        # redact_pii: both sides append the same doc_id-derived PII,
        # then apply the identical Java∩RE2 patterns in the identical
        # order, counting on the progressively-redacted text
        "redact_pii": r"""
            WITH t0 AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id::VARCHAR
                          || '@example.com via http://ex.com/p/'
                          || doc_id::VARCHAR
                          || ' from 10.0.' || (doc_id % 200)::VARCHAR
                          || '.7 call +1415555' || (doc_id % 10)::VARCHAR
                         AS t
              FROM documents
            ),
            s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t, 'https?://\S+')) AS n_url,
                     regexp_replace(t, 'https?://\S+', '<URL>', 'g') AS t
              FROM t0
            ),
            s2 AS (
              SELECT doc_id, n_url,
                     len(regexp_extract_all(t,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                         AS n_email,
                     regexp_replace(t,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g') AS t
              FROM s1
            ),
            s3 AS (
              SELECT doc_id, n_url, n_email,
                     len(regexp_extract_all(t,
                         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
                     regexp_replace(t,
                         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                         '<IP>', 'g') AS t
              FROM s2
            ),
            s4 AS (
              SELECT doc_id, n_url, n_email, n_ip,
                     len(regexp_extract_all(t, '\+\d[\d\- ]{6,}\d'))
                         AS n_phone,
                     regexp_replace(t, '\+\d[\d\- ]{6,}\d', '<PHONE>', 'g')
                         AS t
              FROM s3
            )
            SELECT doc_id, t AS text, n_url, n_email, n_ip, n_phone FROM s4
        """,
        "repetition_profile": rf"""
            WITH {_REPETITION_CTE}
            SELECT doc_id, top_token_frac, dup_2gram_frac, mean_token_len,
                   symbol_ratio
            FROM prof
        """,
        "heuristic_filter": rf"""
            WITH {_REPETITION_CTE}
            SELECT d.* FROM documents d JOIN prof USING (doc_id)
            WHERE prof.n >= 20
              AND prof.top_token_frac <= 0.12
              AND prof.dup_2gram_frac <= 0.05
              AND prof.mean_token_len BETWEEN 2.0 AND 12.0
              AND prof.symbol_ratio <= 0.2
        """,
        # decontaminate: distinct 4-gram sets; a corpus doc sharing
        # ANY gram with the src0 "benchmark" is dropped
        "decontaminate_bench": r"""
            WITH t AS (
              SELECT doc_id, source,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, source, list_distinct([
                  array_to_string(toks[i + 1 : i + 4], ' ')
                  for i in generate_series(0, greatest(len(toks) - 4, 0))
              ]) AS gs
              FROM t
            ),
            bench AS (
              SELECT DISTINCT unnest(gs) AS gram FROM g WHERE source = 'src0'
            ),
            ge AS (
              SELECT doc_id, unnest(gs) AS gram FROM g WHERE source != 'src0'
            ),
            hits AS (SELECT DISTINCT ge.doc_id FROM ge JOIN bench USING (gram))
            SELECT d.* FROM documents d
            WHERE d.source != 'src0'
              AND d.doc_id NOT IN (SELECT doc_id FROM hits)
        """,
        "contamination_report": r"""
            WITH t AS (
              SELECT doc_id, source,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, source, list_distinct([
                  array_to_string(toks[i + 1 : i + 4], ' ')
                  for i in generate_series(0, greatest(len(toks) - 4, 0))
              ]) AS gs
              FROM t
            ),
            bench AS (
              SELECT DISTINCT unnest(gs) AS gram FROM g
              WHERE source = 'src0'
            ),
            ge AS (
              SELECT doc_id, unnest(gs) AS gram FROM g
              WHERE source != 'src0'
            ),
            hits AS (
              SELECT ge.doc_id,
                     count(DISTINCT ge.gram) AS n_contaminated_grams
              FROM ge JOIN bench USING (gram) GROUP BY ge.doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_contaminated_grams, 0)
                       AS n_contaminated_grams,
                   coalesce(h.n_contaminated_grams, 0) > 0
                       AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.source != 'src0'
        """,
        # training_pipeline: the composed curation chain — quality
        # gate → exact dedup → decontaminate vs src0 → hash split
        "training_pipeline": rf"""
            WITH {_REPETITION_CTE},
            kept1 AS (
              SELECT d.* FROM documents d JOIN prof USING (doc_id)
              WHERE prof.n >= 20
                AND prof.top_token_frac <= 0.12
                AND prof.dup_2gram_frac <= 0.05
                AND prof.mean_token_len BETWEEN 2.0 AND 12.0
                AND prof.symbol_ratio <= 0.2
            ),
            kept2 AS (
              SELECT * FROM kept1
              QUALIFY row_number() OVER (
                  PARTITION BY {_NORM_MD5} ORDER BY doc_id) = 1
            ),
            corpus AS (SELECT * FROM kept2 WHERE source != 'src0'),
            tok4 AS (
              SELECT doc_id, source,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents
            ),
            g4 AS (
              SELECT doc_id, source, list_distinct([
                  array_to_string(toks[i + 1 : i + 4], ' ')
                  for i in generate_series(0, greatest(len(toks) - 4, 0))
              ]) AS gs
              FROM tok4
            ),
            bench AS (
              SELECT DISTINCT unnest(gs) AS gram FROM g4
              WHERE source = 'src0'
            ),
            ge AS (
              SELECT g4.doc_id, unnest(g4.gs) AS gram
              FROM g4 JOIN corpus USING (doc_id)
            ),
            hits AS (SELECT DISTINCT ge.doc_id FROM ge JOIN bench USING (gram))
            SELECT doc_id,
                   {_split_case_sql({'train': 0.9, 'test': 0.1}, 'doc_id')}
                       AS split
            FROM corpus
            WHERE doc_id NOT IN (SELECT doc_id FROM hits)
        """,
        # training_pipeline_spans: the same chain with ExactSubstr
        # span removal between the gate and the dedup — dedup/
        # decontamination grams run on the REWRITTEN text, the bench
        # eval grams on the ORIGINAL src0 docs
        "training_pipeline_spans": rf"""
            WITH {_REPETITION_CTE},
            kept1 AS (
              SELECT d.* FROM documents d JOIN prof USING (doc_id)
              WHERE prof.n >= 20
                AND prof.top_token_frac <= 0.12
                AND prof.dup_2gram_frac <= 0.05
                AND prof.mean_token_len BETWEEN 2.0 AND 12.0
                AND prof.symbol_ratio <= 0.2
            ),
            st AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM kept1
            ),
            sg AS (
              SELECT doc_id, u.i AS start,
                     md5(array_to_string(toks[u.i : u.i + 19], ' ')) AS h
              FROM st, unnest(CASE WHEN len(toks) >= 20
                                   THEN range(1, len(toks) - 18)
                                   ELSE range(1, 1) END) AS u(i)
            ),
            sdup AS (SELECT h FROM sg GROUP BY h HAVING count(*) >= 2),
            shit AS (
              SELECT sg.doc_id, sg.start, sg.start + 19 AS e
              FROM sg JOIN sdup USING (h)
            ),
            spe AS (
              SELECT doc_id, start, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_end
              FROM shit
            ),
            sisl AS (
              SELECT doc_id, start, e,
                     sum(CASE WHEN prev_end IS NULL
                              OR start > prev_end + 1
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
              FROM spe
            ),
            sspans AS (
              SELECT doc_id, min(start) AS s, max(e) AS e2
              FROM sisl GROUP BY doc_id, island
            ),
            stok AS (
              SELECT doc_id, toks[u.i] AS tok, u.i AS pos
              FROM st, unnest(range(1, len(toks) + 1)) AS u(i)
            ),
            skept AS (
              SELECT tp.doc_id, tp.pos, tp.tok FROM stok tp
              WHERE NOT EXISTS (
                SELECT 1 FROM sspans s
                WHERE s.doc_id = tp.doc_id
                  AND tp.pos BETWEEN s.s AND s.e2)
            ),
            sagg AS (
              SELECT doc_id,
                     string_agg(tok, ' ' ORDER BY pos) AS text,
                     count(*) AS kept_n
              FROM skept GROUP BY doc_id
            ),
            sclean AS (
              SELECT st.doc_id, st.source,
                     coalesce(a.text, '') AS text,
                     coalesce(a.kept_n, 0) AS n_kept
              FROM st LEFT JOIN sagg a USING (doc_id)
            ),
            gate2 AS (
              SELECT doc_id, source, text FROM sclean WHERE n_kept >= 20
            ),
            kept2 AS (
              SELECT * FROM gate2
              QUALIFY row_number() OVER (
                  PARTITION BY {_NORM_MD5} ORDER BY doc_id) = 1
            ),
            corpus AS (SELECT * FROM kept2 WHERE source != 'src0'),
            tok4 AS (
              SELECT doc_id,
                     str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM corpus
            ),
            g4 AS (
              SELECT doc_id, list_distinct([
                  array_to_string(toks[i + 1 : i + 4], ' ')
                  for i in generate_series(0, greatest(len(toks) - 4, 0))
              ]) AS gs
              FROM tok4
            ),
            btok4 AS (
              SELECT str_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents WHERE source = 'src0'
            ),
            bench AS (
              SELECT DISTINCT unnest(list_distinct([
                  array_to_string(toks[i + 1 : i + 4], ' ')
                  for i in generate_series(0, greatest(len(toks) - 4, 0))
              ])) AS gram
              FROM btok4
            ),
            ge AS (SELECT g4.doc_id, unnest(g4.gs) AS gram FROM g4),
            hits AS (
              SELECT DISTINCT ge.doc_id FROM ge JOIN bench USING (gram)
            )
            SELECT doc_id,
                   {_split_case_sql({'train': 0.9, 'test': 0.1}, 'doc_id')}
                       AS split
            FROM corpus
            WHERE doc_id NOT IN (SELECT doc_id FROM hits)
        """,
        # shuffle_rows: seeded-md5 total order, rank 0-based
        "shuffle_rows_docs": r"""
            SELECT doc_id,
                   (row_number() OVER (
                        ORDER BY md5('42' || chr(31) || doc_id::VARCHAR))
                    - 1)::BIGINT AS shuffle_rank
            FROM documents
        """,
        # write_shards: shard files + manifest read-back must equal
        # the pure recomputation (rank = seeded-md5 order, shard =
        # rank // 64, census = per-shard count/min/max)
        "write_shards_roundtrip": r"""
            WITH ranked AS (
              SELECT doc_id,
                     (row_number() OVER (
                          ORDER BY md5('42' || chr(31) || doc_id::VARCHAR))
                      - 1)::BIGINT AS shuffle_rank
              FROM documents
            ),
            sharded AS (
              SELECT doc_id, shuffle_rank,
                     (shuffle_rank // 64)::BIGINT AS shard
              FROM ranked
            )
            SELECT doc_id, shuffle_rank, shard,
                   count(*) OVER w AS shard_rows,
                   min(shuffle_rank) OVER w AS shard_min_rank,
                   max(shuffle_rank) OVER w AS shard_max_rank
            FROM sharded
            WINDOW w AS (PARTITION BY shard)
        """,
        "take_token_budget": r"""
            WITH t AS (
              SELECT doc_id, n_chars,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(str_split_regex(trim(text), '\s+'))
                     END AS n_tokens
              FROM documents
            ),
            s AS (
              SELECT doc_id, n_chars, n_tokens,
                     sum(n_tokens) OVER (
                         ORDER BY n_chars DESC, doc_id ASC
                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t
            )
            SELECT doc_id, n_chars, n_tokens FROM s WHERE cum <= 1500
        """,
        # chunk_documents: 32-token windows, stride 24, last window
        # clamped; chunk count = 1 if n<=32 else ceil((n-32)/24)+1,
        # written with the integer-division identity
        "chunk_documents": r"""
            WITH t AS (
              SELECT doc_id,
                     str_split_regex(trim(text), '\s+') AS toks,
                     len(str_split_regex(trim(text), '\s+')) AS n
              FROM documents WHERE trim(coalesce(text, '')) <> ''
            ), c AS (
              SELECT doc_id, toks, n,
                     CASE WHEN n <= 32 THEN 1
                          ELSE (n - 32 + 23) // 24 + 1
                     END AS nc
              FROM t
            )
            SELECT doc_id,
                   i - 1 AS chunk_id,
                   array_to_string(
                     toks[(i - 1) * 24 + 1 : (i - 1) * 24 + 32],
                     ' ') AS chunk,
                   least(32, n - (i - 1) * 24)::INT AS n_chunk_tokens
            FROM c, unnest(generate_series(1, nc)) AS g(i)
        """,
        # normalize_text: identical regex strings (Java ∩ RE2 subset)
        "normalize_text": r"""
            SELECT doc_id,
                   lower(trim(regexp_replace(
                     regexp_replace(text,
                       '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F'
                       || '\x{0080}-\x{009F}'
                       || '\x{200B}\x{200C}\x{200D}\x{FEFF}]',
                       '', 'g'),
                     '[\s\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+', ' ', 'g'))) AS norm
            FROM documents
        """,
        "cap_per_source": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents
            ) WHERE rn <= 3
        """,
        # hash_embed: feature hashing — md5 bucket/sign per token,
        # signed counts, L2 normalize, densified via a correlated
        # lookup per (doc, pos)
        "hash_embed": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(str_split_regex(lower(trim(text)), '\s+'))
                         AS t
              FROM documents WHERE trim(coalesce(text, '')) <> ''
            ),
            h AS (
              SELECT doc_id,
                     ('0x' || substr(md5(t), 1, 8))::BIGINT % 16 AS pos,
                     CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2
                               = 0
                          THEN 1.0 ELSE -1.0 END AS sgn
              FROM tok
            ),
            agg AS (
              SELECT doc_id, pos, sum(sgn)::DOUBLE AS v
              FROM h GROUP BY doc_id, pos
            ),
            nrm AS (
              SELECT doc_id, sqrt(sum(v * v)) AS n FROM agg
              GROUP BY doc_id
            ),
            dense AS (
              SELECT d.doc_id, g.i - 1 AS pos,
                     coalesce(
                       (SELECT CASE WHEN nrm.n > 0
                               THEN round(a.v / nrm.n, 6) ELSE 0.0 END
                        FROM agg a, nrm
                        WHERE a.doc_id = d.doc_id
                          AND nrm.doc_id = d.doc_id
                          AND a.pos = g.i - 1),
                       0.0) AS v
              FROM documents d, unnest(generate_series(1, 16)) AS g(i)
            )
            SELECT doc_id, pos, v FROM dense
        """,
        "sentiment_docs": rf"""
            SELECT doc_id,
                   round(CASE WHEN trim(coalesce(text, '')) = '' THEN 0.0 ELSE
                     (len(list_filter(
                        str_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ({_SENT_POS})))
                      - len(list_filter(
                          str_split_regex(lower(trim(text)), '\s+'),
                          t -> t IN ({_SENT_NEG}))))::DOUBLE
                     / len(str_split_regex(trim(text), '\s+'))
                   END, 6) AS sentiment
            FROM documents
        """,
        # extract_entities: rebuild the same seeded tail, run the
        # identical four patterns (Java-regex ∩ RE2), keep duplicate
        # mentions via unnest of each extract_all
        "extract_entities": r"""
            WITH s AS (
              SELECT doc_id,
                     text || ' meet '
                       || CASE doc_id % 3 WHEN 0 THEN 'Alice Smith'
                            WHEN 1 THEN 'Bob Jones'
                            ELSE 'Carol White' END
                       || ' on 2024-'
                       || lpad(((doc_id % 12) + 1)::VARCHAR, 2, '0')
                       || '-'
                       || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                       || ' at https://ex' || doc_id::VARCHAR
                       || '.org for $' || (doc_id % 100)::VARCHAR
                       || '.' || doc_id::VARCHAR AS t
              FROM documents
            )
            SELECT doc_id, 'date' AS entity_type,
                   unnest(regexp_extract_all(t,
                     '\b\d{4}-\d{2}-\d{2}\b')) AS entity FROM s
            UNION ALL
            SELECT doc_id, 'money',
                   unnest(regexp_extract_all(t,
                     '\$\d+(?:\.\d+)?')) FROM s
            UNION ALL
            SELECT doc_id, 'url',
                   unnest(regexp_extract_all(t,
                     'https?://[^\s]+')) FROM s
            UNION ALL
            SELECT doc_id, 'proper',
                   unnest(regexp_extract_all(t,
                     '\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b')) FROM s
        """,
        "assemble_docs": r"""
            SELECT source,
                   string_agg(text, e'\n\n' ORDER BY doc_id) AS text,
                   count(*)::INT AS n_fragments
            FROM documents GROUP BY source
        """,
        # dedup_against_embeddings: probe explosion ≡ a Hamming
        # filter on the 4-bit signatures (bit_count(xor) <= 1), so
        # the oracle states the semantic contract directly
        "dedup_against_embeddings": f"""
            WITH s AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     {_lsh_bucket_sql('embedding::DOUBLE[]')} AS bkt
              FROM embeddings WHERE vec_id % 2 = 0
            ),
            b AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v,
                     {_lsh_bucket_sql('embedding::DOUBLE[]')} AS bkt
              FROM embeddings WHERE vec_id % 2 = 1
            )
            SELECT b.vec_id, b.label FROM b
            WHERE NOT EXISTS (
              SELECT 1 FROM s
              WHERE bit_count(xor(b.bkt, s.bkt)) <= 1
                AND round(list_cosine_similarity(b.v, s.v), 6) >= 0.42
            )
        """,
        # quantized_topk: the full two-tier pipeline in SQL — unit
        # vectors, floor(+0.5) int8 codes for corpus AND query, an
        # integer coarse dot (products ≤ 127²·d stay exact in
        # doubles, so any summation order gives the same integer),
        # coarse top k·rerank, exact float re-rank
        "quantized_topk": """
            WITH q0 AS (
              SELECT embedding::DOUBLE[] AS e FROM embeddings
              WHERE vec_id = 0
            ),
            qn AS (
              SELECT list_transform(e, v -> v /
                       sqrt(list_sum(list_transform(e, x -> x * x))))
                     AS u
              FROM q0
            ),
            qs AS (
              SELECT u, list_max(list_transform(u, v -> abs(v))) / 127.0
                     AS s
              FROM qn
            ),
            qv AS (
              SELECT list_transform(u, v -> greatest(-127, least(127,
                       floor(v / s + 0.5)::INT))) AS qq
              FROM qs
            ),
            cn AS (
              SELECT vec_id, embedding::DOUBLE[] AS ev,
                     list_transform(embedding::DOUBLE[], v -> v /
                       sqrt(list_sum(list_transform(
                         embedding::DOUBLE[], x -> x * x)))) AS u
              FROM embeddings
            ),
            cs AS (
              SELECT vec_id, ev, u,
                     list_max(list_transform(u, v -> abs(v))) / 127.0
                         AS s
              FROM cn
            ),
            cv AS (
              SELECT vec_id, ev, s,
                     list_transform(u, v -> greatest(-127, least(127,
                       floor(v / s + 0.5)::INT))) AS cq
              FROM cs
            ),
            coarse AS (
              SELECT vec_id, ev,
                     list_dot_product(cq::DOUBLE[],
                       (SELECT qq FROM qv)::DOUBLE[]) * s AS c
              FROM cv
              ORDER BY c DESC, vec_id ASC LIMIT 40
            )
            SELECT vec_id,
                   round(list_cosine_similarity(
                     ev, (SELECT e FROM q0)), 6) AS cosine
            FROM coarse
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "shipping_priority": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   round(sum(((l.l_extendedprice * (1.0 - l.l_discount))
                     )::DECIMAL(18,6)), 2)::DOUBLE AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue DESC, o.o_orderkey ASC LIMIT 10
        """,
        # pricing_summary: decimal per-term sums (order-independent),
        # double division only after the exact sum
        "local_supplier_volume": """
            SELECT n_name,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE
                       AS sum_qty,
                   round(sum(l_extendedprice::DECIMAL(18,6)), 2)::DOUBLE
                       AS sum_base_price,
                   round(sum(((l_extendedprice * (1.0 - l_discount))
                     )::DECIMAL(18,6)), 2)::DOUBLE AS sum_disc_price,
                   round(sum(((l_extendedprice * (1.0 - l_discount))
                     * (1.0 + l_tax))::DECIMAL(18,6)), 2)::DOUBLE
                       AS sum_charge,
                   round(sum(l_quantity::DECIMAL(18,6))::DOUBLE
                     / count(*), 6) AS avg_qty,
                   round(sum(l_extendedprice::DECIMAL(18,6))::DOUBLE
                     / count(*), 6) AS avg_price,
                   round(sum(l_discount::DECIMAL(18,6))::DOUBLE
                     / count(*), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "quantize_embeddings": """
            WITH x AS (
              SELECT vec_id, embedding::DOUBLE[] AS e,
                     list_max(list_transform(embedding::DOUBLE[],
                              v -> abs(v))) / 127.0 AS qscale
              FROM embeddings
            ), q AS (
              SELECT vec_id, qscale,
                     CASE WHEN qscale > 0 THEN
                       list_transform(e, v -> greatest(-127, least(127,
                         floor(v / qscale + 0.5)::INT)))
                     ELSE list_transform(e, v -> 0) END AS qvec
              FROM x
            )
            SELECT vec_id, qscale, g.i - 1 AS pos, qvec[g.i] AS qi
            FROM q, unnest(generate_series(1, len(qvec))) AS g(i)
        """,
        "profile_columns": """
            SELECT c.column, s.n_rows, c.n_null, c.n_distinct,
                   c.min_num, c.max_num
            FROM (SELECT count(*) AS n_rows FROM orders) s, (
              SELECT 'o_orderkey' AS column,
                     count(*) - count(o_orderkey) AS n_null,
                     count(DISTINCT o_orderkey) AS n_distinct,
                     min(try_cast(o_orderkey AS DOUBLE)) AS min_num,
                     max(try_cast(o_orderkey AS DOUBLE)) AS max_num
              FROM orders
              UNION ALL
              SELECT 'o_orderstatus',
                     count(*) - count(o_orderstatus),
                     count(DISTINCT o_orderstatus),
                     min(try_cast(o_orderstatus AS DOUBLE)),
                     max(try_cast(o_orderstatus AS DOUBLE))
              FROM orders
              UNION ALL
              SELECT 'o_totalprice',
                     count(*) - count(o_totalprice),
                     count(DISTINCT o_totalprice),
                     min(try_cast(o_totalprice AS DOUBLE)),
                     max(try_cast(o_totalprice AS DOUBLE))
              FROM orders
              UNION ALL
              SELECT 'o_custkey',
                     count(*) - count(o_custkey),
                     count(DISTINCT o_custkey),
                     min(try_cast(o_custkey AS DOUBLE)),
                     max(try_cast(o_custkey AS DOUBLE))
              FROM orders
            ) c
        """,
        "pack_documents": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(str_split_regex(trim(text), '\s+'))
                     END AS n_tokens
              FROM documents
            ),
            s AS (
              SELECT doc_id, n_tokens,
                     (sum(n_tokens) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT
                         AS strt
              FROM t
            )
            SELECT doc_id, n_tokens,
                   (strt // 512)::BIGINT AS bin,
                   (strt % 512)::BIGINT AS offset
            FROM s
        """,
        "rollup_order_revenue": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice::DECIMAL(18,6)), 2)::DOUBLE
                       AS revenue
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "cube_shipping": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_items,
                   round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE
                       AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "pivot_priority_by_status": """
            SELECT o_orderstatus,
                   count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
                   count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
                   count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
                   count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
                       AS p4,
                   count(*) FILTER (o_orderpriority = '5-LOW') AS p5
            FROM orders GROUP BY o_orderstatus
        """,
        "set_ops_custkeys": """
            SELECT o_custkey AS custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_acctbal < 0
        """,
        "unpivot_lineitem_metrics": """
            WITH long AS (
              SELECT l_returnflag, 'l_quantity' AS metric,
                     l_quantity AS value FROM lineitem
              UNION ALL
              SELECT l_returnflag, 'l_extendedprice', l_extendedprice
              FROM lineitem
              UNION ALL
              SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
            )
            SELECT l_returnflag, metric,
                   round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS total
            FROM long GROUP BY l_returnflag, metric
        """,
        "histogram_totalprice": """
            WITH spine AS (
              SELECT unnest(generate_series(0, 9))::BIGINT AS bin
            ), counts AS (
              SELECT least(floor(o_totalprice / 60000.0), 9)::BIGINT AS bin,
                     count(*) AS n
              FROM orders
              WHERE o_totalprice BETWEEN 0.0 AND 600000.0
              GROUP BY 1
            )
            SELECT s.bin,
                   round(s.bin * 60000.0, 6) AS lo,
                   round((s.bin + 1) * 60000.0, 6) AS hi,
                   coalesce(c.n, 0) AS n
            FROM spine s LEFT JOIN counts c USING (bin)
        """,
        "corr_matrix_lineitem": """
            SELECT * FROM (
              SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                     round(corr(l_quantity, l_extendedprice), 4) AS corr
              FROM lineitem
              UNION ALL SELECT 'l_quantity', 'l_discount',
                     round(corr(l_quantity, l_discount), 4) FROM lineitem
              UNION ALL SELECT 'l_quantity', 'l_tax',
                     round(corr(l_quantity, l_tax), 4) FROM lineitem
              UNION ALL SELECT 'l_extendedprice', 'l_discount',
                     round(corr(l_extendedprice, l_discount), 4)
                     FROM lineitem
              UNION ALL SELECT 'l_extendedprice', 'l_tax',
                     round(corr(l_extendedprice, l_tax), 4) FROM lineitem
              UNION ALL SELECT 'l_discount', 'l_tax',
                     round(corr(l_discount, l_tax), 4) FROM lineitem
            )
        """,
        "k_anonymity_customers": """
            SELECT c_nationkey, c_mktsegment, count(*) AS group_size
            FROM customer GROUP BY 1, 2 HAVING count(*) < 8
        """,
        "quality_report_lineitem": """
            WITH wide AS (
              SELECT count(*) AS n_rows,
                sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50,
                                           FALSE) THEN 1 ELSE 0 END)
                    AS qty_range,
                sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0.0 AND 0.08,
                                           FALSE) THEN 1 ELSE 0 END)
                    AS disc_range,
                sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'),
                                           FALSE) THEN 1 ELSE 0 END)
                    AS flag_set,
                sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS key_not_null,
                sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
                         THEN 1 ELSE 0 END) AS price_pos
              FROM lineitem
            ), long AS (
              SELECT 'qty_range' AS rule, qty_range AS violations,
                     n_rows FROM wide
              UNION ALL SELECT 'disc_range', disc_range, n_rows FROM wide
              UNION ALL SELECT 'flag_set', flag_set, n_rows FROM wide
              UNION ALL SELECT 'key_not_null', key_not_null, n_rows FROM wide
              UNION ALL SELECT 'price_pos', price_pos, n_rows FROM wide
            )
            SELECT rule, n_rows, violations::BIGINT AS violations,
                   round((n_rows - violations) / n_rows, 6) AS pass_rate
            FROM long
        """,
        "referential_orphans": """
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_orderkey NOT IN
                  (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
        """,
        "snapshot_diff_orders": """
            WITH o AS (
              SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            ), n AS (
              SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 5 = 0
                          THEN o_totalprice + 1.5
                          ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 7 != 0
            )
            SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                   o.o_orderstatus AS o_orderstatus_old,
                   o.o_totalprice AS o_totalprice_old,
                   n.o_orderstatus AS o_orderstatus_new,
                   n.o_totalprice AS o_totalprice_new,
                   CASE WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN n.o_orderkey IS NULL THEN 'removed'
                        WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                          OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                        THEN 'changed' END AS change
            FROM o FULL OUTER JOIN n USING (o_orderkey)
            WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
                       WHEN n.o_orderkey IS NULL THEN 'removed'
                       WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                         OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                       THEN 'changed' END IS NOT NULL
        """,
        "rolling_user_value": """
            SELECT event_id, user_id, ts,
                   sum(value::DECIMAL(18,6)) OVER w::DECIMAL(18,6)::DOUBLE
                       AS sum_1d,
                   count(*) OVER w AS n_1d
            FROM events
            WINDOW w AS (
              PARTITION BY user_id
              ORDER BY epoch_us(ts::TIMESTAMP)
              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
            )
        """,
        # session_id: CAST(.. AS BIGINT) is load-bearing — DuckDB
        # sum(INTEGER) returns HUGEINT, which the driver's pandas
        # fetch renders as float64 ("3.0" vs Spark's "3") → the r05
        # hash mismatch.  event_id tiebreak on both sides makes the
        # window order deterministic even under ts ties.
        "sessionize_events": """
            SELECT event_id, user_id, ts,
                   CAST(sum(new_sess) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM (
              SELECT event_id, user_id, ts,
                     CASE WHEN lag(epoch_us(ts::TIMESTAMP)) OVER
                              (PARTITION BY user_id ORDER BY ts, event_id)
                              IS NULL
                           OR epoch_us(ts::TIMESTAMP)
                              - lag(epoch_us(ts::TIMESTAMP)) OVER
                                (PARTITION BY user_id
                                 ORDER BY ts, event_id)
                              > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
            )
        """,
        "fuzzy_pairs_part_names": """
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   levenshtein(a.p_name, b.p_name) AS edit_distance
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand
             AND a.p_partkey < b.p_partkey
             AND levenshtein(a.p_name, b.p_name) <= 2
        """,
        "resample_daily_events": """
            WITH dense AS (
              SELECT event_type, date_trunc('day', ts) AS period,
                     count(*) AS n_events, sum(value) AS sum_value
              FROM events GROUP BY 1, 2
            ), spine AS (
              SELECT event_type,
                     unnest(generate_series(min(period), max(period),
                                            INTERVAL 1 DAY)) AS period
              FROM dense GROUP BY event_type
            )
            SELECT s.event_type, s.period,
                   coalesce(d.n_events, 0) AS n_events,
                   round(d.sum_value, 4) AS sum_value
            FROM spine s LEFT JOIN dense d USING (event_type, period)
        """,
        # rolling z-score: the window Σv / Σv² are exact decimal sums
        # in BOTH engines (evaluation-order-free), decoded with the
        # identical fixed-order double formula as detect_anomalies —
        # the doubles match bit-for-bit before the round
        # streaming form: identical flags/scores (stream==batch is
        # the pinned contract), minus the timestamp column
        "stream_anomalies": """
            WITH r AS (
              SELECT user_id, event_id, value,
                     count(CAST(value AS DECIMAL(18,6))) OVER w AS n,
                     CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                          AS DOUBLE) AS s,
                     CAST(sum(CAST(CAST(value AS DECIMAL(18,6))
                                   * CAST(value AS DECIMAL(18,6))
                                   AS DECIMAL(38,12))) OVER w
                          AS DOUBLE) AS ss
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
            ), zc AS (
              SELECT user_id, event_id, value,
                     CASE WHEN n >= 5
                               AND greatest(ss - s * s / CAST(n AS DOUBLE),
                                            0.0)
                                   / (CAST(n AS DOUBLE) - 1.0) > 0
                          THEN round(
                            (CAST(value AS DOUBLE) - s / CAST(n AS DOUBLE))
                            / sqrt(greatest(ss - s * s / CAST(n AS DOUBLE),
                                            0.0)
                                   / (CAST(n AS DOUBLE) - 1.0)), 6)
                     END AS zscore
              FROM r
            )
            SELECT user_id, event_id, value, zscore
            FROM zc WHERE abs(zscore) > 2.5
        """,
        "anomaly_events": """
            WITH r AS (
              SELECT user_id, event_id, ts, value,
                     count(CAST(value AS DECIMAL(18,6))) OVER w AS n,
                     CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                          AS DOUBLE) AS s,
                     CAST(sum(CAST(CAST(value AS DECIMAL(18,6))
                                   * CAST(value AS DECIMAL(18,6))
                                   AS DECIMAL(38,12))) OVER w
                          AS DOUBLE) AS ss
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
            ), zc AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN n >= 5
                               AND greatest(ss - s * s / CAST(n AS DOUBLE),
                                            0.0)
                                   / (CAST(n AS DOUBLE) - 1.0) > 0
                          THEN round(
                            (CAST(value AS DOUBLE) - s / CAST(n AS DOUBLE))
                            / sqrt(greatest(ss - s * s / CAST(n AS DOUBLE),
                                            0.0)
                                   / (CAST(n AS DOUBLE) - 1.0)), 6)
                     END AS zscore
              FROM r
            )
            SELECT user_id, event_id, ts, value, zscore
            FROM zc WHERE abs(zscore) > 2.5
        """,
        "ffill_user_values": """
            SELECT event_id, user_id, ts,
                   round(last_value(CASE WHEN event_id % 2 = 0
                                         THEN value END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING), 4) AS v
            FROM events
        """,
        "top_frequent_priority": """
            SELECT * FROM (
              SELECT o_orderstatus, o_orderpriority AS value,
                     count(*) AS freq,
                     row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY count(*) DESC, o_orderpriority ASC
                     ) AS rank
              FROM orders GROUP BY o_orderstatus, o_orderpriority
            ) WHERE rank <= 3
        """,
        "sem_group_cluster": _sgc_oracle_sql(),
        # approx_distinct_merge: intentionally no oracle — HLL binary
        # state is implementation-specific; see tests/test_sketches.py
        # and the golden finalized-estimate + DuckDB error-band checks
        # in tests/test_sketches.py::test_driver_row_golden_estimates.
        # bpe_tokenize_docs: the PINNED_MERGES table embeds as
        # literals; per distinct word, a recursive CTE replays the
        # greedy lowest-rank-first merge loop EXACTLY as
        # bpe.py::_encode_word does it — each iteration merges the
        # leftmost occurrence of the lowest-rank adjacent pair
        # (ORDER BY rank, i LIMIT 1), stopping when no pair is in the
        # table; per-doc count = sum over words of final symbol count.
        # The whitespace class [ \t\n\r\f\x0b] matches Python
        # re.ASCII \s exactly (RE2's \s omits \x0b).
        "bpe_tokenize_docs": f"""
            WITH RECURSIVE
            merges(ml, mr, rank) AS (VALUES {_bpe_merges_sql()}),
            doc_words AS (
              SELECT doc_id, w, count(*) AS cnt
              FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text),
                              '[ \\t\\n\\r\\f\\x0b]+')) AS w
                FROM documents
              ) WHERE w <> ''
              GROUP BY doc_id, w
            ),
            words AS (SELECT DISTINCT w FROM doc_words),
            enc(w, it, syms) AS (
              SELECT w, 0,
                     list_append(regexp_extract_all(w, '.'), '</w>')
              FROM words
              UNION ALL
              SELECT w, it + 1,
                     syms[1:bi-1] || [syms[bi] || syms[bi+1]]
                                  || syms[bi+2:]
              FROM (
                SELECT e.w, e.it, e.syms,
                       (SELECT i
                        FROM unnest(range(1, len(e.syms))) AS t(i)
                        JOIN merges m
                          ON m.ml = e.syms[i] AND m.mr = e.syms[i+1]
                        ORDER BY m.rank ASC, i ASC LIMIT 1) AS bi
                FROM enc e
              ) WHERE bi IS NOT NULL
            ),
            final_enc AS (
              SELECT w, len(syms) AS n_tok
              FROM enc
              QUALIFY row_number() OVER (
                  PARTITION BY w ORDER BY it DESC) = 1
            )
            SELECT d.doc_id,
                   COALESCE(SUM(dw.cnt * fe.n_tok), 0)::INTEGER
                       AS bpe_n_tokens
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN doc_words dw ON dw.doc_id = d.doc_id
            LEFT JOIN final_enc fe ON fe.w = dw.w
            GROUP BY d.doc_id
        """,
        "grouping_sets_qty": """
            SELECT l_returnflag, l_linestatus,
                   GROUPING_ID(l_returnflag, l_linestatus) AS gid,
                   SUM(l_quantity::DOUBLE) AS sum_l_quantity
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        "monthly_growth": """
            WITH monthly AS (
              SELECT date_trunc('month', o_orderdate)::DATE AS month,
                     round(sum(o_totalprice::DECIMAL(18,6)), 2)::DOUBLE
                         AS revenue
              FROM orders GROUP BY 1
            )
            SELECT month, revenue,
                   round(revenue - lag(revenue) OVER (ORDER BY month), 2)
                       AS delta,
                   ntile(4) OVER (ORDER BY revenue) AS rev_quartile
            FROM monthly
        """,
        "percentile_quantity": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 6) AS p50,
                   round(quantile_cont(l_quantity, 0.9), 6) AS p90
            FROM lineitem GROUP BY l_returnflag
        """,
        "cdc_upsert_customers": """
            SELECT c_custkey, c_name, c_nationkey,
                   CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000
                        ELSE c_acctbal END AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey % 13 <> 0
        """,
        "sql_interface": """
            SELECT source, count(*) AS n
            FROM documents
            WHERE n_chars > 200
              AND (contains(lower(text), 'mentions')
                   OR contains(lower(text), 'window'))
            GROUP BY source
        """,
        "temporal_join_events": """
            WITH hist AS (
              SELECT user_id, value AS purchase_value, ts AS pseq,
                     ts AS valid_from,
                     lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         AS valid_to
              FROM events WHERE event_type = 'purchase'
            )
            SELECT c.event_id, h.purchase_value, h.valid_from,
                   h.valid_to IS NULL AS is_current
            FROM events c JOIN hist h
              ON c.user_id = h.user_id
             AND c.ts >= h.valid_from
             AND (h.valid_to IS NULL OR c.ts < h.valid_to)
            WHERE c.event_type = 'click'
        """,
        "scd2_order_history": """
            SELECT o_custkey, o_totalprice, seq,
                   seq AS valid_from,
                   lead(seq) OVER (PARTITION BY o_custkey ORDER BY seq)
                       AS valid_to,
                   lead(seq) OVER (PARTITION BY o_custkey ORDER BY seq)
                       IS NULL AS is_current
            FROM (SELECT o_custkey, o_totalprice,
                         o_orderkey AS seq FROM orders)
        """,
        "late_shipment_priority": """
            SELECT o_orderpriority, count(*) AS n_late_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY 1
        """,
        "returned_item_revenue": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1997-07-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "supplier_variety": """
            SELECT p_brand,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1
        """,
        "volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1999-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "market_share": """
            SELECT year(o_orderdate) AS o_year,
                   round(
                     CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                                   THEN CAST(l_extendedprice
                                             * (1.0 - l_discount)
                                             AS DECIMAL(18,6))
                                   ELSE CAST(0 AS DECIMAL(18,6)) END)
                          AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(18,6))) AS DOUBLE),
                     6) AS mkt_share
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE o_custkey IN (
              SELECT c_custkey FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA')
            GROUP BY 1
        """,
        # Q6 shape: all three predicates + the decimal sum, 1 row
        "forecast_revenue_delta": """
            SELECT round(sum(CAST(l_extendedprice * l_discount
                                  AS DECIMAL(18,6))), 2)::DOUBLE
                       AS revenue_delta,
                   count(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount >= 0.04 AND l_discount <= 0.06
              AND l_quantity < 24
        """,
        # Q9-adapted: unit cost modeled as 0.6 * p_retailprice (no
        # partsupp in this schema); decimal amount, one final round
        "product_profit": """
            SELECT n_name AS nation,
                   year(o_orderdate) AS o_year,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  - 0.6 * p_retailprice * l_quantity
                                  AS DECIMAL(18,6))), 2)::DOUBLE
                       AS profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        # Q11-adapted: per-part value HAVING > 0.08% of the nation's
        # global value; the share compare is the identical
        # double-vs-double strict > in both engines
        "important_part_stock": """
            WITH val AS (
              SELECT l_partkey,
                     sum(CAST(l_extendedprice * (1.0 - l_discount)
                              AS DECIMAL(18,6))) AS v
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3'
              GROUP BY 1
            )
            SELECT l_partkey,
                   round(v, 2)::DOUBLE AS stock_value
            FROM val
            WHERE CAST(v AS DOUBLE)
                  > 0.0008 * (SELECT CAST(sum(v) AS DOUBLE) FROM val)
        """,
        # Q2-adapted: min-cost supplier per filtered part via the
        # same row_number decorrelation, ties broken by supplier key.
        # The rank key is the UNROUNDED IEEE ratio (identical in both
        # engines); only the projected unit_cost is rounded
        "min_cost_supplier": """
            WITH cost AS (
              SELECT l_partkey, l_suppkey,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                          AS DOUBLE)
                     / CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                            AS DOUBLE) AS _cost
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'LARGE' AND p_size < 15
              GROUP BY 1, 2
            ), ranked AS (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY _cost ASC, l_suppkey ASC) AS rn
              FROM cost
            )
            SELECT l_partkey AS p_partkey, s_name,
                   n_name AS supp_nation,
                   round(_cost, 6) AS unit_cost
            FROM ranked
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE rn = 1
        """,
        # Q14 shape: both sums are exact decimals, the share is the
        # identical (100.0 * promo) / total double expression
        "promo_revenue_share": """
            SELECT date_trunc('month', l_shipdate) AS ship_month,
                   round(
                     100.0
                     * CAST(sum(CASE WHEN p_type = 'PROMO'
                                     THEN CAST(l_extendedprice
                                               * (1.0 - l_discount)
                                               AS DECIMAL(18,6))
                                     ELSE CAST(0 AS DECIMAL(18,6)) END)
                            AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(18,6))) AS DOUBLE),
                     6) AS promo_share,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))), 2)::DOUBLE
                       AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        # Q19 shape: the OR-of-ANDs evaluated post-join, same bands
        "disjunctive_band_revenue": """
            SELECT p_brand,
                   round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))), 2)::DOUBLE
                       AS revenue,
                   count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
            GROUP BY 1
        """,
        # Q20-adapted: window-decorrelated per-part total; the
        # concentration cut is exact decimal (8q > total)
        "dominant_supplier_share": """
            WITH pairs AS (
              SELECT l_partkey, l_suppkey,
                     sum(CAST(l_quantity AS DECIMAL(18,6))) AS _q
              FROM lineitem
              WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%cold%')
              GROUP BY 1, 2
            ), shares AS (
              SELECT l_partkey, l_suppkey, _q,
                     sum(_q) OVER (PARTITION BY l_partkey) AS _tot
              FROM pairs
            )
            SELECT l_partkey AS p_partkey, s_suppkey, s_name,
                   CAST(_q AS DOUBLE) AS supplier_qty,
                   CAST(_tot AS DOUBLE) AS part_total_qty,
                   round(CAST(_q AS DOUBLE) / CAST(_tot AS DOUBLE), 6)
                       AS share
            FROM shares JOIN supplier ON l_suppkey = s_suppkey
            WHERE _q * 8 > _tot
        """,
        "idle_customers": """
            SELECT c_mktsegment, count(*) AS n_custs,
                   round(sum(CAST(c_acctbal AS DECIMAL(38,6))), 2)::DOUBLE
                       AS total_bal
            FROM customer
            WHERE c_acctbal > (
                    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6)))
                                AS DOUBLE) / count(c_acctbal)
                    FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY 1
        """,
        # Q13 shape: outer join + double aggregation (zero-order
        # customers land in the c_count=0 bucket)
        "customer_order_distribution": """
            WITH per_cust AS (
              SELECT c.c_custkey,
                     count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN (SELECT * FROM orders
                         WHERE o_orderpriority <> '1-URGENT') o
                ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey
            )
            SELECT c_count::BIGINT AS c_count,
                   count(*) AS custdist
            FROM per_cust GROUP BY c_count
        """,
        # Q15 shape: revenue view + scalar-max subquery, decimal-exact
        "top_revenue_suppliers": """
            WITH rev AS (
              SELECT l_suppkey,
                     sum(l_extendedprice::DECIMAL(18,6)
                         * (1 - l_discount::DECIMAL(18,6)))
                         AS total_revenue
              FROM lineitem GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   round(r.total_revenue, 2)::DOUBLE AS total_revenue
            FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        # Q17 shape: correlated per-part average, decorrelated and
        # compared in exact arithmetic (5*qty*cnt < sum  ⟺
        # qty < 0.2*avg)
        "small_quantity_revenue": """
            WITH agg AS (
              SELECT l_partkey AS _pk,
                     sum(l_quantity::DECIMAL(18,6)) AS _sq,
                     count(*) AS _cnt
              FROM lineitem GROUP BY l_partkey
            )
            SELECT round(sum(l.l_extendedprice::DECIMAL(18,6))
                    / 7, 2)::DOUBLE AS avg_yearly,
                   count(*) AS n_lines
            FROM lineitem l
            JOIN agg ON l.l_partkey = agg._pk
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE '%blue%'
              AND l.l_quantity::DECIMAL(18,6) * 5 * agg._cnt < agg._sq
        """,
        # Q21 shape (adapted: ship-date blame): EXISTS another
        # supplier in the order + NOT EXISTS another supplier
        # shipping on/after my date, finalized orders only
        "late_supplier_blame": """
            WITH l1 AS (
              SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderstatus = 'F'
            )
            SELECT s.s_suppkey, s.s_name,
                   count(*) AS numwait
            FROM l1
            JOIN supplier s ON l1.l_suppkey = s.s_suppkey
            WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate >= l1.l_shipdate)
            GROUP BY s.s_suppkey, s.s_name
        """,
        "large_volume_orders": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                   o_totalprice,
                   sum_qty::DOUBLE AS sum_qty
            FROM (
              SELECT l_orderkey,
                     sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 300
            ) big
            JOIN orders ON o_orderkey = big.l_orderkey
            JOIN customer ON c_custkey = o_custkey
        """,
        # pagerank_suppliers: the 3 fixed-point iterations unrolled
        # as CTEs — integer multiply / truncating divide is
        # bit-exact in both engines, which is what makes an
        # iterative algorithm hash-matchable at all
        "pagerank_suppliers": """
            WITH e AS (
              SELECT DISTINCT l_suppkey AS src,
                     10000000 + o_custkey AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ),
            v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            p AS (SELECT count(*) AS n FROM v),
            d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
            r0 AS (SELECT node, 1000000000000 // n AS r FROM v, p),
            c1 AS (SELECT e.dst AS node, sum(r0.r // d.deg) AS s
                   FROM e JOIN r0 ON e.src = r0.node
                        JOIN d ON e.src = d.src
                   GROUP BY e.dst),
            r1 AS (SELECT v.node,
                          (15000000000000 // (100 * p.n))
                          + (85 * COALESCE(c1.s, 0)) // 100 AS r
                   FROM v CROSS JOIN p
                   LEFT JOIN c1 ON v.node = c1.node),
            c2 AS (SELECT e.dst AS node, sum(r1.r // d.deg) AS s
                   FROM e JOIN r1 ON e.src = r1.node
                        JOIN d ON e.src = d.src
                   GROUP BY e.dst),
            r2 AS (SELECT v.node,
                          (15000000000000 // (100 * p.n))
                          + (85 * COALESCE(c2.s, 0)) // 100 AS r
                   FROM v CROSS JOIN p
                   LEFT JOIN c2 ON v.node = c2.node),
            c3 AS (SELECT e.dst AS node, sum(r2.r // d.deg) AS s
                   FROM e JOIN r2 ON e.src = r2.node
                        JOIN d ON e.src = d.src
                   GROUP BY e.dst),
            r3 AS (SELECT v.node,
                          (15000000000000 // (100 * p.n))
                          + (85 * COALESCE(c3.s, 0)) // 100 AS r
                   FROM v CROSS JOIN p
                   LEFT JOIN c3 ON v.node = c3.node)
            SELECT node, r::BIGINT AS rank_scaled FROM r3
        """,
        # incremental_orders_agg: the oracle is the SINGLE global
        # aggregate — proving batchwise state maintenance == full
        # recompute, bit-exact (decimal sums, deterministic division)
        "incremental_orders_agg": """
            SELECT o_orderstatus,
                   count(*) AS n,
                   count(o_totalprice) AS o_totalprice_count,
                   round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 6)::DOUBLE
                       AS o_totalprice_sum,
                   round(sum(CAST(o_totalprice AS DECIMAL(38,6)))::DOUBLE
                         / count(o_totalprice), 6) AS o_totalprice_avg,
                   min(o_totalprice) AS o_totalprice_min,
                   max(o_totalprice) AS o_totalprice_max
            FROM orders GROUP BY o_orderstatus
        """,
        # fixed-bin histogram quantiles: the oracle recomputes the
        # global histogram directly — equality with the Spark result
        # (built as TWO batch states merged) is exactly the
        # merge-correctness claim.  Bin/edge math uses the identical
        # operation order as finalize_quantiles, so doubles match
        # bit-for-bit.
        "quantile_state_orders": """
            WITH base AS (
              SELECT o_orderpriority,
                     least(greatest(CAST(floor(
                         (o_totalprice - 0.0) * 64.0 / 600000.0
                     ) AS BIGINT), 0), 63) AS b,
                     o_totalprice AS v
              FROM orders
            ),
            grp AS (
              SELECT o_orderpriority, count(v) AS cnt, max(v) AS mx
              FROM base GROUP BY 1
            ),
            cum AS (
              SELECT o_orderpriority, b,
                     sum(count(*)) OVER (
                       PARTITION BY o_orderpriority ORDER BY b
                     ) AS cum
              FROM base GROUP BY 1, 2
            ),
            pick AS (
              SELECT g.o_orderpriority, g.cnt, g.mx,
                     min(CASE WHEN c.cum >= greatest(ceil(0.5 * g.cnt), 1)
                              THEN c.b END) AS b50,
                     min(CASE WHEN c.cum >= greatest(ceil(0.95 * g.cnt), 1)
                              THEN c.b END) AS b95
              FROM grp g JOIN cum c USING (o_orderpriority)
              GROUP BY 1, 2, 3
            )
            SELECT o_orderpriority, cnt,
                   least(0.0 + (CAST(b50 + 1 AS DOUBLE) * 600000.0) / 64.0,
                         mx) AS q_0_5,
                   least(0.0 + (CAST(b95 + 1 AS DOUBLE) * 600000.0) / 64.0,
                         mx) AS q_0_95
            FROM pick
        """,
        "monthly_revenue": """
            SELECT date_trunc('month', o_orderdate)::DATE AS month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice::DECIMAL(18,6)), 2)::DOUBLE
                       AS revenue
            FROM orders GROUP BY 1
        """,
        # LSH-blocked variant: identical component/keep-lowest logic,
        # but candidate pairs require equal 4-bit signatures (the
        # literal-hyperplane expression matches lsh_assign's UDF)
        "embedding_dedup_lsh": f"""
            WITH RECURSIVE p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE {_lsh_bucket_sql("a.embedding::DOUBLE[]")}
                    = {_lsh_bucket_sql("b.embedding::DOUBLE[]")}
                AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]), 6)
                    >= 0.42
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION ALL SELECT id_b, id_a FROM p
            ),
            cnodes AS (SELECT DISTINCT u FROM edges),
            reach(u, r) AS (
              SELECT u, u FROM cnodes
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
            ),
            cl AS (
              SELECT u AS node, MIN(r) AS cluster_id FROM reach GROUP BY u
            )
            SELECT e.vec_id, e.label
            FROM embeddings e LEFT JOIN cl ON cl.node = e.vec_id
            WHERE e.vec_id = coalesce(cl.cluster_id, e.vec_id)
        """,
        "embedding_dedup": """
            WITH RECURSIVE p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]), 6)
                    >= 0.42
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION ALL SELECT id_b, id_a FROM p
            ),
            cnodes AS (SELECT DISTINCT u FROM edges),
            reach(u, r) AS (
              SELECT u, u FROM cnodes
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
            ),
            cl AS (
              SELECT u AS node, MIN(r) AS cluster_id FROM reach GROUP BY u
            )
            SELECT e.vec_id, e.label
            FROM embeddings e LEFT JOIN cl ON cl.node = e.vec_id
            WHERE e.vec_id = coalesce(cl.cluster_id, e.vec_id)
        """,
        "events_props_agg": """
            SELECT event_type, count(*) AS n,
                   sum((props->>'k')::BIGINT)::BIGINT AS sum_k
            FROM events GROUP BY event_type
        """,
        # funnel_stages: per-user (stage, reached_ts) — the stage
        # CTEs mirror funnel's strict-after chaining on epoch-second
        # doubles; each user reports their deepest stage
        "funnel_stages": """
            WITH s1 AS (
              SELECT user_id, min(epoch(ts)) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
              JOIN s1 ON e.user_id = s1.user_id
                     AND epoch(e.ts) > s1.t
              WHERE e.event_type = 'click' GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
              JOIN s2 ON e.user_id = s2.user_id
                     AND epoch(e.ts) > s2.t
              WHERE e.event_type = 'purchase' GROUP BY e.user_id
            )
            SELECT user_id, 3 AS stage, t AS reached_ts FROM s3
            UNION ALL
            SELECT user_id, 2, t FROM s2
            WHERE user_id NOT IN (SELECT user_id FROM s3)
            UNION ALL
            SELECT user_id, 1, t FROM s1
            WHERE user_id NOT IN (SELECT user_id FROM s2)
        """,
        "funnel_events": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
              WHERE e.event_type = 'click' GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
              WHERE e.event_type = 'purchase' GROUP BY e.user_id
            )
            SELECT 1 AS step, 'view' AS name,
                   (SELECT count(*) FROM s1) AS users
            UNION ALL
            SELECT 2, 'click', (SELECT count(*) FROM s2)
            UNION ALL
            SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        """,
        "cohort_retention": """
            WITH b AS (
              SELECT DISTINCT user_id, ts::DATE AS d FROM events
            ),
            f AS (SELECT user_id, min(d) AS first_d FROM b GROUP BY user_id)
            SELECT f.first_d AS cohort,
                   (b.d - f.first_d) AS offset,
                   count(DISTINCT b.user_id) AS users
            FROM b JOIN f ON b.user_id = f.user_id
            GROUP BY 1, 2
        """,
        "windowed_agg": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                       AS window_end,
                   event_type,
                   count(*) AS count,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "session_agg": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts)
                              > INTERVAL '5 minutes'
                          OR lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events
            ),
            sessions AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (
                         PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT min(ts) AS session_start,
                   max(ts) + INTERVAL '5 minutes' AS session_end,
                   user_id, count(*) AS count
            FROM sessions GROUP BY user_id, sid
        """,
        "nl_filter_pipeline": """
            SELECT * FROM documents
            WHERE (contains(lower(text), 'mentions')
                   OR contains(lower(text), 'spark')
                   OR contains(lower(text), 'text'))
              AND coalesce(try_cast(n_chars AS DOUBLE) > 200, false)
        """,
        "roll_up_events": """
            SELECT event_type, count(*) AS count_of_event_type
            FROM events GROUP BY event_type
        """,
        "engine_lifecycle": """
            SELECT * FROM documents
            WHERE contains(lower(text), 'mentions')
               OR contains(lower(text), 'spark')
               OR contains(lower(text), 'text')
        """,
        # engine_star_lifecycle: the same slice-cascade stub
        # semantics as engine_lifecycle, over the broadcast-
        # denormalized orders⋈customer frame (dim join key dropped)
        "engine_star_lifecycle": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE contains(lower(c_mktsegment), 'mentions')
               OR contains(lower(c_mktsegment), 'building')
        """,
        "sem_filter_negated":
            "SELECT * FROM documents WHERE NOT contains(lower(text), 'spark')",
        # sem_join stub rule: ALL significant right-row tokens are
        # substrings of the left content ('quorum' matches no doc)
        "sem_join_topics": """
            SELECT d.doc_id, t.topic
            FROM documents d
            JOIN (VALUES ('spark'), ('scan window'), ('quorum')) t(topic)
              ON ((t.topic = 'spark'
                     AND contains(lower(d.text), 'spark'))
                  OR (t.topic = 'scan window'
                     AND contains(lower(d.text), 'scan')
                     AND contains(lower(d.text), 'window'))
                  OR (t.topic = 'quorum'
                     AND contains(lower(d.text), 'quorum')))
        """,
        # drill_down = sem_map over all node columns; doc_id digits
        # can't contain the vocabulary words, so only text decides
        "drill_down_topic": """
            SELECT doc_id,
                   CASE WHEN contains(lower(text), 'vector') THEN 'vector'
                        WHEN contains(lower(text), 'stream') THEN 'stream'
                        WHEN contains(lower(text), 'window') THEN 'window'
                        ELSE 'NA' END AS topic
            FROM documents
        """,
        "topk_dispatch_num":
            "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 10",
        "dimension_catalog": """
            SELECT * FROM (VALUES
                ('event_id', ''),
                ('event_type', 'event_type; evt_class'),
                ('props', ''),
                ('ts', ''),
                ('user_id', ''),
                ('value', '')
            ) AS t(dimension, granularities)
        """,
    }


def oracle_sql() -> dict[str, str]:
    o = _oracle_sql_literal()
    for twin, default in _STRATEGY_TWINS.items():
        o[twin] = o[default]
    return o


_STRATEGY_TWINS = {
    "jaccard_pairs_prefix": "jaccard_pairs",
    "cosine_pairs_expr": "cosine_pairs",
    "dedup_against_embeddings_expr": "dedup_against_embeddings",
    "dedup_clusters_distributed": "dedup_clusters",
    "pagerank_suppliers_distributed": "pagerank_suppliers",
}
