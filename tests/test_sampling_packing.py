"""Deterministic sampling/splitting + sequence packing.

The properties that justify these operators' existence are the ones
asserted here: results are pure functions of the data (stable under
repartitioning and reruns), splits are disjoint + exhaustive with
key-consistent membership, sampled fractions land near their
Bernoulli expectation, and packing's two-phase prefix sum equals the
sequential layout exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.packing import pack_documents
from semantic_olap_spark.functions.sampling import (
    hash_sample,
    leakage_safe_split,
    quantile_filter,
    reservoir_sample,
    stratified_sample,
    train_test_split,
    uniform_hash,
)


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = sorted(
        r.doc_id for r in hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(13), 0.3, "doc_id")
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_fraction_near_expectation(docs):
    n = docs.count()
    got = hash_sample(docs, 0.3, "doc_id").count()
    # binomial(500, 0.3): sd ≈ 10; allow 4 sd
    assert abs(got - 0.3 * n) < 4 * (0.3 * 0.7 * n) ** 0.5


def test_hash_sample_monotone_in_fraction(docs):
    small = {r.doc_id for r in hash_sample(docs, 0.2, "doc_id").collect()}
    large = {r.doc_id for r in hash_sample(docs, 0.5, "doc_id").collect()}
    assert small <= large


def test_hash_sample_stable_under_corpus_growth(docs):
    # rows sampled from a subset stay sampled in the full corpus
    sub = docs.filter(F.col("doc_id") < 200)
    sampled_sub = {r.doc_id for r in hash_sample(sub, 0.4, "doc_id").collect()}
    sampled_full = {
        r.doc_id
        for r in hash_sample(docs, 0.4, "doc_id").collect()
        if r.doc_id < 200
    }
    assert sampled_sub == sampled_full


def test_uniform_hash_range(docs):
    row = docs.select(
        F.min(uniform_hash(F.col("doc_id"))).alias("lo"),
        F.max(uniform_hash(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0


def test_stratified_sample_respects_per_stratum_fractions(docs):
    # keep all of src1, half of src2, drop src3 explicitly; unlisted
    # strata fall to default_fraction=0.0
    frac = {"src1": 1.0, "src2": 0.5, "src3": 0.0}
    out = stratified_sample(docs, "source", frac, "doc_id")
    got = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    base = {
        r.source: r.cnt
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(got) <= {"src1", "src2"}
    assert got["src1"] == base["src1"]
    n = base["src2"]
    assert abs(got.get("src2", 0) - 0.5 * n) < 4 * (0.25 * n) ** 0.5


def test_train_test_split_disjoint_exhaustive_and_seed_stable(docs):
    out = train_test_split(
        docs, {"train": 0.8, "test": 0.1, "val": 0.1}, "doc_id"
    )
    counts = {
        r.split: r.cnt
        for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert sum(counts.values()) == docs.count()  # exhaustive, one label each
    assert counts["train"] > counts["test"] and counts["train"] > counts["val"]
    again = train_test_split(
        docs.repartition(7), {"train": 0.8, "test": 0.1, "val": 0.1}, "doc_id"
    )
    a = sorted((r.doc_id, r.split) for r in out.select("doc_id", "split").collect())
    b = sorted((r.doc_id, r.split) for r in again.select("doc_id", "split").collect())
    assert a == b


def test_train_test_split_equal_keys_same_split(spark):
    df = spark.createDataFrame(
        [(i % 10, i) for i in range(100)], "key int, row int"
    )
    out = train_test_split(df, {"a": 0.5, "b": 0.5}, "key")
    per_key = (
        out.groupBy("key")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in per_key)


def test_leakage_safe_split_keeps_clusters_together(spark):
    # 0-1-2 form one near-dup cluster via pairs; 3..9 are singletons
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id int")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a int, id_b int")
    out = leakage_safe_split(df, pairs, {"train": 0.5, "test": 0.5})
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 10
    assert got[0] == got[1] == got[2]  # whole cluster in one split


def test_leakage_safe_split_matches_plain_split_for_singletons(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id int")
    pairs = spark.createDataFrame([], "id_a int, id_b int")
    a = {
        r.doc_id: r.split
        for r in leakage_safe_split(
            df, pairs, {"train": 0.8, "test": 0.2}
        ).collect()
    }
    b = {
        r.doc_id: r.split
        for r in train_test_split(df, {"train": 0.8, "test": 0.2}, "doc_id").collect()
    }
    assert a == b


def test_quantile_filter_top_fraction(tables):
    orders = tables["orders"]
    n = orders.count()
    kept = quantile_filter(orders, "o_totalprice", 0.1, keep="top")
    k = kept.count()
    # exact interpolated threshold keeps ~q*n rows (±1 on ties)
    assert abs(k - 0.1 * n) <= max(2, 0.01 * n)
    # every kept row beats every dropped row
    thr = kept.agg(F.min(F.col("o_totalprice"))).collect()[0][0]
    dropped_max = (
        orders.join(kept.select("o_orderkey"), "o_orderkey", "left_anti")
        .agg(F.max("o_totalprice"))
        .collect()[0][0]
    )
    assert dropped_max <= thr


def test_quantile_filter_bottom_and_approx(tables):
    orders = tables["orders"]
    bot = quantile_filter(orders, "o_totalprice", 0.2, keep="bottom").count()
    n = orders.count()
    assert abs(bot - 0.2 * n) <= max(2, 0.01 * n)
    approx = quantile_filter(
        orders, "o_totalprice", 0.1, keep="top", exact=False
    ).count()
    assert abs(approx - 0.1 * n) <= 0.05 * n  # sketch-accuracy bound


def test_quantile_filter_validates_args(tables):
    with pytest.raises(ValueError):
        quantile_filter(tables["orders"], "o_totalprice", 0.0)
    with pytest.raises(ValueError):
        quantile_filter(tables["orders"], "o_totalprice", 0.5, keep="middle")


def test_dedup_against_drops_seen_and_only_seen(docs, spark):
    from semantic_olap_spark.functions.dedup import dedup_against

    seen = docs.filter(F.col("source") == "src1")
    out = dedup_against(docs, seen)
    seen_texts = {
        r.t for r in seen.selectExpr(
            "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS t"
        ).collect()
    }
    kept_texts = {
        r.t for r in out.selectExpr(
            "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS t"
        ).collect()
    }
    assert not (kept_texts & seen_texts)
    # rows dropped are exactly those whose normalized text is seen
    dropped = docs.count() - out.count()
    should_drop = docs.selectExpr(
        "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS t"
    ).filter(F.col("t").isin(list(seen_texts))).count()
    assert dropped == should_drop


def test_profile_columns_values(tables, spark):
    from semantic_olap_spark.functions.profiling import profile_columns

    orders = tables["orders"]
    out = {
        r.column: r
        for r in profile_columns(
            orders, ["o_orderkey", "o_orderstatus"]
        ).collect()
    }
    n = orders.count()
    assert out["o_orderkey"].n_rows == n
    assert out["o_orderkey"].n_null == 0
    assert out["o_orderkey"].n_distinct == n  # primary key
    assert out["o_orderkey"].min_num == float(
        orders.agg(F.min("o_orderkey")).collect()[0][0]
    )
    assert out["o_orderstatus"].min_num is None  # non-numeric
    assert out["o_orderstatus"].n_distinct == 3


def test_profile_columns_approx_mode_runs(tables):
    from semantic_olap_spark.functions.profiling import profile_columns

    out = profile_columns(
        tables["orders"], ["o_orderkey"], approx_distinct=True
    ).collect()
    n = tables["orders"].count()
    assert abs(out[0].n_distinct - n) < 0.1 * n


def test_reservoir_sample_exact_n_and_deterministic(docs):
    a = reservoir_sample(docs, 25, "doc_id").select("doc_id").collect()
    b = reservoir_sample(docs.repartition(11), 25, "doc_id").select(
        "doc_id"
    ).collect()
    assert len(a) == 25
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_hash_sample_plan_pruned_scan_no_shuffle(docs):
    plan = (
        hash_sample(docs, 0.3, "doc_id")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<doc_id:bigint>" in plan  # column pruning
    assert "Exchange" not in plan  # scan-side filter, zero shuffle


def test_quantile_filter_plan_broadcasts_threshold(tables):
    plan = (
        quantile_filter(tables["orders"], "o_totalprice", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # threshold is a broadcast 1-row frame, never a shuffled join
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_reservoir_no_global_shuffle(docs):
    plan = reservoir_sample(docs, 10, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pack_documents_matches_sequential_layout(docs):
    out = pack_documents(docs, budget=512, order_col="doc_id").select(
        "doc_id", "n_tokens", "bin", "offset"
    )
    rows = {r.doc_id: r for r in out.collect()}
    # sequential reference layout
    seq = sorted(
        (r.doc_id, r.n_tokens)
        for r in out.select("doc_id", "n_tokens").collect()
    )
    pos = 0
    for doc_id, n in seq:
        r = rows[doc_id]
        assert (r.bin, r.offset) == (pos // 512, pos % 512), doc_id
        pos += n
    assert pos == sum(n for _, n in seq)


def test_pack_documents_no_single_partition_exchange(docs):
    plan = (
        pack_documents(docs, budget=512, order_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pipeline_ops_in_plan_language(docs, spark):
    # SURVEY §7.1 M7: pipeline operators are plan-language operators —
    # splice sampling/dedup steps between ordinary filter steps
    from semantic_olap_spark.plans.executor import PlanExecutor

    ex = PlanExecutor()
    out = ex.execute(
        docs,
        [
            {"operator": "keyword_filter",
             "params": {"columns": ["text"], "keywords": ["spark"]}},
            {"operator": "hash_sample",
             "params": {"fraction": 0.5, "key_col": "doc_id"}},
            {"operator": "train_test_split",
             "params": {"weights": {"train": 0.8, "test": 0.2},
                        "key_col": "doc_id"}},
        ],
    )
    direct = train_test_split(
        hash_sample(
            docs.filter(F.lower(F.col("text")).contains("spark")),
            0.5,
            "doc_id",
        ),
        {"train": 0.8, "test": 0.2},
        "doc_id",
    )
    got = sorted((r.doc_id, r.split) for r in out.select("doc_id", "split").collect())
    want = sorted(
        (r.doc_id, r.split) for r in direct.select("doc_id", "split").collect()
    )
    assert got == want and len(got) > 0
    assert [s["operator_name"] for s in ex.lineage] == [
        "keyword_filter", "hash_sample", "train_test_split",
    ]


def test_dedup_near_plan_step(docs):
    from semantic_olap_spark.plans.executor import PlanExecutor

    out = PlanExecutor().execute(
        docs,
        [{"operator": "dedup_near",
          "params": {"threshold": 0.7, "num_hashes": 16, "bands": 4}}],
    )
    assert out.columns == docs.columns  # original schema survives
    assert 0 < out.count() <= docs.count()


def test_pipeline_plan_step_missing_param_raises(docs):
    from semantic_olap_spark.plans.executor import PlanExecutor

    with pytest.raises(ValueError, match="requires"):
        PlanExecutor().execute_step(
            docs, {"operator": "hash_sample", "params": {"fraction": 0.5}}
        )


def test_pack_documents_existing_token_col(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id int, n_tok int"
    )
    out = pack_documents(df, budget=250, order_col="doc_id", token_col="n_tok")
    got = {r.doc_id: (r.bin, r.offset) for r in out.collect()}
    # 100-token docs into 250-token bins: starts 0,100,200,300,...
    assert got[0] == (0, 0) and got[1] == (0, 100) and got[2] == (0, 200)
    assert got[3] == (1, 50)


def test_mix_corpus_proportions_and_binding_stratum(spark):
    from semantic_olap_spark.functions.sampling import mix_corpus

    rows = (
        [(i, "a") for i in range(100)]
        + [(i + 100, "b") for i in range(400)]
        + [(i + 500, "c") for i in range(50)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    # target 1:1 over a,b → binding stratum is a (100 rows):
    # T = 200, a keeps all 100, b keeps ~100 of 400, c dropped
    out = mix_corpus(df, "src", {"a": 0.5, "b": 0.5}, "doc_id")
    got = {r["src"]: r["n"] for r in
           out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got.get("a") == 100
    assert "c" not in got
    assert 70 <= got.get("b", 0) <= 130  # Bernoulli(0.25) of 400

    # determinism: rerun on repartitioned input → identical rows
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in mix_corpus(
            df.repartition(7), "src", {"a": 0.5, "b": 0.5}, "doc_id"
        ).collect()
    }
    assert ids1 == ids2


def test_mix_corpus_edge_cases(spark):
    from semantic_olap_spark.functions.sampling import mix_corpus

    df = spark.createDataFrame([(1, "a")], ["doc_id", "src"])
    # no weighted stratum present in the data → empty result
    assert mix_corpus(df, "src", {"zz": 1.0}, "doc_id").count() == 0
    with pytest.raises(ValueError, match="positive"):
        mix_corpus(df, "src", {"a": 0.0}, "doc_id")


def _py_uniform(key, seed=42):
    import hashlib

    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


@pytest.mark.parametrize("pyseed,n_rows,budget", [(1, 57, 100), (2, 200, 777)])
def test_take_token_budget_matches_sequential_reference(
    spark, pyseed, n_rows, budget
):
    import random

    from semantic_olap_spark.functions.cleaning import take_token_budget

    rng = random.Random(pyseed)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(1, 9))),
         rng.randint(0, 5))
        for i in range(n_rows)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "score"])
    got = {r["doc_id"] for r in take_token_budget(
        df.repartition(7), budget, score_col="score"
    ).collect()}
    # sequential greedy reference: (score desc, id asc), inclusive cumsum
    want, cum = set(), 0
    for i, text, score in sorted(rows, key=lambda r: (-r[2], r[0])):
        cum += len(text.split())
        if cum > budget:
            break
        want.add(i)
    assert got == want


@pytest.mark.parametrize("pyseed", [3, 4])
def test_mix_corpus_matches_hash_reference(spark, pyseed):
    import random

    from semantic_olap_spark.functions.sampling import mix_corpus

    rng = random.Random(pyseed)
    strata = {"a": rng.randint(20, 60), "b": rng.randint(100, 300),
              "c": rng.randint(5, 15)}
    rows, i = [], 0
    for s, n in strata.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    weights = {"a": 0.5, "b": 0.5}
    got = {r["doc_id"] for r in mix_corpus(
        df.repartition(5), "src", weights, "doc_id"
    ).collect()}
    # python reference: same fraction arithmetic + same md5 uniform
    total_w = sum(weights.values())
    t_max = min(strata[s] / (w / total_w) for s, w in weights.items())
    frac = {s: min(1.0, t_max * (w / total_w) / strata[s])
            for s, w in weights.items()}
    want = {i for i, s in rows if s in frac and _py_uniform(i) < frac[s]}
    assert got == want


def test_mix_corpus_non_string_weight_keys(spark):
    from semantic_olap_spark.functions.sampling import mix_corpus

    df = spark.createDataFrame(
        [(i, 2023 + (i % 2)) for i in range(40)], ["doc_id", "year"]
    )
    out = mix_corpus(df, "year", {2023: 0.5, 2024: 0.5}, "doc_id")
    assert out.count() > 0  # int keys match the stringified strata


def test_curation_chain_plan_steps(docs):
    # the round-3 ops compose in the plan language too: normalize →
    # chunk → per-source cap → sentiment column
    from semantic_olap_spark.plans.executor import PlanExecutor

    ex = PlanExecutor()
    out = ex.execute(
        docs,
        [
            {"operator": "normalize_text", "params": {}},
            {"operator": "cap_per_group",
             "params": {"group_col": "source", "cap": 5,
                        "order_col": "n_chars"}},
            {"operator": "chunk_documents",
             "params": {"size": 32, "overlap": 8}},
            {"operator": "sentiment",
             "params": {"text_col": "chunk"}},
        ],
    )
    assert "chunk_id" in out.columns and "sentiment" in out.columns
    per_src = out.select("source", "doc_id").distinct() \
        .groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_src)
    vals = out.select("sentiment").distinct().collect()
    assert all(-1.0 <= r["sentiment"] <= 1.0 for r in vals)
    with __import__("pytest").raises(ValueError):
        PlanExecutor().execute(
            docs, [{"operator": "chunk_documents", "params": {}}]
        )
