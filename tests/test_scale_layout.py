"""Deploy-time layout checks: bucketed joins + partition pruning.

These pin the two SCALE.md claims that depend on write-time layout:
bucketed tables join without an Exchange, and an IVF-partitioned
corpus probe prunes partitions at the scan.
"""

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.similarity import (
    ivf_assign,
    train_ivf_centroids,
)
from semantic_olap_spark.sources.bucketing import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tables, tmp_path):
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "-1"
    )  # force a non-broadcast join so the Exchange would show
    try:
        write_bucketed(
            tables["orders"].select("o_orderkey", "o_totalprice"),
            "b_orders", "o_orderkey", buckets=8, sort_by="o_orderkey",
        )
        write_bucketed(
            tables["lineitem"].select("l_orderkey", "l_quantity"),
            "b_lineitem", "l_orderkey", buckets=8, sort_by="l_orderkey",
        )
        joined = read_table(spark, "b_lineitem").join(
            read_table(spark, "b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # sanity: result matches the unbucketed join
        n = tables["lineitem"].join(
            tables["orders"],
            tables["lineitem"]["l_orderkey"] == tables["orders"]["o_orderkey"],
        ).count()
        assert joined.count() == n
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_partitioned_corpus_prunes_scan(spark, tables, tmp_path):
    emb = tables["embeddings"]
    cent = train_ivf_centroids(emb, n_centroids=4, sample_n=256)
    path = str(tmp_path / "ivf_corpus")
    ivf_assign(emb, cent).write.partitionBy("_ivf").parquet(path)
    corpus = spark.read.parquet(path)
    probe = corpus.filter(F.col("_ivf").isin([0, 1]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # partition filters reach the scan → untouched cells never read
    assert "_ivf" in plan.split("PartitionFilters")[1].split("]")[0]
    total = corpus.count()
    probed = probe.count()
    assert 0 < probed < total


def test_cleaning_ops_plan_shapes(spark, tables):
    """Pin the 100 TB postures of the corpus-cleaning operators.

    - decontaminate: benchmark side broadcasts (no corpus shuffle)
    - take_token_budget: the prefix sum never funnels through a
      single-partition Exchange (two-phase construction)
    - heuristic_filter / redact_pii: zero Exchanges (pure scan-side)
    """
    from semantic_olap_spark.functions.cleaning import (
        decontaminate,
        heuristic_filter,
        redact_pii,
        take_token_budget,
    )

    docs = tables["documents"]

    dec = decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=4,
    )
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    tb = take_token_budget(docs, budget=1500, score_col="n_chars")
    plan = tb._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    for df in (heuristic_filter(docs), redact_pii(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_retrieval_and_funnel_plan_shapes(spark, tables):
    """bm25 ends in TakeOrderedAndProject (k rows per partition to
    the driver merge); funnel's per-stage joins never blow past the
    stage count."""
    from semantic_olap_spark.functions.analytics import funnel
    from semantic_olap_spark.functions.text import bm25_topk

    plan = (
        bm25_topk(tables["documents"], "spark join", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan

    fplan = (
        funnel(tables["events"], ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # k-1 = 2 inter-stage joins; a blowup (cross/nested-loop) would fail
    assert "CartesianProduct" not in fplan
    assert "BroadcastNestedLoopJoin" not in fplan
