"""Round-9 review fixes (ADVICE r8), each pinned by a regression test.

1. engine.run(materialize=True) with an analysis query persists and
   materializes the FINAL result inside cache_scope — the caller's
   first action no longer recomputes LLM judge stages after the
   operator-internal persists were released (the docstring's "never
   forces an LLM-stage recompute" claim now holds on the analysis
   path, not just the filter path).
2. The matmul pre-collect guards (cosine_pairs,
   dedup_against_embeddings) fall back to an exact non-null count
   before refusing: a null-heavy corpus that genuinely fits is no
   longer spuriously rejected by the row-count upper bound.
3. replay_contract's targeted --golden-write prunes hashes for
   queries removed from the registry instead of letting stale keys
   linger.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.caching import release_caches
from semantic_olap_spark.llm.client import CountingLLM, StubLLM


def _emb(spark, n=24, dim=8):
    rows = [
        (i, i % 3, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


# ---- 1. analysis result materialized inside the scope -------------------


def test_engine_analysis_result_no_llm_recompute(spark, tables):
    """After run() returns, acting on the result must spend ZERO
    additional LLM calls — the analysis path's judge stages ran once
    inside the scope and the returned frame reads its own cache."""
    from semantic_olap_spark.engine import OlapEngine

    release_caches()
    acc = spark.sparkContext.accumulator(0)
    factory = lambda: CountingLLM(StubLLM(), acc)  # noqa: E731
    eng = OlapEngine(
        tables["documents"], llm_factory=factory, order_by=["doc_id"]
    )
    out = eng.run(
        "mentions spark then group lang into lang_family and count "
        "and show the top 1 lang_family"
    )
    # flush pending accumulator deltas with one action, then pin
    rows1 = out.collect()
    spent = acc.value
    assert spent > 0  # the query really routed through LLM stages
    rows2 = out.collect()
    rows3 = out.collect()
    assert acc.value == spent, (
        f"post-run actions recomputed LLM stages: {acc.value - spent} "
        "extra calls"
    )
    assert rows1 == rows2 == rows3
    # the materialized result is registered with the global release
    # hook — a months-long session can still free it
    assert release_caches() >= 1


def test_engine_lazy_mode_unchanged(tables):
    """materialize=False keeps the fully-lazy contract: same rows,
    nothing persisted by run() itself beyond tracked internals."""
    from semantic_olap_spark.engine import OlapEngine

    release_caches()
    q = (
        "mentions spark then group lang into lang_family and count "
        "and show the top 1 lang_family"
    )
    eager = OlapEngine(tables["documents"], order_by=["doc_id"]).run(q)
    lazy = OlapEngine(tables["documents"], order_by=["doc_id"]).run(
        q, materialize=False
    )
    assert sorted(map(tuple, eager.collect())) == sorted(
        map(tuple, lazy.collect())
    )
    release_caches()


# ---- 2. null-heavy corpora pass the guard via exact count ----------------


def test_cosine_pairs_null_heavy_corpus_not_over_rejected(spark):
    """Row-count upper bound trips, exact non-null count fits: the
    call must succeed (r8 would raise here) and match the expr path."""
    from semantic_olap_spark.functions.similarity import cosine_pairs

    emb = _emb(spark, n=12)
    nulls = spark.createDataFrame(
        [(1000 + i, 0, None) for i in range(3000)],
        "vec_id long, label int, embedding array<double>",
    )
    df = emb.unionByName(nulls)
    # budget sized between the bounds: 3012 rows × 8 dim × 8 B ≈
    # 0.18 MiB (upper bound) vs 12 × 64 B < 0.001 MiB (exact)
    budget_mb = 0.01
    got = cosine_pairs(
        df, threshold=0.5, block_col="label", strategy="matmul",
        max_broadcast_mb=budget_mb
    )
    want = cosine_pairs(emb, threshold=0.5, block_col="label",
                        strategy="expr")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_cosine_pairs_guard_still_trips_when_truly_oversized(spark):
    from semantic_olap_spark.functions.similarity import cosine_pairs

    with pytest.raises(ValueError, match="pre-collect"):
        cosine_pairs(
            _emb(spark), threshold=0.5, block_col="label", strategy="matmul",
            max_broadcast_mb=0,
        )


def test_dedup_against_null_heavy_seen_not_over_rejected(spark):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = _emb(spark, n=12)
    nulls = spark.createDataFrame(
        [(1000 + i, 0, None) for i in range(3000)],
        "vec_id long, label int, embedding array<double>",
    )
    seen = emb.filter("vec_id % 2 = 0").unionByName(nulls)
    batch = emb.filter("vec_id % 2 = 1")
    got = dedup_against_embeddings(
        batch, seen, threshold=0.4, nbits=4, strategy="matmul",
        max_broadcast_mb=0.01,
    )
    want = dedup_against_embeddings(
        batch, emb.filter("vec_id % 2 = 0"), threshold=0.4, nbits=4,
        strategy="expr",
    )
    assert sorted(r["vec_id"] for r in got.collect()) == sorted(
        r["vec_id"] for r in want.collect()
    )


# ---- 3. golden-write prunes stale registry keys ---------------------------


def test_merge_golden_prunes_stale_keys():
    from tools.replay_contract import merge_golden

    existing = {"kept": "h1", "renamed_old": "h2", "updated": "h3"}
    new_hashes = {"updated": "h3b", "added": "h4"}
    registry = ["kept", "updated", "added", "never_run"]
    merged, stale = merge_golden(existing, new_hashes, registry)
    assert merged == {"kept": "h1", "updated": "h3b", "added": "h4"}
    assert stale == ["renamed_old"]
