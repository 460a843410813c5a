"""sem_topk embedding prescreen: same selection, far fewer LLM calls.

Data design makes the parity claim exact: k 'relevant' docs carry
strictly decreasing counts of the query tokens and everyone else
carries none, so under the stub judge every relevant doc beats every
irrelevant doc it meets.  With n_opponents m > k-1, relevant docs
earn > m wins while irrelevant docs earn ≤ m — the selected top-k
set is the relevant docs in BOTH the full tournament and the
prescreened one (win counts differ; the set does not).
"""

from __future__ import annotations

import pytest

from semantic_olap_spark.llm.client import StubLLM, wrap_cost_tracking
from semantic_olap_spark.operators.semantic import sem_topk

K = 4
M = 6  # n_opponents; must exceed K-1 for the dominance argument


@pytest.fixture(scope="module")
def topk_docs(spark):
    rows = []
    for i in range(160):
        if i % 37 == 3 and len([r for r in rows if "magnet" in r[1]]) < K:
            strength = K - len([r for r in rows if "magnet" in r[1]])
            # 2+strength occurrences: strictly decreasing by id
            body = "magnet coil " * (2 + strength) + f"doc {i}"
        else:
            body = f"ordinary text body number {i} filler words"
        rows.append((i, body))
    df = spark.createDataFrame(rows, ["id", "text"]).cache()
    df.count()
    return df


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_prescreen_matches_full_tournament(spark, topk_docs):
    full = sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", keep_wins=False,
    )
    pre = sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", keep_wins=False,
        prescreen_k=24,
    )
    want = _ids(full)
    assert len(want) == K
    assert _ids(pre) == want


def test_prescreen_reduces_llm_calls(spark, topk_docs):
    f_full, s_full = wrap_cost_tracking(spark, StubLLM)
    sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", llm_factory=f_full,
    ).collect()
    f_pre, s_pre = wrap_cost_tracking(spark, StubLLM)
    sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", llm_factory=f_pre,
        prescreen_k=24,
    ).collect()
    # full: ~160·M judgments; prescreened: ~24·M
    assert s_pre.requests < s_full.requests / 4
    assert s_pre.requests > 0


def test_prescreen_k_must_exceed_k(topk_docs):
    with pytest.raises(ValueError, match="prescreen_k"):
        sem_topk(
            topk_docs, ["text"], "magnet coil", 5,
            id_col="id", prescreen_k=5,
        )


def test_prescreen_noop_when_smaller_than_n(spark, topk_docs):
    # prescreen_k ≥ n keeps everything: identical to the full
    # tournament INCLUDING win counts
    full = sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id",
    ).collect()
    pre = sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", prescreen_k=1000,
    ).collect()
    assert sorted((r["id"], r["wins"]) for r in full) == sorted(
        (r["id"], r["wins"]) for r in pre
    )


def test_custom_prescreen_score_column(spark, topk_docs):
    from pyspark.sql import functions as F

    # user-supplied score: occurrences of 'magnet' — coarser than the
    # cosine but just as valid a prescreen under the stub judge
    score = F.size(F.split(F.col("text"), "magnet")) - 1
    pre = sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", keep_wins=False,
        prescreen_k=24, prescreen_score=score,
    )
    full = sem_topk(
        topk_docs, ["text"], "magnet coil", K,
        n_opponents=M, id_col="id", keep_wins=False,
    )
    assert _ids(pre) == _ids(full)
