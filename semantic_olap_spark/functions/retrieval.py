"""Hybrid retrieval: fuse independent rankings of the same corpus.

Beyond-reference operator (SURVEY.md §2.5 gap family): production
retrieval stacks rank the same corpus several ways — sparse lexical
(:func:`~semantic_olap_spark.functions.text.bm25_topk`), dense
embedding (:func:`~semantic_olap_spark.functions.similarity.cosine_topk`
/ ANN), recency or quality priors — and combine them.  Reciprocal
Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is the
standard parameter-light combiner:

    rrf(d) = Σ_lists  1 / (rrf_k + rank_list(d))

computed only over the lists that contain ``d``.

Scale posture: the inputs are *rankings* — top-k outputs, bounded by
construction (k rows each, not corpora).  Ranks are materialized
with a global ``row_number`` window per input, which is a
single-partition sort of at most k rows — the one place in the
package where a global window is correct because the input is
bounded before the window, not by it.  The fusion itself is a
union + one k-bounded ``groupBy``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str = "doc_id",
    score_cols: Sequence[str] | None = None,
    k: int = 10,
    rrf_k: int = 60,
    score_col: str = "rrf",
    round_to: int = 6,
) -> DataFrame:
    """Fuse ≥2 ranked frames by Reciprocal Rank Fusion.

    Each input frame holds one ranking of the same id space:
    ``id_col`` plus a score column (named in ``score_cols``, or the
    single non-id column).  Ranking within each list is
    ``(score desc, id asc)`` — the package-wide stable ordering — and
    ranks are 1-based.  Returns the top ``k`` ids by fused score
    (``score desc, id asc``), with the score rounded to ``round_to``
    so the ordering is bit-stable across engines.

    Ids missing from a list simply contribute no term for it (the
    standard RRF convention), so lists of different lengths and
    different coverage fuse without alignment.
    """
    if len(ranked) < 2:
        raise ValueError(f"need >= 2 rankings to fuse, got {len(ranked)}")
    if score_cols is None:
        score_cols = []
        for i, df in enumerate(ranked):
            rest = [c for c in df.columns if c != id_col]
            if len(rest) != 1:
                raise ValueError(
                    f"ranking #{i} has columns {df.columns}; pass "
                    f"score_cols to name the score column explicitly"
                )
            score_cols.append(rest[0])
    elif len(score_cols) != len(ranked):
        raise ValueError(
            f"{len(score_cols)} score_cols for {len(ranked)} rankings"
        )
    parts = []
    for df, sc in zip(ranked, score_cols):
        w = Window.orderBy(F.col(sc).desc(), F.col(id_col).asc())
        parts.append(
            df.select(
                F.col(id_col),
                (1.0 / (F.lit(int(rrf_k)) + F.row_number().over(w)))
                .alias("_contrib"),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return (
        unioned.groupBy(id_col)
        .agg(F.round(F.sum("_contrib"), round_to).alias(score_col))
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(int(k))
    )
