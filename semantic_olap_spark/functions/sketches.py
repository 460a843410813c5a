"""Mergeable sketches: incremental distinct counts and heavy hitters.

The reference's only cardinality surface is an exact per-group
distinct (`count` documented surface, baseline_LLM_direct.py:90-99);
``count_op(approx=True)`` already trades that for a one-pass HLL
*estimate*.  This module adds the piece that matters at 100 TB with
*incremental* data: the sketch itself as a first-class, mergeable
value (Apache DataSketches HLL via Spark's built-in
``hll_sketch_agg``/``hll_union_agg``).

Why sketches instead of re-counting: a daily distinct-users job over
an append-only event log either rescans the full history every day
(O(history) per day) or keeps per-partition sketch rows and merges
them (O(new data) per day, bounded bytes per group).  Merge is
associative/commutative and deterministic — the union of per-batch
sketches is byte-equivalent to a single-pass sketch of the whole
corpus, so estimates never depend on how ingestion was batched
(property-tested in tests/test_sketches.py).

100 TB posture: every function here is a single partial→final hash
aggregation (sketch updates combine map-side); the stored sketch
table is #groups × ~lgK·2^lgK bits regardless of input size; no
driver-side state.  Not DuckDB-reproducible (implementation-specific
binary state) — correctness is pytest error-bound + merge-parity
contracts, the same evidence class as MinHash/LSH.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch",
    "estimate_distinct",
    "merge_distinct_sketches",
    "top_frequent",
]


def distinct_sketch(
    df: DataFrame,
    col: str,
    group_by: str | Sequence[str] | None = None,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``col``'s distinct values.

    ``lg_k=12`` ⇒ 4096 registers ≈ ±1.6% standard error in ~2 KB per
    group.  The output is a durable artifact: write it partitioned by
    ingestion batch, then :func:`merge_distinct_sketches` folds new
    batches in without touching old data.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    agg = F.hll_sketch_agg(F.col(col).cast("string"), lg_k).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.groupBy().agg(agg)


def merge_distinct_sketches(
    df: DataFrame,
    group_by: str | Sequence[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union per-batch sketch rows down to one sketch per group."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.groupBy().agg(agg)


def estimate_distinct(
    df: DataFrame, sketch_col: str = "sketch", out_col: str = "distinct_est"
) -> DataFrame:
    """Decode sketches to cardinality estimates (drops the binary)."""
    return df.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def top_frequent(
    df: DataFrame,
    col: str,
    k: int = 10,
    group_by: str | Sequence[str] | None = None,
    support: float = 0.0,
) -> DataFrame:
    """Heavy hitters: the ≤k most frequent values of ``col`` per group.

    Exact two-phase plan — ``groupBy(keys, col).count()`` (map-side
    combine collapses repeats before the shuffle, so the shuffle
    carries one row per distinct value, not per input row) then a
    per-group top-k window over the counts.

    ``support > 0`` adds a SUPPORT FLOOR between the phases: values
    seen fewer than ``support × group_total`` times are dropped
    before ranking.  That bounds the window input at 100 TB (the
    near-unique tail is most of the distinct mass) but changes the
    contract — a group whose k-th value falls under the floor
    returns FEWER than k rows (a uniform group can return zero).
    Rank-based top-k and a frequency floor are different questions;
    the default asks only the first.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    counts = df.groupBy(*keys, F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    if support > 0:
        # support is relative to the GROUP's row count (a small group
        # must not be judged against the global total), computed
        # lazily from the counts frame itself: a per-group window sum
        # (same partitioning as the groupBy — no extra shuffle), or a
        # scalar broadcast join when ungrouped.  Either way the raw
        # input is scanned once and no driver-side count() action
        # runs at build time.
        if keys:
            from pyspark.sql import Window as _W

            total_c = F.sum("freq").over(
                _W.partitionBy(*[F.col(k) for k in keys])
            )
            counts = counts.withColumn("_total", total_c)
        else:
            total = counts.groupBy().agg(F.sum("freq").alias("_total"))
            counts = counts.join(F.broadcast(total))
        # direct comparison — truncating the threshold to a long
        # would let values strictly below support*total survive
        counts = counts.filter(
            F.col("freq") >= F.lit(float(support)) * F.col("_total")
        ).drop("_total")
    from pyspark.sql import Window

    part = Window.partitionBy(*[F.col(c) for c in keys]) if keys else Window.partitionBy()
    w = part.orderBy(F.col("freq").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def _cms(col: Column, eps: float, confidence: float, seed: int) -> Column:
    return F.count_min_sketch(
        col, F.lit(eps), F.lit(confidence), F.lit(seed)
    )


def freq_sketch(
    df: DataFrame,
    col: str,
    group_by: str | Sequence[str] | None = None,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_col: str = "cms",
) -> DataFrame:
    """Per-group Count-Min sketch of ``col`` — mergeable frequency
    state (point-lookup of any value's approximate count downstream,
    e.g. in a later Spark job via ``CountMinSketch.readFrom``).
    Fixed ``seed`` keeps sketches from different batches mergeable.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    agg = _cms(F.col(col).cast("string"), eps, confidence, seed).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.groupBy().agg(agg)


__all__.append("freq_sketch")
