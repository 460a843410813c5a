"""Distribution stats: equal-width histograms, correlation matrices.

The pre-flight companions to ``profile_columns`` — a histogram shows
the shape a min/max can't (bimodality, heaping, unit bugs), and a
correlation matrix finds redundant measures before they waste a
model's capacity.  Both are single-pass aggregations.

100 TB posture: :func:`histogram` is one groupBy on a computed
bucket id (map-side combined; shuffle carries ≤ bins rows per map
task) densified against a ``spark.range(bins)`` spine (bins rows
total).  :func:`corr_matrix` computes all C(n,2) pairwise Pearson
aggregates in ONE scan — the agg state is a handful of moments per
pair; keep n modest (≤~30 columns ⇒ ≤435 aggregates), which is also
where a correlation matrix is still readable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corr_matrix", "histogram"]


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram: ``(bin, lo, hi, n)`` — all ``bins``
    rows present, empty bins included with ``n = 0``.

    Bounds default to the column's min/max (one extra bounded stats
    pass); values exactly at ``hi`` land in the last bin, values
    outside [lo, hi] (only possible with explicit bounds) are
    dropped.  Non-numeric values (``try_cast`` → NULL) are dropped.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if lo is not None and hi is not None and float(hi) <= float(lo):
        # the +1 widening below is only sound for computed bounds
        # (all values equal); explicit degenerate bounds would admit
        # values the caller asked to exclude
        raise ValueError(f"explicit bounds need hi > lo, got [{lo}, {hi}]")
    v = F.col(col).try_cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
        if lo is None or hi is None:
            raise ValueError(f"column {col!r} has no numeric values")
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        hi = lo + 1.0  # degenerate range: single bucket of width 1
    width = (hi - lo) / bins
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(bins - 1),
    )
    counts = (
        df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
        .groupBy(bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def corr_matrix(
    df: DataFrame, cols: Sequence[str], round_to: int = 4
) -> DataFrame:
    """Pairwise Pearson correlations in one scan:
    ``(col_a, col_b, corr)`` for every a < b pair."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least 2 columns")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]
    aggs = [
        F.round(
            F.corr(
                F.col(a).try_cast("double"), F.col(b).try_cast("double")
            ),
            round_to,
        ).alias(f"_c_{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', _c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
    )
