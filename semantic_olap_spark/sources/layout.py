"""Z-order (Morton) data layout: multi-column file skipping.

Parquet scans skip whole files/row-groups whose column min/max
statistics exclude the predicate.  Sorting by one column makes
skipping perfect for that column and useless for every other; a
Z-order layout interleaves the bits of several columns' ranks so
that files are compact *rectangles* in the multi-dimensional value
space — a selective filter on ANY of the z-columns touches only the
files whose rectangle intersects it.  This is the standard
Delta/Iceberg `OPTIMIZE ZORDER BY` technique, implemented here with
pure Catalyst expressions (no table format required).

How: per column, an equal-frequency rank in [0, 2^bits) obtained by
bucketing against driver-side ``approx_percentile`` boundaries
(equal-frequency, so skewed distributions still spread evenly over
the key space), then bit-interleave the ranks into one long Morton
key, `repartitionByRange` on the key and sort-within-partitions so
every output file covers a tight key range.

100 TB posture: the stats pass is one partial→final aggregation
whose result is 2^bits−1 numbers per column on the driver (KB); the
only data movement is the single range repartition — the same cost
as any sort-layout rewrite, run once at ingest/compaction time and
amortized over every subsequent scan.  No windows, no single-
partition stages (explain-pinned in tests/test_layout.py, which
also pins the payoff: a selective 2-column filter over a z-ordered
write touches a small fraction of files vs ~all files under a hash
layout).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["write_zordered", "zorder_key"]


def _numeric(df: DataFrame, col: str) -> Column:
    """Column as double: dates/timestamps via epoch (try_cast from
    DATE/NTZ to DOUBLE is an analysis error), everything else
    through the engine-wide numeric-on-demand cast.  NTZ uses the
    tz-free naive-micros extraction so the z-order layout itself is
    session-timezone-invariant (same rule as timeseries.ts_micros;
    the key only orders files, but a tz-dependent key would make the
    written layout differ by writer session)."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    dtype = df.schema[col].dataType
    if isinstance(dtype, TimestampNTZType):
        from semantic_olap_spark.functions.timeseries import (
            naive_micros_sql,
        )

        return F.expr(naive_micros_sql(f"`{col}`")).cast("double")
    if isinstance(dtype, (DateType, TimestampType)):
        return F.col(col).cast("timestamp").cast("long").cast("double")
    return F.col(col).try_cast("double")


def _rank_expr(v: Column, boundaries: Sequence[float]) -> Column:
    """# of boundaries ≤ value — the value's equal-frequency bucket.

    A ≤64-element literal-array scan per row (vectorized JVM); nulls
    rank 0 so they cluster at the key-space origin.
    """
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.coalesce(
        F.size(F.filter(arr, lambda x: x <= v)), F.lit(0)
    ).cast("long")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 6,
    out_col: str = "_zkey",
) -> Column:
    """Morton key Column over numeric/date ``cols`` (2-4 of them).

    Runs one bounded stats job (``approx_percentile`` per column) to
    fix equal-frequency bucket boundaries, then returns the pure-
    expression interleaved key.  ``bits=6`` ⇒ 64 buckets per column
    — ranks are file-skipping granularity, not precision: with ~
    thousands of output files, 64² rectangles already separate them.
    """
    cols = list(cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError(
            "zorder_key needs 2-4 columns: one column is a plain "
            "sort; >4 dilutes every dimension's bits"
        )
    if bits * len(cols) > 60:
        raise ValueError("bits * len(cols) must fit a long (≤60)")
    n = 2 ** bits
    qs = [i / n for i in range(1, n)]
    stats = df.select(
        *[
            F.percentile_approx(
                _numeric(df, c), F.lit(qs), F.lit(10_000)
            ).alias(c)
            for c in cols
        ]
    ).first()
    ranks = []
    for c in cols:
        bounds = [b for b in (stats[c] or []) if b is not None]
        ranks.append(
            _rank_expr(_numeric(df, c), bounds)
            if bounds
            else F.lit(0).cast("long")
        )
    # interleave MSB-first: high key bits alternate between columns,
    # which is what makes key-contiguous files rectangles in value
    # space
    k = len(cols)
    parts = []
    for b in range(bits):  # b=0 → MSB of each rank
        src_bit = bits - 1 - b
        for i in range(k):
            dst_bit = src_bit * k + (k - 1 - i)
            parts.append(
                F.shiftleft(
                    F.shiftright(ranks[i], src_bit).bitwiseAND(F.lit(1)),
                    dst_bit,
                )
            )
    return reduce(lambda a, c: a.bitwiseOR(c), parts).alias(out_col)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 6,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` at ``path`` in Z-order over ``cols``.

    One range shuffle on the Morton key + in-partition sort, then a
    plain parquet write — each output file covers a contiguous key
    range, so per-file min/max stats on every z-column are tight.
    """
    # the scratch key must not shadow (and then silently DROP) a
    # user column — pick the first free name
    kcol = "_zkey"
    while kcol in df.columns:
        kcol += "_"
    key = zorder_key(df, cols, bits, out_col=kcol)
    with_key = df.withColumn(kcol, key)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        with_key.repartitionByRange(parts, F.col(kcol))
        .sortWithinPartitions(kcol)
        .drop(kcol)
        .write.mode(mode)
        .parquet(path)
    )
