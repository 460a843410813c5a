"""One-pass column profiling — the pipeline pre-flight check.

Before a 100 TB ingest you profile: null rates (broken extraction),
distinct counts (key candidates / degenerate columns), numeric ranges
(unit bugs).  ``profile_columns`` computes all of it in ONE
aggregation pass over the scan — never one job per column — and
reshapes the single result row into a tidy (column, stats) frame
driver-side-free via ``stack``.

Multiple ``count(distinct)`` in one aggregate compile to Spark's
Expand-based plan (one row multiplied per distinct aggregate) — the
standard trade: ~n_cols× shuffle volume for a single scan of the
data.  For quick looks at very wide tables pass
``approx_distinct=True`` (HLL sketches, no Expand, one ordinary
partial-agg shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-column stats in one scan: nulls, distincts, numeric range.

    Output: ``(column, n_rows, n_null, n_distinct, min_num,
    max_num)`` — one row per profiled column.  ``min_num``/
    ``max_num`` are the min/max of ``try_cast(col AS double)``
    (null for non-numeric columns; ``try_cast`` mirrors the
    engine-wide numeric-on-demand rule, SURVEY §1.2).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        # backtick-quote with doubled inner backticks: resolves by
        # exact name, so dots/quotes/backticks in legal column names
        # all survive (bare F.col would parse them)
        col = F.col(f"`{c.replace('`', '``')}`")
        num = col.try_cast("double")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{i}"),
            (
                F.approx_count_distinct(col)
                if approx_distinct
                else F.countDistinct(col)
            ).alias(f"_dst_{i}"),
            F.min(num).alias(f"_min_{i}"),
            F.max(num).alias(f"_max_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', _null_{}, _dst_{}, _min_{}, _max_{}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i, i, i, i
        )
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_num, max_num)",
        "_n AS n_rows",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_num", "max_num")
