"""Relational operators Spark lacks as built-ins: as-of and range joins.

The reference has no joins at all (SURVEY.md §2.5); these are the
"custom operator as a composition of existing DataFrame ops" case —
the standard time-series operations a training-data/event pipeline
needs, built so the physical plan stays shuffle-bounded:

- ``asof_join``  — for each left row, the single right row with the
  greatest ``right_ts <= left_ts`` (optionally within ``by`` keys
  and a tolerance).  Implemented as union → window ``last_value``
  over (keys, time) — ONE shuffle on (by, ts), no range cross-join,
  no per-row lookup.  DuckDB's native ``ASOF JOIN`` is the oracle.
- ``range_join`` — left rows matched to right intervals
  ``[start, end)``.  With a ``by`` key this is an equi-join with a
  range residual (Spark handles it as hash join + filter); the
  docstring documents the bucketed-interval strategy for the
  keyless case at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    tolerance: str | None = None,
    right_prefix: str = "r_",
    allow_unkeyed: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before it.

    ``on``: the ordering (timestamp) column, present in both sides.
    ``by``: equality keys (e.g. user_id).  ``tolerance``: max lookback
    as an INTERVAL string (e.g. ``'1 hour'``) — older matches become
    NULL, matching DuckDB/pandas ``merge_asof`` semantics.

    Shape: tag both sides, union, then one window sorted by
    (by, on, side) carrying the last seen right values forward
    (``last_value(..., ignoreNulls)``).  Exactly one shuffle on the
    ``by`` keys, per-key windows.  WITHOUT ``by`` keys the window
    has no partitioning — a single-task global sort, fine only for
    a small right/left pair, so the keyless mode must be requested
    explicitly with ``allow_unkeyed=True``; always pass ``by`` (or
    pre-bucket time ranges) on large inputs.  Right-side value
    columns come
    back prefixed with ``right_prefix``; prefixed names (and the
    internal ``_side``/``_rv_*``/``_r_ts`` markers) must not collide
    with existing left columns — checked, clear error.
    """
    by = list(by or [])
    if not by and not allow_unkeyed:
        raise ValueError(
            "asof_join without by keys runs a single-task global "
            "sort; pass by=[...] on large inputs, or opt in with "
            "allow_unkeyed=True"
        )
    value_cols = [c for c in right.columns if c != on and c not in by]
    reserved = {"_side", "_r_ts"} | {f"_rv_{c}" for c in value_cols} | {
        f"{right_prefix}{c}" for c in value_cols + [on]
    }
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output names collide with left columns: "
            f"{sorted(clash)}; pass a different right_prefix"
        )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("_r_ts"),
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(on).alias("_r_ts"),
    )
    # align schemas: right rows carry NULL for left-only columns
    left_only = [c for c in left.columns if c not in by and c != on]
    r_tag = r_tag.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        "_side",
        *[F.col(f"_rv_{c}") for c in value_cols],
        "_r_ts",
    )
    l_cols = by + [on] + left_only + ["_side"] + [
        f"_rv_{c}" for c in value_cols
    ] + ["_r_ts"]
    unioned = l_tag.select(*l_cols).unionByName(r_tag.select(*l_cols))
    # right rows (side 0) sort before left rows at the same timestamp
    # → a right row at exactly left_ts matches (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by, F.col(on), *left_only, "_side",
        *[
            F.last(F.col(f"_rv_{c}"), ignorenulls=True).over(w)
            .alias(f"{right_prefix}{c}")
            for c in value_cols
        ],
        F.last(F.col("_r_ts"), ignorenulls=True).over(w).alias("_matched_ts"),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        stale = F.col("_matched_ts") < F.col(on) - F.expr(
            f"INTERVAL {tolerance}"
        )
        for c in value_cols:
            out = out.withColumn(
                f"{right_prefix}{c}",
                F.when(stale, F.lit(None)).otherwise(
                    F.col(f"{right_prefix}{c}")
                ),
            )
        out = out.withColumn(
            f"{right_prefix}{on}",
            F.when(stale, F.lit(None)).otherwise(F.col("_matched_ts")),
        )
    else:
        out = out.withColumn(f"{right_prefix}{on}", F.col("_matched_ts"))
    return out.drop("_matched_ts")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Match left points to right intervals ``start <= point < end``.

    With ``by`` keys the equi-part drives a hash join and the range
    condition is a residual filter — the standard shape Spark (and
    AQE) handle well.  Without keys this degenerates to a broadcast
    nested-loop join: acceptable only when ``right`` is small; at
    scale, bucket the intervals (join on overlapping time buckets,
    then filter) instead.
    """
    by = list(by or [])
    overlap = (set(left.columns) & set(right.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"range_join: columns {sorted(overlap)} exist on both "
            f"sides — rename or pre-select so only the 'by' keys "
            f"are shared (ambiguous references otherwise)"
        )
    r = right
    for k in by:
        r = r.withColumnRenamed(k, f"_rby_{k}")
    cond = (F.col(point) >= F.col(start)) & (F.col(point) < F.col(end))
    for k in by:
        cond = (F.col(k) == F.col(f"_rby_{k}")) & cond
    return left.join(r, cond).drop(*[f"_rby_{k}" for k in by])
