"""Time-series reshaping: resample with gap-fill, LOCF forward-fill.

OLAP over event data constantly needs a *dense* time axis — a chart
or a join against another series breaks on missing periods — and a
carried-forward reading for sparse sensors/slowly-changing values.
The reference has no time semantics at all (SURVEY.md §1.2: dates
are strings filtered by LLM/regex); Spark has the primitives but not
the operators.  Both here are deterministic compositions with exact
ANSI-SQL mirrors (DuckDB ``generate_series`` / ``IGNORE NULLS``).

100 TB posture:

- :func:`resample` aggregates first (shuffle carries one row per
  (group, bucket) — never per event), then densifies by exploding a
  per-group ``sequence(min, max, step)`` — output is bounded by
  #groups × horizon, and the spine build reuses the aggregated
  frame (a self-agg + broadcast-friendly join on the group key).
- :func:`ffill` is one window per group ordered by time using
  ``last(col, ignorenulls=True)`` with an unbounded-preceding frame
  — a single shuffle on the group key; state per task is one value
  per column, independent of window length.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_olap_spark.operators.deterministic import AGGS

__all__ = ["ffill", "resample"]

_STEPS = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 7 days",
}


def resample(
    df: DataFrame,
    ts_col: str,
    step: str = "day",
    group_by: str | Sequence[str] | None = None,
    value_col: str | None = None,
    agg: str = "sum",
    fill: float | None = None,
) -> DataFrame:
    """Dense per-period aggregates: one row per (group, period),
    including empty periods between each group's first and last event.

    Output: ``(keys..., period, n_events, {agg}_{value_col}?)``.
    Empty periods have ``n_events = 0`` and value ``fill`` (NULL by
    default).  ``step`` ∈ hour/day/week.
    """
    if step not in _STEPS:
        raise ValueError(f"step must be one of {sorted(_STEPS)}")
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    bucket = F.date_trunc(step if step != "week" else "week", F.col(ts_col))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        if agg not in AGGS:
            raise ValueError(f"unknown agg {agg!r}")
        aggs.append(
            AGGS[agg](F.col(value_col).try_cast("double")).alias(
                f"{agg}_{value_col}"
            )
        )
    dense = df.groupBy(*keys, bucket.alias("period")).agg(*aggs)

    # spine: every step between each group's min and max period —
    # built from the already-aggregated frame, so the explode input
    # is one row per group
    spine = (
        dense.groupBy(*keys)
        .agg(F.min("period").alias("_lo"), F.max("period").alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.expr(_STEPS[step])
                )
            ).alias("period"),
        )
    )
    out = spine.join(dense, [*keys, "period"], "left")
    out = out.withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )
    if value_col is not None and fill is not None:
        vc = f"{agg}_{value_col}"
        out = out.withColumn(vc, F.coalesce(F.col(vc), F.lit(float(fill))))
    return out


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    ts_col: str,
    group_by: str | Sequence[str] | None = None,
    allow_ungrouped: bool = False,
) -> DataFrame:
    """Forward-fill (LOCF): replace NULLs with the latest earlier
    non-NULL value within the group, in ``ts_col`` order.

    Ties on ``ts_col`` are broken by the existing row order being
    irrelevant: ``last(ignorenulls)`` over rows-unbounded-preceding
    takes whichever tied row the sort placed last — add a tiebreak
    column to ``ts_col`` upstream if ties are possible and matter.

    Without ``group_by`` the window is a single global sort task
    (same footgun class as keyless ``asof_join``) — opt in with
    ``allow_ungrouped=True`` for small/bounded frames only.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    if not keys and not allow_ungrouped:
        raise ValueError(
            "ffill without group_by is a single-partition global "
            "window; pass group_by= or opt in with "
            "allow_ungrouped=True on bounded data"
        )
    w = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
