"""Reshape and multi-level aggregation operators.

The reference has no pivot and no SQL-sense grouping sets / cube /
rollup (SURVEY.md §2.5 — its AND/OR mask trees over one table play
the set-operator role, and roll-up means *semantic* re-granularity).
For an analytics engine these are table stakes, and on Spark they
are pure Catalyst — this module is the thin, tested surface over
them, mirroring the conventions of ``deterministic.py`` (stable
output aliases, ``round_to`` for oracle-safe float compare).

100 TB posture:

- :func:`pivot_agg` REQUIRES an explicit pivot-value list.  Spark's
  implicit form first runs a ``distinct().collect()`` over the pivot
  column — a full extra job plus an unbounded driver collect; with
  the list supplied the whole pivot is a single partial→final
  hash aggregation (one shuffle on ``group_cols``) and the output
  schema is known without touching data.
- :func:`cube_agg` / :func:`rollup_agg` / :func:`grouping_sets_agg`
  **pre-aggregate to the finest (all-dims) group BEFORE Expand**
  whenever the aggregate is decomposable (sum/min/max): Expand
  multiplies its input by 2^d (cube) map-side, so running it over
  the reduced one-row-per-finest-group set instead of the raw scan
  removes the 2^d CPU inflation entirely — the raw rows are touched
  exactly once, by an ordinary partial→final hash aggregation.  The
  second shuffle this adds carries only |finest groups| × 2^d rows
  (bytes, not gigabytes, at any scale).  The r05 scale study showed
  the direct form going 10.7× at 10× data on ``cube_shipping``;
  this is the fix.  Non-decomposable ``avg`` keeps the direct
  single-pass plan (re-averaging partial averages is wrong, and
  decomposing to sum/count changes float association against the
  pinned oracles).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_olap_spark.operators.deterministic import AGGS

__all__ = [
    "cube_agg",
    "grouping_sets_agg",
    "pivot_agg",
    "rollup_agg",
]


def pivot_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    agg: str = "sum",
    round_to: int | None = None,
) -> DataFrame:
    """Long→wide pivot: one output column per pivot value.

    Inverse of the ``unpivot`` reshape (``DataFrame.unpivot``, used
    by the ``unpivot_lineitem_metrics`` driver query).  Output
    columns are ``{pivot_col}_{value}`` (sanitized), so plan
    consumers and the oracle compare see stable names regardless of
    the value spelling.  Values absent from a group yield NULL, the
    same as a ``CASE WHEN``-filtered aggregate in ANSI SQL.
    """
    if agg not in AGGS:
        raise ValueError(f"unknown agg {agg!r}")
    if not pivot_values:
        raise ValueError(
            "pivot_agg requires an explicit pivot_values list: the "
            "implicit form adds a distinct+collect job over the pivot "
            "column (unbounded at scale)"
        )
    pivot_values = [str(v) for v in pivot_values]
    e = AGGS[agg](F.col(value_col).try_cast("double"))
    if round_to is not None:
        e = F.round(e, round_to)
    out = (
        df.groupBy(*group_cols)
        .pivot(pivot_col, pivot_values)
        .agg(e.alias("_v"))
    )
    safe = {
        v: f"{pivot_col}_{''.join(ch if ch.isalnum() else '_' for ch in v)}"
        for v in pivot_values
    }
    # sanitization is lossy ('a.b' and 'a_b' both → 'a_b'); a silent
    # duplicate column poisons every later select with
    # AMBIGUOUS_REFERENCE — refuse here with the colliding values
    if len(set(safe.values())) != len(safe):
        from collections import Counter

        dupes = [
            n for n, c in Counter(safe.values()).items() if c > 1
        ]
        raise ValueError(
            f"pivot values collide after identifier sanitization: "
            f"{sorted(v for v in safe if safe[v] in dupes)} all map "
            f"to {dupes} — rename the values or pivot on a cleaned "
            f"column"
        )
    # raw↔sanitized crossover: withColumnsRenamed applies the map
    # sequentially, so renaming 'x'→'p_x' while a raw value 'p_x' also
    # exists cascades both onto the same final name — refuse
    crossover = {
        safe[v] for v in pivot_values if safe[v] != v
    } & set(pivot_values)
    if crossover:
        raise ValueError(
            f"sanitized pivot column names {sorted(crossover)} equal "
            f"other raw pivot values — rename the values or pivot on "
            f"a cleaned column"
        )
    # the same poisoning occurs against the group keys (and a raw
    # pivot value that equals a group column makes the rename itself
    # ambiguous)
    clash = (set(safe.values()) | set(pivot_values)) & set(group_cols)
    if clash:
        raise ValueError(
            f"pivot columns {sorted(clash)} collide with group_cols "
            f"— rename the group columns or the pivot values"
        )
    # one projection for all renames, not one plan node per value
    return out.withColumnsRenamed(safe)


def _multi_agg_exprs(
    value_cols: Sequence[str], agg: str, round_to: int | None
):
    if agg not in AGGS:
        raise ValueError(f"unknown agg {agg!r}")
    exprs = []
    for c in value_cols:
        e = AGGS[agg](F.col(c).try_cast("double"))
        if round_to is not None:
            e = F.round(e, round_to)
        exprs.append(e.alias(f"{agg}_{c}"))
    return exprs


# aggs whose partial-per-finest-group results merge losslessly with
# the same function (sum of sums, min of mins, max of maxes)
_SELF_MERGING = frozenset(("sum", "min", "max"))


def _prereduce(
    df: DataFrame, dims: Sequence[str], value_cols: Sequence[str], agg: str
):
    """Collapse to one row per finest dims group before Expand.

    Returns ``(reduced_df, final_exprs_builder)`` or ``None`` when
    the agg is not self-merging.  The reduced frame carries the agg
    result per value column under its FINAL alias, so the Expand
    stage just re-aggregates those columns with the same function —
    output names and dtypes are identical to the direct plan.
    """
    if agg not in _SELF_MERGING:
        return None
    aliases = [f"{agg}_{c}" for c in value_cols]
    partial = df.groupBy(*dims).agg(*[
        AGGS[agg](F.col(c).try_cast("double")).alias(a)
        for c, a in zip(value_cols, aliases)
    ])

    def final_exprs(round_to: int | None):
        exprs = []
        for a in aliases:
            e = AGGS[agg](F.col(a))
            if round_to is not None:
                e = F.round(e, round_to)
            exprs.append(e.alias(a))
        return exprs

    return partial, final_exprs


def cube_agg(
    df: DataFrame,
    dims: Sequence[str],
    value_cols: Sequence[str],
    agg: str = "sum",
    round_to: int | None = None,
    gid_col: str = "gid",
) -> DataFrame:
    """All 2^d grouping combinations of ``dims`` in one pass.

    ``gid_col`` carries ``grouping_id(*dims)`` (left dim = MSB — the
    same bit convention DuckDB's ``GROUPING_ID`` uses, so the oracle
    compares exactly).  It also disambiguates a genuine NULL dim
    value from a rolled-up level, which the bare NULLs cannot.
    """
    gid = [F.grouping_id(*[F.col(d) for d in dims]).alias(gid_col)]
    red = _prereduce(df, dims, value_cols, agg)
    if red is not None:
        partial, final_exprs = red
        return partial.cube(*dims).agg(*gid, *final_exprs(round_to))
    return df.cube(*dims).agg(
        *gid, *_multi_agg_exprs(value_cols, agg, round_to)
    )


def rollup_agg(
    df: DataFrame,
    dims: Sequence[str],
    value_cols: Sequence[str],
    agg: str = "sum",
    round_to: int | None = None,
    gid_col: str = "gid",
) -> DataFrame:
    """Hierarchical prefixes of ``dims`` (d+1 levels) in one pass.

    The classic drill-down-ready total: (a,b), (a), () for
    ``dims=[a,b]``.  Same ``gid_col`` contract as :func:`cube_agg`.
    """
    gid = [F.grouping_id(*[F.col(d) for d in dims]).alias(gid_col)]
    red = _prereduce(df, dims, value_cols, agg)
    if red is not None:
        partial, final_exprs = red
        return partial.rollup(*dims).agg(*gid, *final_exprs(round_to))
    return df.rollup(*dims).agg(
        *gid, *_multi_agg_exprs(value_cols, agg, round_to)
    )


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    value_cols: Sequence[str],
    agg: str = "sum",
    round_to: int | None = None,
    gid_col: str = "gid",
) -> DataFrame:
    """Only the listed grouping sets — the scale-safe cube subset.

    ``sets`` is a list of column lists, e.g. ``[["a"], ["b"], []]``;
    the dims of the output are the union of all sets in first-seen
    order.  Use this instead of :func:`cube_agg` when only a few of
    the 2^d combinations are wanted: map-side Expand emits
    ``len(sets)`` rows per input row instead of 2^d.
    """
    dims: list[str] = []
    for s in sets:
        for c in s:
            if c not in dims:
                dims.append(c)
    gid = [F.grouping_id(*[F.col(d) for d in dims]).alias(gid_col)]
    red = _prereduce(df, dims, value_cols, agg)
    if red is not None:
        partial, final_exprs = red
        return partial.groupingSets([list(s) for s in sets], *dims).agg(
            *gid, *final_exprs(round_to)
        )
    return df.groupingSets([list(s) for s in sets], *dims).agg(
        *gid, *_multi_agg_exprs(value_cols, agg, round_to)
    )
