"""Deterministic logical operators (pure Spark SQL, no LLM).

These are operators 2/3/7/8/9 of the reference's ten-operator
contract (SURVEY.md §2.1), re-expressed as Catalyst expressions so
predicate pushdown / column pruning / whole-stage codegen all apply.
Each filter operator exposes BOTH a ``*_cond`` form returning a
boolean Column (for composition inside logic trees and staged
evaluation) and a DataFrame form that applies it.

Reference semantics notes (deviations documented per SURVEY.md §7.4):

- ``keyword_filter`` (Semantic-OLAP/Agents/Components/Operaters.py:10-42,
  catalog baselines/baseline_LLM_direct.py:16-27): match is
  case-insensitive over the space-joined selected columns.  The
  reference's ``contained_in`` branch is buggy (a generator object in
  ``apply``, Operaters.py:21) — we implement the *documented*
  semantics (cell text is a substring of the keyword).  The reference
  uses regex-mode ``str.contains`` (Operaters.py:19); we match
  literally — keywords are data, not patterns.
- ``num_filter`` (Operaters.py:83-103): values are cast to double
  with null-on-failure (``pd.to_numeric(errors='coerce')``), and
  unparseable/NaN compare as False (Operaters.py:103).
- ``num_reduce`` (Operaters.py:426-434): sum/avg/max/min, per group
  or global.
- ``count`` (Operaters.py:436-438 vs the documented surface at
  baseline_LLM_direct.py:90-99): we implement the documented surface
  — row count per group, plus distinct-count per requested column.
- ``num_topk`` (Operaters.py:440-450): top-k by numeric cast of a
  column; non-numeric rows (cast → null) sort last in both
  directions, matching pandas ``sort_values`` NaN placement; a
  deterministic tiebreak column keeps results stable.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM_OPS = {
    "==": lambda c, t: c == t,
    "!=": lambda c, t: c != t,
    ">": lambda c, t: c > t,
    "<": lambda c, t: c < t,
    ">=": lambda c, t: c >= t,
    "<=": lambda c, t: c <= t,
}

AGGS = {"sum": F.sum, "avg": F.avg, "max": F.max, "min": F.min}


def _joined_text(columns: Sequence[str]) -> Column:
    """Space-joined, lowercased text of the selected columns.

    ``concat_ws`` skips nulls (same in DuckDB — oracle-compatible).
    Non-string columns are stringified, mirroring the reference's
    all-string model (SURVEY.md §1.2).
    """
    return F.lower(F.concat_ws(" ", *[F.col(c).cast("string") for c in columns]))


def keyword_filter_cond(
    columns: Sequence[str],
    keywords: Sequence[str],
    logic: str = "or",
    relation: str = "contains",
) -> Column:
    """Boolean Column for keyword_filter (Operaters.py:10-42)."""
    logic = logic.lower()
    relation = relation.lower()
    if relation == "contain":
        # the reference's golden-plan corpus spells it both ways
        # (evaluate_datas.json: 'contain' 23×, 'contains' 12×)
        relation = "contains"
    if logic not in ("and", "or"):
        raise ValueError(f"keyword_filter logic must be and/or, got {logic!r}")
    if not keywords:
        raise ValueError("keyword_filter needs at least one keyword")
    if not columns:
        raise ValueError("keyword_filter needs at least one column")
    text = _joined_text(columns)
    masks: list[Column] = []
    for kw in keywords:
        k = str(kw).lower()
        if relation in ("contains", "irrelevant"):
            m = text.contains(F.lit(k))
        elif relation == "equal":
            m = text == F.lit(k)
        elif relation == "contained_in":
            # documented semantics: cell text ⊂ keyword (the
            # reference's own impl of this branch is broken,
            # Operaters.py:21)
            m = F.lit(k).contains(text)
        else:
            raise ValueError(f"unknown relation {relation!r}")
        masks.append(m)
    acc = masks[0]
    for m in masks[1:]:
        acc = (acc & m) if logic == "and" else (acc | m)
    if relation == "irrelevant":
        # The reference builds the 'contains' masks, combines them per
        # logic, then negates the COMBINED mask (Operaters.py:38-40) —
        # e.g. logic='or' keeps rows containing NONE of the keywords.
        acc = ~acc
    return F.coalesce(acc, F.lit(False))


def keyword_filter(
    df: DataFrame,
    columns: Sequence[str],
    keywords: Sequence[str],
    logic: str = "or",
    relation: str = "contains",
) -> DataFrame:
    return df.filter(keyword_filter_cond(columns, keywords, logic, relation))


def _num_pred(conditions: Sequence[Mapping], logic: str) -> Column:
    logic = logic.lower()
    if not conditions:
        raise ValueError("num_filter needs at least one condition")
    masks: list[Column] = []
    for cond in conditions:
        op = cond["operator"]
        if op not in _NUM_OPS:
            raise ValueError(f"unknown operator {op!r}")
        c = F.col(cond["column"]).try_cast("double")
        masks.append(_NUM_OPS[op](c, F.lit(float(cond["threshold"]))))
    acc = masks[0]
    for m in masks[1:]:
        acc = (acc & m) if logic == "and" else (acc | m)
    return acc


def num_filter_cond(
    conditions: Sequence[Mapping], logic: str = "and"
) -> Column:
    """Boolean Column for num_filter (Operaters.py:83-103).

    Each condition: ``{column, threshold, operator}`` with operator
    in ==,!=,>,<,>=,<=.  Unparseable values compare False
    (null→False coercion, Operaters.py:103).  Thresholds stay float —
    the reference's int-truncation in num_cmp (Operaters.py:113) is a
    bug we do not reproduce (SURVEY.md §7.4 item 4).

    The null→False ``coalesce`` marks the leaf *decided* for Kleene
    staging; it also blocks parquet filter pushdown, which is why the
    DataFrame form below doesn't use it.
    """
    return F.coalesce(_num_pred(conditions, logic), F.lit(False))


def num_filter(
    df: DataFrame, conditions: Sequence[Mapping], logic: str = "and"
) -> DataFrame:
    """Filter rows by numeric conditions — the pushdown path.

    Uses the RAW predicate: inside a ``filter``, null and False drop
    the row identically, so results match ``num_filter_cond`` exactly
    — but without the ``coalesce`` wrapper Catalyst pushes
    ``IsNotNull + GreaterThan(...)`` into the parquet scan (row-group
    skipping via min/max stats; on typed numeric columns ``try_cast``
    is elided as a no-op).  At 100 TB that is the difference between
    scanning the filtered fraction and scanning everything.
    """
    return df.filter(_num_pred(conditions, logic))


def num_reduce(
    df: DataFrame,
    columns: Sequence[str],
    agg: str,
    group_by: str | Sequence[str] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """sum/avg/max/min per group or global (Operaters.py:426-434).

    Output columns are aliased ``{agg}_{col}`` so plan-language
    consumers (and the DuckDB oracle compare) see stable names.
    ``round_to`` optionally rounds float aggregates — used by the
    correctness harness to absorb summation-order differences.
    Map-side partial aggregation is automatic (HashAggregate
    partial→final), so the shuffle carries one row per group, not
    per input row.
    """
    if agg not in AGGS:
        raise ValueError(f"unknown agg {agg!r}")
    exprs = []
    for c in columns:
        e = AGGS[agg](F.col(c).try_cast("double"))
        if round_to is not None:
            e = F.round(e, round_to)
        exprs.append(e.alias(f"{agg}_{c}"))
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    if keys:
        return df.groupBy(*keys).agg(*exprs)
    return df.groupBy().agg(*exprs)


def count_op(
    df: DataFrame,
    group_by: str | Sequence[str] | None = None,
    columns: Sequence[str] = (),
    approx: bool = False,
) -> DataFrame:
    """Row count per group; plus distinct counts per listed column.

    Implements the documented surface (baseline_LLM_direct.py:90-99),
    not the engine's row-count-only shortcut (Operaters.py:436-438).
    ``approx=True`` switches to ``approx_count_distinct`` — at 100 TB
    an exact distinct per group is a second full shuffle; HLL keeps
    it one pass (not oracle-comparable, so off in tests).
    """
    exprs = [F.count(F.lit(1)).alias("count")]
    for c in columns:
        f = F.approx_count_distinct if approx else F.countDistinct
        exprs.append(f(F.col(c)).alias(f"distinct_{c}"))
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    if keys:
        return df.groupBy(*keys).agg(*exprs)
    return df.groupBy().agg(*exprs)


def topk_per_group(
    df: DataFrame,
    group_by: str | Sequence[str],
    order_col: str,
    k: int = 1,
    order: str = "desc",
    tiebreak: Iterable[str] = (),
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (grouped `num_topk`).

    A per-group window with `row_number` — one shuffle on the group
    keys; each task keeps a running counter, not a heap, and rows
    beyond k are dropped before anything else touches them.  Ties
    break on ``tiebreak`` columns (then arbitrarily — pass enough
    tiebreaks for determinism).  ``rank_col`` keeps the 1-based rank
    in the output when set.

    Ordering is type-aware: numeric columns order numerically,
    dates/timestamps chronologically, anything else (strings)
    lexicographically — a blanket double-cast would reject DATE at
    analysis time and silently NULL every string.
    """
    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )
    from pyspark.sql.window import Window

    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    dtype = df.schema[order_col].dataType
    extras: list = []
    if isinstance(dtype, (NumericType, DateType, TimestampType,
                          TimestampNTZType)):
        c = F.col(order_col)
    else:
        # numeric-on-demand for stringly-typed numbers (the engine-
        # wide rule, SURVEY §1.2); the raw column follows as a
        # secondary key so genuinely textual columns (cast → all
        # NULL) still get a deterministic lexicographic top-k
        # instead of k arbitrary rows
        c = F.col(order_col).try_cast("double")
        raw = F.col(order_col).cast("string")
        extras = [raw.desc() if order == "desc" else raw.asc()]
    key = c.desc_nulls_last() if order == "desc" else c.asc_nulls_last()
    w = Window.partitionBy(*keys).orderBy(
        key, *extras, *[F.col(t).asc() for t in tiebreak]
    )
    out = df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= int(k)
    )
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def num_topk(
    df: DataFrame,
    column: str,
    k: int,
    order: str = "desc",
    tiebreak: Iterable[str] = (),
) -> DataFrame:
    """Top-k by numeric value (Operaters.py:440-450).

    Physical plan is TakeOrderedAndProject — each partition keeps a
    size-k heap and only k rows per partition reach the driver-side
    merge; no global sort materializes.  Nulls (unparseable values)
    sort last either direction, matching pandas ``sort_values``.
    """
    c = F.col(column).try_cast("double")
    key = c.desc_nulls_last() if order == "desc" else c.asc_nulls_last()
    ties = [F.col(t).asc() for t in tiebreak]
    return df.orderBy(key, *ties).limit(int(k))
