"""Change-data-capture application: SCD-1 upsert and SCD-2 history.

A 100 TB corpus is never static: upstream rows are inserted, updated
and deleted, and the pipeline must reconcile a base snapshot with a
change log without a transactional table format underneath.  Both
operators here are pure DataFrame algebra — one shuffle on the
business key, no driver loops, no external dependency:

- :func:`apply_cdc` (SCD type 1): latest-change-wins upsert of an
  ``I``/``U``/``D`` change log onto a snapshot.  Implemented as
  union → ``row_number`` over (key, recency) → keep rank 1 → drop
  deletes.  Recency orders by (is_change, seq): every change beats
  the base row, later sequence beats earlier — so the base snapshot
  needs no sequence column of its own.
- :func:`scd2_history` (SCD type 2): turn a change log into validity
  intervals — ``valid_from`` = the change's sequence, ``valid_to`` =
  the next change's (NULL = still open), ``is_current`` marking the
  open non-deleted version.  One ``lead`` window per key.

Ties on (key, seq) break by preferring deletes (a delete and an
upsert sharing a sequence number resolve to the delete — the
conservative reading for data-removal compliance).  Two NON-delete
changes sharing the same (key, seq) are undefined — no further sort
key exists, so which payload wins is partition-order dependent; a
change feed with that shape needs its own disambiguating sequence
(real CDC offsets provide one).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an I/U/D change log onto a snapshot (latest wins).

    ``base`` carries the data columns; ``changes`` carries the same
    data columns plus ``seq_col`` (orderable recency) and ``op_col``.
    Output schema equals ``base``'s.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    data_cols = base.columns
    b = base.select(
        *data_cols,
        F.lit(0).alias("_is_chg"),
        F.lit(None).cast(changes.schema[seq_col].dataType).alias("_seq"),
        F.lit(None).cast("string").alias("_op"),
    )
    c = changes.select(
        *data_cols,
        F.lit(1).alias("_is_chg"),
        F.col(seq_col).alias("_seq"),
        F.col(op_col).cast("string").alias("_op"),
    )
    w = Window.partitionBy(*ks).orderBy(
        F.col("_is_chg").desc(),
        F.col("_seq").desc_nulls_last(),
        # same-seq tie: delete wins (conservative for removals)
        (F.col("_op") == F.lit(delete_op)).desc(),
    )
    return (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            & (
                F.col("_op").isNull()
                | (F.col("_op") != F.lit(delete_op))
            )
        )
        .select(*data_cols)
    )


def temporal_join(
    facts: DataFrame,
    history: DataFrame,
    keys: str | Sequence[str],
    fact_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact meets the version valid at its time.

    The consumer of :func:`scd2_history`: a fact row with timestamp
    ``t`` joins the dimension version whose interval contains ``t``
    (``valid_from <= t < valid_to``; an open interval — NULL
    ``valid_to`` — matches everything from its start).  Intervals
    from ``scd2_history`` are disjoint per key, so each fact matches
    at most one version; ``how='left'`` keeps facts that predate the
    first version.

    Scale shape: the key equality makes this a plain shuffled
    equi-join with the interval predicate evaluated as the join
    residual — never a nested-loop.  Differs from ``asof_join``
    (operators/relational.py) in contract, not just mechanics:
    as-of picks the latest earlier event from a raw stream; this
    consumes *explicit intervals*, where deletes create gaps that
    must NOT match (an as-of backward fill would bridge them).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    h = history
    for k in ks:
        h = h.withColumnRenamed(k, f"_tj_{k}")
    cond = F.lit(True)
    for k in ks:
        cond = cond & (facts[k] == h[f"_tj_{k}"])
    t = facts[fact_time]
    cond = cond & (t >= h[valid_from]) & (
        h[valid_to].isNull() | (t < h[valid_to])
    )
    out = facts.join(h, cond, how)
    return out.drop(*[f"_tj_{k}" for k in ks])


def scd2_history(
    changes: DataFrame,
    keys: str | Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Validity intervals from a change log (SCD type 2).

    Every non-delete change becomes a version row with
    ``valid_from`` (its sequence), ``valid_to`` (the next change's
    sequence for that key, NULL while open) and ``is_current``.
    Delete rows emit no version but still CLOSE the previous one —
    which falls out of ``lead`` naturally since the lead is computed
    before deletes are dropped.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    # Same-seq tie: delete sorts AFTER the non-delete it shares a
    # sequence with, so the version row's lead() picks up the delete's
    # seq — a zero-length, closed, non-current interval.  The delete
    # wins the final state, matching apply_cdc's tiebreak.
    w = Window.partitionBy(*ks).orderBy(
        F.col(seq_col).asc(),
        (F.col(op_col) == F.lit(delete_op)).asc(),
    )
    out = changes.withColumn(
        "valid_from", F.col(seq_col)
    ).withColumn("valid_to", F.lead(seq_col).over(w))
    return (
        out.filter(F.col(op_col) != F.lit(delete_op))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col)
    )
