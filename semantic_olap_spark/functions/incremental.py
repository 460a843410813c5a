"""Incremental aggregate maintenance: mergeable exact states.

The reference memoizes whole *result tables* on granularity views
(Semantic-OLAP/Agents/Components/OLAP_Memory.py:76-77 ``set_view``) —
a cache that must be thrown away whenever new rows arrive.  At 100 TB
with continuous ingest, the production posture is instead
*incremental view maintenance*: keep per-group aggregate **state**
(count / decimal sum / min / max per metric), fold each new batch's
state in with a pure merge, and finalize to user-facing aggregates
(count / sum / avg / min / max) on read.  Every piece is
order-independent and exactly mergeable:

- counts and decimal sums form a commutative monoid (decimal
  addition is exact — no float reassociation drift, so a state
  merged batch-by-batch is bit-identical to a single global
  aggregate);
- min/max are idempotent semilattice ops;
- avg is derived at finalize time as ``exact_sum / count`` (never
  stored — stored averages don't merge).

This is the same contract as the HLL sketch path
(functions/sketches.py) but for the exact algebraic aggregates; the
two compose — a state table can carry both decimal sums and HLL
binaries, each merged with its own operator.

Scale shape: ``agg_state`` is one partial-aggregate shuffle per
batch (map-side combine, one row per group crosses the wire);
``merge_agg_states`` shuffles only state rows (|groups|, not |data|).
The full-history recompute this replaces is a scan of every batch
ever ingested.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# decimal(38,6): exact for anything the testdata or a TPC-H-ish
# schema produces; 6 fractional digits matches the oracle casts used
# across the driver contract (__spark_entry__ pricing_summary)
_DEC = "decimal(38,6)"


def _metric_cols(metrics: Sequence[str]) -> list[str]:
    out = []
    for m in metrics:
        out += [f"{m}_count", f"{m}_sum", f"{m}_min", f"{m}_max"]
    return out


def agg_state(
    df: DataFrame,
    metrics: Sequence[str],
    group_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """One mergeable aggregate-state row per group for this batch.

    State columns per metric ``m``: ``m_count`` (non-null rows),
    ``m_sum`` (exact decimal), ``m_min``, ``m_max``; plus ``n``
    (total batch rows per group).
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    aggs = [F.count(F.lit(1)).alias("n")]
    for m in metrics:
        c = F.col(m)
        aggs += [
            F.count(c).alias(f"{m}_count"),
            F.sum(c.cast(_DEC)).alias(f"{m}_sum"),
            F.min(c).alias(f"{m}_min"),
            F.max(c).alias(f"{m}_max"),
        ]
    return (df.groupBy(*keys) if keys else df.groupBy()).agg(*aggs)


def merge_agg_states(
    states: Sequence[DataFrame],
    metrics: Sequence[str],
    group_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Fold any number of per-batch states into one state per group.

    Pure state-level merge: groups absent from one batch simply
    contribute nothing (union semantics), so batches never need
    aligned group sets.  Associative and commutative — fold order
    does not matter, which is what makes the state a durable artifact
    (write per-batch states partitioned by ingest date; merge lazily).
    """
    if not states:
        raise ValueError("need at least one state frame")
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    aggs = [F.sum("n").alias("n")]
    for m in metrics:
        aggs += [
            F.sum(f"{m}_count").alias(f"{m}_count"),
            F.sum(F.col(f"{m}_sum").cast(_DEC)).alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return (unioned.groupBy(*keys) if keys else unioned.groupBy()).agg(*aggs)


def finalize_agg(
    state: DataFrame,
    metrics: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Decode a state frame to user-facing aggregates.

    Per metric: ``m_count`` (non-null rows), ``m_sum`` (rounded
    double), ``m_avg`` (= exact decimal sum cast to double, divided
    by count — the deterministic division order used across the
    driver oracles), ``m_min``, ``m_max``; group keys and ``n`` pass
    through.
    """
    cols = [c for c in state.columns if c not in set(_metric_cols(metrics))]
    out = [F.col(c) for c in cols]
    for m in metrics:
        s = F.col(f"{m}_sum")
        cnt = F.col(f"{m}_count")
        out += [
            cnt.alias(f"{m}_count"),
            F.round(s, round_to).cast("double").alias(f"{m}_sum"),
            F.round(
                s.cast("double") / F.nullif(cnt, F.lit(0)), round_to
            ).alias(f"{m}_avg"),
            F.col(f"{m}_min"),
            F.col(f"{m}_max"),
        ]
    return state.select(*out)
