"""Skew-safe aggregation: two-phase salted groupBy.

At 100 TB a single hot key (one language, one boilerplate source)
can put most of a shuffle's rows into one reducer.  AQE's skew-join
splitting covers joins; for AGGREGATIONS over algebraic functions
(count/sum/min/max — and avg as sum/count) the classic fix is
salting: phase 1 groups by (key, salt) so the hot key spreads over
``salt_buckets`` reducers, phase 2 re-aggregates the partials by key
— the second shuffle carries ``salt_buckets`` rows per key, not the
raw rows.

For LOW-skew data this costs an extra (tiny) shuffle; use it when a
key-frequency profile (or a failed stage) says a key dominates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    count_alias: str = "count",
    sum_cols: Sequence[str] = (),
    salt_buckets: int = 32,
    round_to: int | None = 2,
) -> DataFrame:
    """Count + sums per key via salt → partial agg → final agg.

    Output: ``<keys>, <count_alias>, sum_<col>...`` — identical to a
    plain ``groupBy(keys).agg(count, sum...)``, but the first-phase
    shuffle key is ``(keys, salt)`` so no reducer sees more than
    ~1/salt_buckets of any hot key's rows.
    """
    keys = list(keys)
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial_aggs = [F.count(F.lit(1)).alias("_pc")] + [
        F.sum(F.col(c).cast("double")).alias(f"_ps_{c}") for c in sum_cols
    ]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum("_pc").alias(count_alias)]
    for c in sum_cols:
        e = F.sum(f"_ps_{c}")
        if round_to is not None:
            e = F.round(e, round_to)
        final_aggs.append(e.alias(f"sum_{c}"))
    return partial.groupBy(*keys).agg(*final_aggs)
