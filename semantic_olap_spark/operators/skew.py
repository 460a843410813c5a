"""Skew-safe aggregation and joins: salting helpers.

At 100 TB a single hot key (one language, one boilerplate source)
can put most of a shuffle's rows into one reducer.  AQE's skew-join
splitting covers sort-merge joins *when statistics surface in time*;
these helpers are the explicit fixes:

- :func:`salted_agg` — aggregations over algebraic functions
  (count/sum/min/max — avg as sum/count): phase 1 groups by
  (key, salt) so the hot key spreads over ``salt_buckets`` reducers,
  phase 2 re-aggregates the partials by key — the second shuffle
  carries ``salt_buckets`` rows per key, not the raw rows.
- :func:`salted_join` — the skewed-fact ⋈ modest-dim equi-join that
  AQE can't always save (e.g. the dim side is too big to broadcast
  whole but a few fact keys dominate): salt the fact side, replicate
  the dim side once per salt, join on (key, salt).  Row-identical to
  the plain join; the hot key's rows land on ``salt_buckets``
  reducers.

For LOW-skew data these cost an extra (tiny) shuffle or a
``salt_buckets``× dim replication; use them when a key-frequency
profile (or a failed stage) says a key dominates.
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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    Each fact row gets a random salt in ``[0, salt_buckets)``; each
    dim row is replicated once per salt value (an ``explode`` of a
    ``salt_buckets``-element array — map-side, no shuffle of its
    own); the join key becomes ``(on..., salt)``.  The result is
    row-identical to ``fact.join(dim, on, how)`` — every fact row
    still meets every matching dim row exactly once — but a hot key's
    fact rows now hash to ``salt_buckets`` distinct reducers instead
    of one.

    Supported ``how``: inner / left / left_outer (the fact side must
    be the preserved side — a right/full join would multiply
    unmatched dim rows by the replication factor).  Cost: the dim
    shuffle grows ``salt_buckets``×; keep it for dims too big to
    broadcast but far smaller than the fact table.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins (fact side "
            f"preserved), got how={how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    clash = {"_salt"} & (set(fact.columns) | set(dim.columns))
    if clash:
        raise ValueError("input already has a _salt column")
    f_s = fact.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    d_s = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(int(salt_buckets))])),
    )
    return f_s.join(d_s, [*keys, "_salt"], how).drop("_salt")
