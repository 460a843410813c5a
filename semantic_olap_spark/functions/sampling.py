"""Deterministic sampling & splitting for training-data pipelines.

Beyond-reference operators (SURVEY.md §7.1 M7 family).  Spark's own
``df.sample`` / ``sampleBy`` / ``randomSplit`` draw from per-partition
XORShift streams: results change with partitioning, task retries, and
cluster size — unacceptable for the one thing sampling is used for in
a 100 TB corpus pipeline: *reproducible* subsets and train/test
splits.  Everything here derives randomness from a content hash of a
key column instead:

- ``uniform_hash``      — U[0,1) from ``md5(seed:key)``; the shared
                          primitive, pure Catalyst.
- ``hash_sample``       — deterministic Bernoulli(fraction) sample.
- ``stratified_sample`` — per-stratum fractions (quota sampling).
- ``train_test_split``  — disjoint, exhaustive split labels from
                          cumulative weight ranges.
- ``reservoir_sample``  — "uniform n without replacement": the n
                          smallest hash values (rank-by-hash), a
                          TakeOrderedAndProject — no shuffle of the
                          full data, n rows per partition reach the
                          driver-side merge.

Properties that matter at scale: a row's fate depends only on
``(seed, key)`` — stable under repartitioning, AQE re-planning,
speculative re-execution, and incremental reruns over grown corpora
(rows sampled yesterday stay sampled today).  Every operator is a
scan-side filter/label: predicate pushdown survives, no shuffle, no
Python.  The md5-derived uniform is reproducible in ANSI SQL, so each
operator carries a full DuckDB value-hash oracle in the driver
contract (``__spark_entry__.py``) — none of this is
rows-only-checked.

The reference has no sampling surface at all (its only sampling is
``pandas .sample`` inside sem_topk/filter_pattern,
Semantic-OLAP/Agents/Components/Operaters.py:213,465); this module is
part of the §2.5 "what a large-scale pipeline needs" gap-fill.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "reservoir_sample",
    "stratified_sample",
    "train_test_split",
    "uniform_hash",
]

# 2^32 — the hash uniform uses the first 8 hex chars (32 bits)
_SCALE = float(1 << 32)


def uniform_hash(key: Column, seed: int = 42) -> Column:
    """Deterministic U[0,1) from ``(seed, key)``.

    ``md5`` is engine-portable (bit-identical in Spark and DuckDB, so
    the oracle can replay it) and mixes far better than the key's own
    distribution — sequential ids map to i.i.d.-looking uniforms.
    First 8 hex chars → 32-bit int → divide by 2^32.  Rows with equal
    keys get equal uniforms by design: sampling is per *identity*,
    not per occurrence.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_SCALE)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with u(key) < fraction.

    Unlike ``df.sample`` the result is a pure function of the data —
    rerunning on a re-partitioned, re-bucketed, or grown corpus keeps
    every previously-sampled row.  Scan-side filter: pushdown-safe,
    zero shuffle.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(uniform_hash(F.col(key_col), seed) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy``, reproducible).

    ``fractions`` maps stratum value → keep fraction; strata not
    listed keep ``default_fraction``.  The standard corpus-mixture
    tool: downsample boilerplate-heavy sources, keep all of rare
    high-quality ones.  Still one scan-side filter — the fraction
    lookup compiles to a CASE chain, no join.
    """
    frac: Column = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        frac = F.when(
            F.col(strata_col).cast("string") == str(value), F.lit(float(f))
        ).otherwise(frac)
    return df.filter(uniform_hash(F.col(key_col), seed) < frac)


def train_test_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Attach a split label from cumulative weight ranges of u(key).

    ``weights`` maps label → relative weight (normalized internally);
    labels partition [0,1) in sorted-label order, so every row gets
    exactly one label (disjoint + exhaustive) and membership is
    stable under corpus growth.  Returns ``df`` + ``split_col``;
    filter on it for a concrete split.  Equal keys land in the same
    split — the property that prevents near-dup train/test leakage
    when the key is a content fingerprint.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = uniform_hash(F.col(key_col), seed)
    expr: Column | None = None
    cum = 0.0
    items = sorted(weights.items())
    for label, w in items[:-1]:
        cum += float(w) / total
        expr = (
            F.when(u < cum, F.lit(label))
            if expr is None
            else expr.when(u < cum, F.lit(label))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def reservoir_sample(
    df: DataFrame, n: int, key_col: str, seed: int = 42
) -> DataFrame:
    """Deterministic uniform-n-without-replacement: n smallest hashes.

    Rank-by-hash is the distributed, deterministic analog of
    reservoir sampling: every key's rank is a pure function of
    ``(seed, key)``, and ``orderBy(limit)`` compiles to
    TakeOrderedAndProject — each task keeps a size-n heap, only n
    rows per partition reach the driver merge.  Ties (duplicate
    keys) are broken by the key itself for full determinism.
    """
    u = uniform_hash(F.col(key_col), seed)
    return (
        df.withColumn("_u", u)
        .orderBy(F.col("_u").asc(), F.col(key_col).asc())
        .limit(int(n))
        .drop("_u")
    )
