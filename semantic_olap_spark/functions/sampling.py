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
- ``leakage_safe_split``— split keyed on near-dup CLUSTER labels so
                          duplicates never straddle train/test.
- ``quantile_filter``   — keep the top/bottom q fraction by a score
                          column (quality gating); exact or
                          sketch-based threshold.

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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "leakage_safe_split",
    "mix_corpus",
    "weighted_sample",
    "weighted_sample_n",
    "quantile_filter",
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


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    rate_scale: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic importance sample: keep with P ∝ weight.

    Row kept iff ``u(key) < weight × rate_scale`` (weights ≤ 0 never
    kept; products ≥ 1 always kept) — Poisson/Bernoulli sampling
    proportional to a quality or importance score, the standard
    corpus-downweighting move.  Every operation (md5 uniform, one
    IEEE multiply, one compare) is bit-identical across engines, so
    unlike the ``pow``-based fixed-size scheme below this form
    oracle-replays exactly.  Scan-side filter: pushdown-safe, no
    shuffle, and stable under corpus growth like :func:`hash_sample`.
    """
    w = F.col(weight_col).cast("double")
    return df.filter(
        uniform_hash(F.col(key_col), seed) < w * F.lit(float(rate_scale))
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Fixed-size weighted sample without replacement (A-ES).

    Efraimidis–Spirakis: rank each row by ``u(key)^(1/w)`` and keep
    the top ``n`` — inclusion probability proportional to weight,
    deterministic given the data.  ``orderBy().limit(n)`` compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of n
    rows, no global sort).  Rows with ``w <= 0`` or null never
    qualify.

    Cross-engine caveat (why the driver oracle uses
    :func:`weighted_sample` instead): ``pow`` is libm-dependent in
    its last ulp, so two ranks separated by <1e-15 could order
    differently in another engine.  Within one Spark deployment the
    result is stable; pytest pins determinism and the
    weight-monotone inclusion contract.
    """
    u = uniform_hash(F.col(key_col), seed)
    w = F.col(weight_col).cast("double")
    # Duplicate keys carry identical (_aes_rank, key); a full-row
    # hash tiebreak keeps the limit(n) cut independent of partition
    # scan order.
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    return (
        df.filter(w > 0)
        .withColumn("_aes_rank", F.pow(u, F.lit(1.0) / w))
        .orderBy(
            F.col("_aes_rank").desc(), F.col(key_col).asc(), tiebreak.asc()
        )
        .limit(int(n))
        .drop("_aes_rank")
    )


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


def mix_corpus(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Downsample strata to TARGET proportions (domain mixing).

    ``stratified_sample`` takes per-stratum keep *fractions*;
    ``mix_corpus`` takes the desired output *mixture* (stratum →
    relative weight) and derives the fractions: the largest total T
    achievable without upsampling is ``min_s count_s / w̄_s``
    (``w̄`` = normalized weight), then stratum ``s`` keeps
    ``T·w̄_s / count_s`` — the binding stratum keeps everything,
    the rest downsample.  Strata not in ``weights`` are dropped.

    The count pass is one bounded aggregation (#strata rows to the
    driver — same bounded-artifact class as the enum previews);
    sampling itself is the deterministic scan-side hash filter, so
    the result is a pure function of ``(data, weights, seed)`` and
    carries a full SQL oracle.
    """
    # counts are keyed by the stratum's STRING rendering, so weights
    # keys must be normalized the same way (stratified_sample does
    # str(value) too) — otherwise int/date keys silently match
    # nothing and the result is empty
    weights = {str(k): float(v) for k, v in weights.items()}
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    counts = {
        str(r["_s"]): r["_n"]
        for r in df.groupBy(F.col(strata_col).cast("string").alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    t_max = None
    for s, w in sorted(weights.items()):
        if w <= 0 or s not in counts:
            continue
        cap = counts[s] / (float(w) / total_w)
        t_max = cap if t_max is None else min(t_max, cap)
    if t_max is None:
        return df.filter(F.lit(False))
    fractions = {
        s: min(1.0, t_max * (float(w) / total_w) / counts[s])
        for s, w in weights.items()
        if w > 0 and s in counts
    }
    return stratified_sample(
        df, strata_col, fractions, key_col, seed, default_fraction=0.0
    )


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


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/test split keyed on near-dup cluster, not row id.

    Splitting rows independently leaks near-duplicates across the
    train/test boundary — the classic eval-contamination bug.  Given
    a near-dup pair frame (from ``jaccard_pairs`` /
    ``minhash_lsh_pairs`` / ``cosine_pairs``), cluster it
    (:func:`~semantic_olap_spark.functions.dedup.dedup_clusters`) and
    hash-split on the CLUSTER label (singletons = own id): every
    member of a duplicate cluster lands in the same split.  The
    cluster frame is pair-graph-sized — the join back to the corpus
    broadcasts in the common case.
    """
    from semantic_olap_spark.functions.dedup import dedup_clusters

    clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b).select(
        F.col("doc_id").alias("_cid"), F.col("cluster_id").alias("_cluster")
    )
    tagged = df.join(
        clusters, df[id_col] == clusters["_cid"], "left"
    ).withColumn("_skey", F.coalesce(F.col("_cluster"), F.col(id_col)))
    out = train_test_split(tagged, weights, "_skey", seed, split_col)
    return out.drop("_cid", "_cluster", "_skey")


def quantile_filter(
    df: DataFrame,
    col: str,
    q: float,
    keep: str = "top",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep the top (or bottom) ``q`` fraction of rows by ``col``.

    The quality-gate shape ("keep the best 20% by quality score").
    The threshold is the (1-q) (or q) quantile computed as a 1-row
    aggregate and broadcast back — the whole thing stays one lazy
    plan, no driver collect.  ``exact=True`` uses exact interpolated
    ``percentile`` (a sort-based agg — fine up to billions of rows,
    and required for oracle parity); ``exact=False`` uses
    ``approx_percentile`` (single-pass sketch, the 100 TB default —
    the threshold may differ from exact by the sketch error, which a
    quality gate tolerates).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    p = 1.0 - q if keep == "top" else q
    c = F.col(col).cast("double")
    thr_expr = (
        F.percentile(c, F.lit(p))
        if exact
        else F.percentile_approx(c, F.lit(p), F.lit(accuracy))
    )
    thr = df.agg(thr_expr.alias("_thr"))
    cond = c >= F.col("_thr") if keep == "top" else c <= F.col("_thr")
    from pyspark.sql.functions import broadcast

    return df.crossJoin(broadcast(thr)).filter(cond).drop("_thr")


def reservoir_sample(
    df: DataFrame, n: int, key_col: str, seed: int = 42
) -> DataFrame:
    """Deterministic uniform-n-without-replacement: n smallest hashes.

    Rank-by-hash is the distributed, deterministic analog of
    reservoir sampling: every key's rank is a pure function of
    ``(seed, key)``, and ``orderBy(limit)`` compiles to
    TakeOrderedAndProject — each task keeps a size-n heap, only n
    rows per partition reach the driver merge.  Ties (duplicate
    keys with different payloads) are broken by a full-row hash so
    the cut is independent of partition scan order.
    """
    u = uniform_hash(F.col(key_col), seed)
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    return (
        df.withColumn("_u", u)
        .orderBy(F.col("_u").asc(), F.col(key_col).asc(), tiebreak.asc())
        .limit(int(n))
        .drop("_u")
    )


def shuffle_rows(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: int = 42,
    rank_col: str = "shuffle_rank",
    validate_unique: bool = True,
) -> DataFrame:
    """Deterministic global shuffle: a seeded random-but-reproducible
    total order for training-data writes.

    Training runs need the corpus in a shuffled order that is (a)
    decoupled from ingest order, (b) reproducible across reruns and
    engines, and (c) re-rollable by seed.  The shuffle key is
    ``md5(seed || key_cols)`` — the same keyed-md5 determinism
    contract as :func:`hash_sample`/:func:`train_test_split` — and
    the 0-based ``rank_col`` comes from the parallel
    ``dense_ranks`` construction (range partition + broadcast
    prefix-sum offsets; no single-partition window), so the total
    order survives a 1000-executor table.  Write shards with
    ``df.orderBy(rank_col)`` or feed ``repartitionByRange(rank_col)``
    for contiguous, evenly-sized shards.

    The reproducibility guarantee requires ``key_cols`` to be
    row-UNIQUE: rows with identical keys share one md5 value and
    their relative order would fall to shuffle-fetch interleaving —
    exactly the nondeterminism this op exists to remove.  With the
    default ``validate_unique=True`` that precondition is checked by
    one aggregate (count vs distinct count over the key) and
    violated input raises; pass ``False`` only when uniqueness is
    already guaranteed upstream and the extra job matters.  Null key
    parts are encoded with an explicit sentinel so ``("a", null)``
    and ``(null, "a")`` cannot collide (``concat_ws`` alone would
    silently drop the nulls).
    """
    from semantic_olap_spark.sources.loaders import dense_ranks

    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
        for c in key_cols
    ]
    # Validate on the SAME joined string the md5 consumes — not on
    # struct(cols) — so key tuples that would alias through the
    # separator (values containing "\x1f", or a literal "\x00<null>"
    # colliding with the null sentinel) fail validation instead of
    # silently sharing a shuffle key.
    key_str = F.concat_ws("\x1f", F.lit(str(seed)), *cols)
    if validate_unique:
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(key_str).alias("d"),
        ).collect()[0]
        if row["n"] != row["d"]:
            raise ValueError(
                f"shuffle_rows requires unique key_cols: "
                f"{row['n'] - row['d']} duplicate key rows found for "
                f"{list(key_cols)} — pick a unique key (or add one) "
                f"so the shuffle order is reproducible (keys whose "
                f"string values contain the \\x1f separator count as "
                f"duplicates because they alias in the shuffle key)"
            )
    key = F.md5(key_str)
    tagged = df.withColumn("_shuffle_key", key)
    return dense_ranks(tagged, ["_shuffle_key"], rank_col).drop(
        "_shuffle_key"
    )
