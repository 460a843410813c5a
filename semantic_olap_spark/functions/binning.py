"""Feature engineering: exact quantile buckets and target encoding.

Equal-frequency binning is the standard feature-engineering
discretization (and the rank transform behind calibration curves and
WOE encoding).  The naive Spark spelling — ``ntile(n) OVER (ORDER BY
col)`` — funnels the table through ONE task; the approximate
spelling (``approx_percentile`` edges + CASE) is fast but its float
edges are engine- and sample-dependent, so results aren't
reproducible.  This implementation is both parallel and exact:

    bucket = floor(rank × n / count)

with ``rank`` from the :func:`dense_ranks` zipWithIndex construction
(range-partition + broadcast prefix-sum offsets — no single-
partition window) over a total order made deterministic by a
tiebreak key.  All-integer bucket math → bit-identical across
engines; buckets differ in size by at most 1 row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_olap_spark.sources.loaders import dense_ranks_with_total


def quantile_bucket(
    df: DataFrame,
    col: str,
    n_buckets: int,
    tiebreak: str,
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each row an equal-frequency bucket in ``[0, n_buckets)``.

    ``tiebreak`` must (with ``col``) give a total order — equal
    values split deterministically by it, which is what makes the
    result a pure function of the data (and lets the driver oracle
    mirror it with ``row_number``).

    The bucket expression uses SQL ``div`` (true integer division),
    not float divide-and-floor: floor-of-double disagrees with
    integer division once rank×n approaches 2^53 — exactly the
    scale this module's bit-identical claim must survive.  The row
    total falls out of the rank construction's own count pass (no
    second job).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    ranked, total = dense_ranks_with_total(df, [col, tiebreak], "_qb_rank")
    if total == 0:
        return ranked.withColumn(
            out_col, F.lit(None).cast("int")
        ).drop("_qb_rank")
    return ranked.withColumn(
        out_col,
        F.expr(
            f"(_qb_rank * {int(n_buckets)}) div {int(total)}"
        ).cast("int"),
    ).drop("_qb_rank")


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    out_col: str = "te",
    round_to: int = 6,
) -> DataFrame:
    """Leave-one-out target encoding of a categorical column.

    Each row gets the mean of ``target_col`` over the OTHER rows of
    its category — the standard high-cardinality categorical encoder,
    leave-one-out so a row never sees its own label (the leakage the
    naive per-category mean suffers).  Categories with a single row
    (nothing to leave out) fall back to the global mean.

    Exactness: category sums are decimal (order-independent), the
    final divide is exact-decimal-sum→double over an integer count —
    the same determinism recipe as the driver's aggregate oracles,
    so the whole encoding hash-matches across engines.

    Scale shape: one map-side-combined ``groupBy(category)`` whose
    output (one row per category) broadcasts back onto the data — the
    big frame never shuffles.  Null targets contribute nothing and
    encode to the mean of their category's non-null rows.
    """
    dec = F.col(target_col).cast("decimal(38,6)")
    stats = df.groupBy(category_col).agg(
        F.sum(dec).alias("_te_sum"),
        F.count(F.col(target_col)).alias("_te_n"),
    )
    glob = df.groupBy().agg(
        F.sum(dec).alias("_te_gsum"),
        F.count(F.col(target_col)).alias("_te_gn"),
    )
    joined = df.join(F.broadcast(stats), category_col, "left").crossJoin(
        F.broadcast(glob)
    )
    y = F.col(target_col).cast("decimal(38,6)")
    global_mean = F.col("_te_gsum").cast("double") / F.col("_te_gn")
    loo = (F.col("_te_sum") - F.coalesce(y, F.lit(0).cast("decimal(38,6)"))).cast(
        "double"
    ) / (F.col("_te_n") - F.when(F.col(target_col).isNotNull(), 1).otherwise(0))
    n_others = F.col("_te_n") - F.when(
        F.col(target_col).isNotNull(), 1
    ).otherwise(0)
    return (
        joined.withColumn(
            out_col,
            F.round(
                F.when(n_others > 0, loo).otherwise(global_mean), round_to
            ),
        )
        .drop("_te_sum", "_te_n", "_te_gsum", "_te_gn")
    )
