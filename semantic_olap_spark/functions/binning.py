"""Feature binning: exact equal-frequency (quantile) buckets.

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
