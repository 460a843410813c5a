"""Bucketed table helpers: shuffle-free co-located joins.

At 100 TB the dominant join cost is the shuffle.  Writing both sides
bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side — the co-location is
established once at write time and amortized over every subsequent
join.  This is the deploy-time layout SCALE.md prescribes for the
fact tables (`lineitem`/`orders` on orderkey, the embedding corpus
on its IVF cell).

Bucketed tables must live in the session catalog
(``saveAsTable``) — plain ``parquet(path)`` cannot record bucket
metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    writer = df.write.mode(mode).bucketBy(buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
