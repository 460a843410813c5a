"""SparkSession factory tuned for the semantic-OLAP workload.

Defaults chosen for the analytics/pipeline shape of this engine:

- AQE on (runtime re-planning, skew-join splitting, partition
  coalescing) — essential at 100 TB where static plans misestimate.
- Arrow execution on — every semantic operator is an Arrow-batched
  pandas UDF; row-at-a-time Python serialization would be 10-100×
  slower.
- ``spark.sql.shuffle.partitions`` sized from the caller (tests use
  the local core count; a real cluster should use ~2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def _default_shuffle_partitions() -> int:
    # read at CALL time, like the master below — an import-time
    # snapshot diverges from local[$SPARK_GRAFT_CPUS] if the env var
    # is set after import
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "semantic-olap-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no
    cluster is configured; on a real deployment pass ``None`` with a
    spark-submit-provided master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _default_shuffle_partitions()),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long, loaders convert back (loaders.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
