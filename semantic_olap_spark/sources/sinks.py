"""Sinks: partitioned batch writes, small-file compaction, stream sinks.

The reference's only sinks are Streamlit tables and a TCP log socket
(SURVEY.md §2.5 — Semantic-OLAP/pages/Cube.py:61-63,
Utils/send_logs.py:7-15); a Spark engine feeding a 100 TB lakehouse
needs the real ones:

- ``write_partitioned`` — hive-layout parquet with bounded file
  sizes.  Partition pruning on read is free thereafter; the
  ``max_records_per_file`` bound stops any single task from emitting
  a multi-GB file that later becomes one unsplittable-ish scan unit
  (parquet row groups split, but memory spikes at write time don't).
- ``compact`` — the small-files repair job.  Streaming ingest and
  fine-grained partitioning leave thousands of KB-sized files per
  partition; NameNode/listing pressure and per-file open cost then
  dominate scans.  Reads the source layout, rewrites it with
  size-targeted files, preserves the partition columns.
- ``write_stream_parquet`` — exactly-once file sink for Structured
  Streaming: parquet + checkpointed WAL, the production counterpart
  of the in-memory sinks the tests use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


_FORMATS = ("parquet", "orc", "json")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
    sort_within_partitions: list[str] | None = None,
    format: str = "parquet",
) -> None:
    """Write hive-partitioned columnar files with bounded file sizes.

    ``sort_within_partitions`` clusters rows inside each file (no
    extra shuffle — ``sortWithinPartitions`` is task-local), which
    tightens min/max column stats so later range predicates skip
    whole row groups (parquet) / stripes (orc).  ``format``:
    ``parquet`` (default) or ``orc`` — both are Spark-native columnar
    formats with predicate pushdown and identical partition-pruning
    behavior, so the choice is an interop decision (Hive/Trino
    estates are often ORC), not a capability one.  ``json`` writes
    newline-delimited JSON — the corpus-interchange export (no
    pushdown on read-back; columnar formats remain the query-side
    layout).
    """
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    out = df
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, format)(path)


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_records_per_file: int = 1_000_000,
    partition_by: list[str] | None = None,
    format: str = "parquet",
) -> None:
    """Rewrite a parquet layout with size-targeted files.

    ``dst`` must differ from ``src``: Spark cannot overwrite a path
    it is reading lazily (the scan would observe its own deletes), so
    compaction is write-new-then-swap — the swap (atomic rename /
    catalog pointer flip) is the deployment's job, and keeping it
    out of this function is what makes the rewrite idempotent and
    safely re-runnable.

    Partition columns are auto-detected from the hive layout when
    ``partition_by`` is None, so ``compact(spark, p, q)`` preserves
    the source layout by default.  File count per partition comes
    from ``maxRecordsPerFile``; AQE coalescing keeps the shuffle-free
    path (no repartition — compaction must not pay a full shuffle
    just to merge files; the writer splits oversized tasks instead).
    """
    if src.rstrip("/") == dst.rstrip("/"):
        raise ValueError(
            "compact cannot rewrite a path onto itself (the lazy scan "
            "would observe its own deletes); write to a new path and "
            "swap atomically"
        )
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    df = getattr(spark.read, format)(src)
    if partition_by is None:
        # hive-layout partition columns: present in the schema but
        # sourced from directory names — detect via the file listing
        first = df.inputFiles()
        partition_by = [
            seg.split("=", 1)[0]
            for seg in (first[0].split("/") if first else [])
            if "=" in seg
        ]
    write_partitioned(
        df,
        dst,
        partition_by=partition_by or None,
        max_records_per_file=target_records_per_file,
        format=format,
    )


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = False,
    partition_by: list[str] | None = None,
):
    """Start an exactly-once parquet file sink for a streaming frame.

    The checkpoint directory carries the WAL + state store; the file
    sink's manifest makes output files exactly-once under restart.
    ``trigger_once=True`` uses availableNow — drain-everything-then-
    stop, the batch-parity mode the tests use.  Returns the
    StreamingQuery (caller owns ``awaitTermination``/``stop``).
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    rows_per_shard: int = 100_000,
    seed: int = 42,
    mode: str = "overwrite",
    format: str = "parquet",
) -> dict:
    """Write deterministic, shuffled, fixed-size training shards.

    The training-data last mile: a seeded global shuffle
    (:func:`semantic_olap_spark.functions.sampling.shuffle_rows` —
    md5(seed||keys) order, parallel dense ranks) sliced into
    contiguous shards of ``rows_per_shard`` rows, written as
    ``shard=K/`` hive directories so a trainer (or a later Spark
    read) can address shards individually.  Re-running with the same
    seed and corpus reproduces the exact same shard contents — the
    property data loaders rely on for resumable epochs.

    One file per shard: the frame is repartitioned BY the shard id
    (hash partitioning on the already-assigned id, not a range sort)
    so each task writes exactly one shard sequentially, ordered by
    rank via a task-local sort.  Returns a manifest dict
    ``{n_rows, n_shards, rows_per_shard, seed, shards: [{shard,
    rows, min_rank, max_rank}, ...]}`` — also written as
    ``_manifest.json`` next to the data, because a trainer needs the
    shard census without listing the directory.
    """
    import json
    import math

    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.sampling import shuffle_rows

    if rows_per_shard < 1:
        raise ValueError(
            f"rows_per_shard must be >= 1, got {rows_per_shard}"
        )
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    ranked = shuffle_rows(df, key_cols, seed=seed)
    sharded = ranked.withColumn(
        "shard", (F.col("shuffle_rank") / rows_per_shard).cast("long")
    )
    n_shards_hint = max(
        sharded.sparkSession.sparkContext.defaultParallelism, 1
    )
    (
        sharded.repartition(n_shards_hint, "shard")
        .sortWithinPartitions("shard", "shuffle_rank")
        .write.mode(mode)
        .partitionBy("shard")
        .format(format)
        .save(path)
    )
    stats = sorted(
        (r["shard"], r["rows"], r["min_rank"], r["max_rank"])
        for r in sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("shuffle_rank").alias("min_rank"),
            F.max("shuffle_rank").alias("max_rank"),
        )
        .collect()
    )
    n_rows = sum(s[1] for s in stats)
    manifest = {
        "n_rows": n_rows,
        "n_shards": len(stats),
        "rows_per_shard": rows_per_shard,
        "seed": seed,
        "expected_shards": math.ceil(n_rows / rows_per_shard) if n_rows else 0,
        "shards": [
            {"shard": int(s), "rows": int(r), "min_rank": int(a),
             "max_rank": int(b)}
            for s, r, a, b in stats
        ],
    }
    jvm_path = path.rstrip("/") + "/_manifest.json"
    # write via the driver-side filesystem only for local paths; on
    # object stores callers pass the manifest to their own writer
    try:
        with open(jvm_path.replace("file:", ""), "w") as fh:
            json.dump(manifest, fh, indent=1)
    except OSError:
        pass
    return manifest
