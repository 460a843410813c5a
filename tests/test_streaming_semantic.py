"""Semantic operators composed into Structured Streaming.

Parity contract: an availableNow stream through
``sem_filter``/``sem_map`` must equal the batch operator on the same
parquet — the UDF column is identical, only the execution mode
differs.  Also proves composition with watermarks + windowed
aggregation (classify-then-window) and per-worker LLM cache reuse
across micro-batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.llm.client import wrap_cost_tracking, StubLLM
from semantic_olap_spark.operators.semantic import sem_filter, sem_map
from semantic_olap_spark.streaming import (
    read_documents_stream,
    read_events_stream,
    run_stream_to_table,
    sem_filter_stream,
    sem_map_stream,
)


def test_stream_sem_filter_equals_batch(spark, tables, sf_dir):
    stream = read_documents_stream(spark, sf_dir)
    got = run_stream_to_table(
        sem_filter_stream(stream, ["text"], "rows about spark"),
        spark, "sem_filter_stream",
    )
    want = sem_filter(tables["documents"], ["text"], "rows about spark")
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    assert got.count() > 0


def test_stream_sem_map_equals_batch(spark, tables, sf_dir):
    instr = "doc topic, one of: join, window, scan"
    stream = read_documents_stream(spark, sf_dir)
    got = {
        (r["doc_id"], r["topic"])
        for r in run_stream_to_table(
            sem_map_stream(stream, ["text"], instr, "topic"),
            spark, "sem_map_stream",
        ).collect()
    }
    want = {
        (r["doc_id"], r["topic"])
        for r in sem_map(
            tables["documents"], ["text"], instr, "topic"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_classify_then_window_with_watermark(spark, tables, sf_dir):
    """sem_map label feeding a watermarked windowed count — the
    'classify events as they arrive' composition, vs the batch
    equivalent."""
    instr = "event kind, one of: click, view, purchase"
    stream = sem_map_stream(
        read_events_stream(spark, sf_dir),
        ["event_type"], instr, "kind",
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "kind")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "kind", "n")
    )
    # append mode emits only watermark-closed windows; availableNow
    # over a finite source closes all but the final watermark frontier
    got = {
        (r["day"], r["kind"]): r["n"]
        for r in run_stream_to_table(
            agg, spark, "classify_window"
        ).collect()
    }
    events = tables["events"]
    batch = (
        sem_map(events, ["event_type"], instr, "kind")
        .groupBy(F.window("ts", "1 day").alias("w"), "kind")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "kind", "n")
    )
    want = {(r["day"], r["kind"]): r["n"] for r in batch.collect()}
    # stream ⊆ batch (final frontier may stay open) and every emitted
    # window exact
    assert got, "stream emitted no closed windows"
    for k, n in got.items():
        assert want.get(k) == n, k
    assert len(want) - len(got) <= len({k for k, _ in want})


def test_cache_persists_across_micro_batches(spark, sf_dir):
    """Worker-process LLM caches outlive micro-batches: a 2nd pass of
    identical prompts in later batches costs (near) zero backend
    calls beyond the distinct-prompt count."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    import tempfile

    work = tempfile.mkdtemp(prefix="semstream_")
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    # two files → two micro-batches (maxFilesPerTrigger=1), same 8
    # distinct texts in each
    rows = [(i, f"doc body variant {i % 8}") for i in range(64)]
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(f"{work}/b1.parquet")
    df.coalesce(1).write.parquet(f"{work}/b2.parquet")

    from semantic_olap_spark.llm.client import default_llm_factory

    factory, stats = wrap_cost_tracking(spark, default_llm_factory)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/b*.parquet")
    )
    out = run_stream_to_table(
        sem_filter_stream(stream, ["text"], "variant", factory),
        spark, "cache_stream",
    )
    assert out.count() == 128  # all rows match ('variant' in text)
    assert stats.requests == 128
    # 8 distinct prompts; every worker that saw a batch caches them.
    # local[32] bounds workers; the point is ≪ 128 backend calls.
    assert stats.backend_calls < 64
