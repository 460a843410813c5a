"""Semantic operators inside Structured Streaming.

"Classify events as they arrive" is the first thing a semantic-OLAP
user tries on a stream.  The batch semantic operators
(operators/semantic.py) are pure column expressions over Arrow
pandas UDFs, and Spark evaluates those identically in micro-batch
streaming — so ``sem_filter``/``sem_map`` need no streaming rewrite,
only a proven composition.  This module supplies the stream source
for the driver's ``documents`` table and thin, documented appliers,
plus availableNow runners the parity tests and driver row use.

Semantics worth writing down (tested in
tests/test_streaming_semantic.py):

- **Stateless ⇒ watermark-free.**  ``sem_filter``/``sem_map`` are
  per-row: they neither hold state nor care about event time, so
  they compose BEFORE or AFTER watermarks and windowed aggregates
  freely.  A windowed aggregate over LLM-assigned labels is just
  ``sem_map_stream(...)`` piped into the usual
  ``withWatermark(...).groupBy(window(...), label)``.
- **Per-batch LLM cache.**  Each executor worker process keeps its
  ``CachingLLM`` memo for the lifetime of the *process*, not the
  micro-batch: across micro-batches the same worker reuses cached
  judgments (prompt-keyed), so a hot label vocabulary converges to
  near-zero backend calls.  There is no cross-worker sharing — at
  1000 executors the cache hit rate is per-worker; size the backend
  rate limit (llm/http_client.py) for the cold-start burst.
- **Retry storms.**  With the HTTP backend, transient 429/5xx inside
  a micro-batch retry in-place (bounded backoff); a task that
  exhausts retries fails the batch, and the stream's checkpoint
  replays it — exactly-once result, at-least-once LLM calls.  Keep
  semantic judgments deterministic (temperature 0) so replays are
  idempotent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_olap_spark.llm.client import LLMFactory, default_llm_factory
from semantic_olap_spark.operators import semantic as sem

__all__ = [
    "read_documents_stream",
    "sem_filter_stream",
    "sem_map_stream",
    "run_stream_to_table",
]


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the driver's documents parquet.

    Mirrors ``read_events_stream`` (windows.py): schema from a
    bounded batch read, directory source narrowed by pathGlobFilter.
    ``documents`` carries no timestamps, so no nanos handling.
    """
    path = f"{sf_dir}/documents.parquet"
    raw_schema = spark.read.parquet(path).schema
    # single-file table → stream the parent dir with a glob; a
    # Spark-written DIRECTORY table streams directly (a glob of the
    # table name matches zero part files → silent empty stream) —
    # same layout dispatch as read_events_stream (windows.py)
    import os

    reader = spark.readStream.schema(raw_schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option(
        "pathGlobFilter", "documents.parquet"
    ).parquet(sf_dir)


def sem_filter_stream(
    stream: DataFrame,
    columns: Sequence[str],
    condition: str,
    llm_factory: LLMFactory = default_llm_factory,
    retain_if: bool = True,
) -> DataFrame:
    """``sem_filter`` applied to a streaming frame.

    Identical semantics to the batch operator — the same Arrow UDF
    column runs per micro-batch.  Stateless: safe at any position in
    the streaming query (before/after watermarks, under windowed
    aggregation).
    """
    return stream.filter(
        sem.sem_filter_cond(columns, condition, llm_factory, retain_if)
    )


def sem_map_stream(
    stream: DataFrame,
    columns: Sequence[str],
    map_description: str,
    keyword: str,
    llm_factory: LLMFactory = default_llm_factory,
) -> DataFrame:
    """``sem_map`` applied to a streaming frame (adds ``keyword``)."""
    return sem.sem_map(stream, columns, map_description, keyword, llm_factory)


def run_stream_to_table(
    stream: DataFrame, spark: SparkSession, name: str,
    timeout_sec: int = 300,
    output_mode: str = "append",
) -> DataFrame:
    """Drain a (bounded) stream into a memory sink; return the table.

    availableNow + memory sink: processes everything currently in the
    source and stops — the batch-parity harness.  Memory sinks hold
    the result on the DRIVER: strictly a test/driver-contract tool,
    never a production sink (write parquet/kafka there).  Appends a
    monotone suffix so repeated calls in one session don't collide.
    Stateful operators (``applyInPandasWithState``) emit in
    ``update`` mode — pass ``output_mode="update"`` for those.
    """
    qname = f"{name}_{run_stream_to_table._seq}"
    run_stream_to_table._seq += 1
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(qname)


run_stream_to_table._seq = 0
