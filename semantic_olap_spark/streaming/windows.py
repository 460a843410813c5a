"""Structured-Streaming operators: windowed/session aggregation, dedup.

The reference has no streaming at all (SURVEY.md §2.5) — this module
fills that rubric gap with Spark built-ins, written so every
transformation works identically on a batch DataFrame and a
``readStream`` DataFrame (the functions take whichever you pass):

- ``windowed_agg``  — tumbling/sliding event-time windows
  (``F.window``) with count + numeric aggregates.
- ``session_agg``   — gap-based session windows
  (``F.session_window``).
- ``stream_dedup``  — watermarked ``dropDuplicates`` keyed on an id
  column: exactly-once per id within the watermark horizon.
- ``stream_interval_join`` — stream-stream join on keys + a
  time-interval range with watermark-bounded state.
- ``read_events_stream`` — file-source stream over the driver's
  ``events`` parquet directory (schema taken from a batch read), for
  end-to-end streaming tests with an ``availableNow`` trigger.

Batch/stream parity is the test strategy: run the same windowed
aggregation over ``events`` as a stream (availableNow → memory sink)
and as a batch frame, and require identical results — plus a DuckDB
``time_bucket`` oracle for the batch side.

Scale notes: windowed aggregation shuffles on (window, keys) with
map-side partial aggregation; watermarks bound state for late data;
``stream_dedup`` state is bounded by the watermark horizon.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from semantic_olap_spark.operators.deterministic import AGGS


def windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    group_by: Sequence[str] = (),
    agg_col: str | None = None,
    aggs: Sequence[str] = ("sum",),
    watermark: str | None = None,
    round_to: int | None = 2,
) -> DataFrame:
    """Tumbling (or sliding) event-time windowed aggregation.

    Output: ``window_start, window_end, <group cols>, count`` plus
    ``<agg>_<agg_col>`` per requested aggregate.  Works on batch and
    streaming inputs; pass ``watermark`` (e.g. "10 minutes") on
    streams to bound state and admit late data.
    """
    group_by = [group_by] if isinstance(group_by, str) else list(group_by)
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    exprs = [F.count(F.lit(1)).alias("count")]
    if agg_col:
        for a in aggs:
            e = AGGS[a](F.col(agg_col).cast("double"))
            if round_to is not None:
                e = F.round(e, round_to)
            exprs.append(e.alias(f"{a}_{agg_col}"))
    out = df.groupBy(win.alias("_w"), *[F.col(g) for g in group_by]).agg(*exprs)
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *[F.col(g) for g in group_by],
        *[c for c in out.columns if c != "_w" and c not in group_by],
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    group_by: Sequence[str] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (``F.session_window``).

    A session extends while consecutive events of the same keys are
    within ``gap``; output one row per (keys, session) with the
    session bounds and event count.
    """
    group_by = [group_by] if isinstance(group_by, str) else list(group_by)
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(sw.alias("_s"), *[F.col(g) for g in group_by]).agg(
        F.count(F.lit(1)).alias("count")
    )
    return out.select(
        F.col("_s.start").alias("session_start"),
        F.col("_s.end").alias("session_end"),
        *[F.col(g) for g in group_by],
        "count",
    )


def stream_dedup(
    df: DataFrame,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once per id within the watermark horizon.

    On a stream, ``dropDuplicates`` keeps per-key state forever
    unless a watermark bounds it — so the watermark is mandatory
    here; on batch input it's a plain distinct-by-key.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(list(id_cols))
    return df.dropDuplicates(list(id_cols))


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    keys: Sequence[str],
    lookback: str = "10 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) join on keys + a time-interval range.

    Each left row matches right rows with the same ``keys`` and
    ``right_ts`` ∈ [``left_ts`` − ``lookback``, ``left_ts``] — the
    enrichment shape ("join each event to the activity that preceded
    it").  With ``watermark`` set and two streaming inputs this is a
    bounded-state stream-stream join: Spark derives the state
    horizon from the watermark + the range condition and evicts
    buffered rows past it.  On batch frames ``withWatermark`` is a
    no-op and the same code is a plain range join, so stream/batch
    parity holds by construction.

    ``right``'s key columns (and, when it collides with ``left_ts``,
    its timestamp) are renamed ``_r_<name>`` internally; key columns
    are coalesced back to their original name after the join, so
    right-unmatched rows of an outer join keep their key.  A
    colliding ``right_ts`` stays exposed as ``_r_<right_ts>`` in the
    output.  Other column collisions must be renamed upstream.
    """
    ks = list(keys)
    r = right
    rts = right_ts
    if right_ts == left_ts:
        # most natural usage: both streams carry e.g. "ts" — rename
        # right's so the range condition isn't ambiguous
        rts = f"_r_{right_ts}"
        r = r.withColumnRenamed(right_ts, rts)
    for k in ks:
        r = r.withColumnRenamed(k, f"_r_{k}")
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        r = r.withWatermark(rts, watermark)
    cond = (
        (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(rts) <= F.col(left_ts))
    )
    for k in ks:
        cond = (F.col(k) == F.col(f"_r_{k}")) & cond
    out = left.join(r, cond, how)
    for k in ks:
        # right-outer/full rows have NULL left keys; the real key
        # lives in _r_<k> — coalesce before dropping it
        out = out.withColumn(
            k, F.coalesce(F.col(k), F.col(f"_r_{k}"))
        ).drop(f"_r_{k}")
    return out


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the driver's events parquet.

    Schema comes from a bounded batch read (file streams require an
    explicit schema).  Timestamps arrive as TIMESTAMP(NANOS) longs
    (see loaders); converted the same way so stream and batch frames
    are column-identical.
    """
    from semantic_olap_spark.sources.loaders import _nanos_timestamp_cols

    path = f"{sf_dir}/events.parquet"
    # schema must be the RAW on-disk shape (nanos → LongType under
    # nanosAsLong); the timestamp conversion applies on top, exactly
    # as load_table does for batch.  Set the legacy flag here too so
    # the probe works in any session, not just our factory's.
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    # two on-disk layouts: the driver testdata is a single FILE per
    # table (stream the parent dir narrowed by pathGlobFilter — file
    # streams take a directory, and the glob keeps sibling tables'
    # schemas from colliding), while Spark-written tables are a
    # DIRECTORY of part files (stream it directly; a glob of the
    # table name would match zero part files → a silent empty
    # stream, the r6 sf1-replay failure mode)
    import os

    reader = spark.readStream.schema(raw_schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        stream = reader.option(
            "pathGlobFilter", "events.parquet"
        ).parquet(sf_dir)
    for c in nanos_cols:
        # LongType guard mirrors load_table: pyarrow also reports
        # Spark-written INT96 timestamps as timestamp[ns], but Spark
        # reads those as TimestampType — decoding applies only when
        # the column actually surfaced as raw long nanos
        if c in stream.columns and isinstance(
            raw_schema[c].dataType, T.LongType
        ):
            stream = stream.withColumn(
                c, F.expr(f"timestamp_micros(`{c}` div 1000)")
            )
    # TIMESTAMP_NTZ (plain micros, tz-naive) → session TimestampType.
    # STREAMING-ONLY deviation from load_table (which keeps NTZ
    # end-to-end since r7): Spark's event-time machinery hard-requires
    # TIMESTAMP (withWatermark on NTZ fails analysis with
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — verified on 4.1), so
    # streams must interpret naive wall-clocks in the session zone.
    # Under the engine's UTC session pin (session.py) the cast is
    # value-preserving; a non-UTC session zone + a naive source that
    # spans a DST transition is therefore only fully supported on the
    # batch path (tests/test_dst_timestamps.py).
    for f in stream.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            # exact-name resolution (dots in names) — see loaders.py
            stream = stream.withColumn(f.name, stream[f.name].cast("timestamp"))
    return stream
