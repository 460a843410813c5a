"""Custom stateful streaming: running per-key aggregates.

``applyInPandasWithState`` is the escape hatch for stateful logic the
built-in windowed/session aggregations can't express.  The operator
here maintains *running per-key statistics* (event count, value sum,
last-seen timestamp) that update with every micro-batch and emit the
CURRENT running value each time a key receives events — the shape a
monitoring/feature pipeline needs (built-in aggregations emit final
window results, not running values per batch).

State is one tiny tuple per key, bounded by key cardinality;
``GroupStateTimeout`` is left off because the running totals are
meant to live for the stream's lifetime (add ProcessingTimeTimeout
and ``state.setTimeoutDuration`` to age keys out).

On a BATCH input the same semantics degrade to a plain groupBy — the
function handles both so tests can assert stream/batch parity.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

def _out_schema(key_type) -> StructType:
    # key column keeps its REAL type — a hardcoded LongType would
    # break the stream path for string/other key columns while the
    # batch path silently worked
    return StructType(
        [
            StructField("user_id", key_type),
            StructField("running_count", LongType()),
            StructField("running_sum", DoubleType()),
        ]
    )


_STATE_SCHEMA = StructType(
    [
        StructField("count", LongType()),
        StructField("sum", DoubleType()),
    ]
)


def _update(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (count, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((count, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "running_count": [count],
            "running_sum": [round(total, 2)],
        }
    )


def running_user_stats(
    df: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (count, sum) — stateful on streams.

    Streaming input: ``applyInPandasWithState`` keeps one state tuple
    per user across micro-batches and emits the updated running
    totals for users seen in each batch (output mode ``update``).
    Batch input: equivalent one-shot groupBy (stream/batch parity is
    the test contract).
    """
    renamed = df.select(
        F.col(user_col).alias("user_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    if not df.isStreaming:
        return renamed.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("running_count"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2)
            .alias("running_sum"),
        )
    return renamed.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_out_schema(df.schema[user_col].dataType),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- streaming rolling z-score anomalies ------------------------------


def _anom_out_schema(key_type) -> StructType:
    from pyspark.sql.types import BooleanType

    return StructType(
        [
            StructField("user_id", key_type),
            StructField("event_id", LongType()),
            StructField("ts", DoubleType()),
            StructField("value", DoubleType()),
            StructField("prev_n", LongType()),
            StructField("zscore", DoubleType()),
            StructField("is_anomaly", BooleanType()),
        ]
    )


def streaming_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    user_col: str = "user_id",
    id_col: str = "event_id",
    n_prev: int = 20,
    z: float = 3.0,
    min_prev: int = 5,
) -> DataFrame:
    """Rolling z-score outliers, stateful across micro-batches.

    The streaming counterpart of
    :func:`~semantic_olap_spark.functions.timeseries.detect_anomalies`:
    state is the trailing ``n_prev`` value slots per key (nulls
    occupy positions but never count, matching the batch row frame)
    — O(n_prev) per key, independent of stream length — and every event
    in a micro-batch is scored against the deque as of just before
    it (the current value never enters its own frame), then pushed.

    Parity contract (the test contract): results equal the batch
    operator whenever batch boundaries respect event time, because
    events are sorted by ``(ts, id)`` within each batch and the
    deque carries across batches.  The score math reproduces the
    batch operator's bit-for-bit: values quantized to decimal(18,6)
    exactly as Spark's double→decimal cast (repr-based HALF_UP),
    exact decimal Σv/Σv², the same fixed double formula, HALF_UP
    rounding.

    Batch input: delegates to ``detect_anomalies`` and returns the
    same column shape (``ts`` as unix-seconds double — the streaming
    state schema's type).
    """
    if n_prev < 2 or min_prev < 2:
        raise ValueError("n_prev and min_prev must be >= 2")
    # unix-seconds double for the state schema: NTZ inputs use naive
    # wall-clock micros (session-tz invariant, DST-safe — same rule
    # as functions/timeseries.py ts_micros); instants keep the
    # absolute cast.  Both the batch delegate and the streaming state
    # path read this one expression, so the twins stay bit-identical.
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        from semantic_olap_spark.functions.timeseries import (
            naive_micros_sql,
        )

        ts_sec = (
            F.expr(naive_micros_sql(f"`{ts_col}`")) / F.lit(1_000_000.0)
        ).cast("double")
    else:
        ts_sec = F.col(ts_col).cast("timestamp").cast("double")
    renamed = df.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).cast("long").alias("event_id"),
        ts_sec.alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    if not df.isStreaming:
        from semantic_olap_spark.functions.timeseries import detect_anomalies

        return detect_anomalies(
            renamed, "ts", "value", "user_id",
            n_prev=n_prev, z=z, min_prev=min_prev, order_by=["event_id"],
        ).select(
            "user_id", "event_id", "ts", "value",
            "prev_n", "zscore", "is_anomaly",
        )

    import math
    from decimal import ROUND_HALF_UP, Context, Decimal

    ctx = Context(prec=60)
    q6 = Decimal("1e-6")

    def _score(slots, v):
        # slots mirror the batch operator's row frame: nulls occupy
        # positions but never count
        values = [x for x in slots if x is not None]
        n = len(values)
        if v is None or n < min_prev:
            return n, None, False
        s = Decimal(0)
        ss = Decimal(0)
        for x in values:
            xd = Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP)
            s = ctx.add(s, xd)
            ss = ctx.add(ss, ctx.multiply(xd, xd))
        s_d, ss_d, nd = float(s), float(ss), float(n)
        var = max(ss_d - s_d * s_d / nd, 0.0) / (nd - 1.0)
        if not var > 0:
            return n, None, False
        raw = (v - s_d / nd) / math.sqrt(var)
        zr = float(
            Decimal(repr(raw)).quantize(q6, rounding=ROUND_HALF_UP)
        )
        return n, zr, abs(zr) > z

    def _sort_key(e):
        # mirror Spark's ASC NULLS FIRST for (ts, event_id): the
        # batch twin sorts with orderBy(ts.asc(), event_id.asc()), so
        # a null ts/id must order deterministically FIRST here too —
        # a raw tuple sort over NaN floats is nondeterministic and
        # int(NaN) crashes outright
        eid, ts, _ = e
        ts_null = pd.isna(ts)
        eid_null = pd.isna(eid)
        return (
            0 if ts_null else 1, 0.0 if ts_null else float(ts),
            0 if eid_null else 1, 0 if eid_null else int(eid),
        )

    def update(key, pdfs, state: GroupState):
        deque = list(state.get[0]) if state.exists else []
        events = []
        for pdf in pdfs:
            events.extend(
                zip(pdf["event_id"], pdf["ts"], pdf["value"])
            )
        events.sort(key=_sort_key)
        out = {"event_id": [], "ts": [], "value": [],
               "prev_n": [], "zscore": [], "is_anomaly": []}
        for eid, ts, v in events:
            v = None if pd.isna(v) else float(v)
            prev_n, zr, flag = _score(deque, v)
            out["event_id"].append(None if pd.isna(eid) else int(eid))
            out["ts"].append(None if pd.isna(ts) else float(ts))
            out["value"].append(v)
            out["prev_n"].append(prev_n)
            out["zscore"].append(zr)
            out["is_anomaly"].append(flag)
            deque.append(v)
            if len(deque) > n_prev:
                deque.pop(0)
        state.update((deque,))
        frame = pd.DataFrame(out)
        frame["event_id"] = pd.array(out["event_id"], dtype="Int64")
        frame.insert(0, "user_id", key[0])
        yield frame

    return renamed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_anom_out_schema(df.schema[user_col].dataType),
        stateStructType=StructType(
            [StructField("recent", ArrayType(DoubleType()))]
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- stateful streaming funnel ----------------------------------------

from pyspark.sql.types import ArrayType, IntegerType  # noqa: E402


def _funnel_out_schema(key_type) -> StructType:
    return StructType(
        [
            StructField("user_id", key_type),
            StructField("stage", IntegerType()),
            StructField("reached_ts", DoubleType()),
        ]
    )


_FUNNEL_STATE_SCHEMA = StructType(
    [StructField("reached", ArrayType(DoubleType()))]
)


def streaming_funnel(
    df: DataFrame,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progression, stateful across micro-batches.

    The streaming counterpart of
    :func:`~semantic_olap_spark.functions.analytics.funnel`: state is
    one ``reached[i]`` timestamp per step per user (earliest time the
    user completed step ``i`` with the strict-after chaining rule);
    each micro-batch advances users and emits their CURRENT
    ``(stage, reached_ts)`` (output mode ``update``).  Output rows:
    one per user seen in the batch.

    Ordering contract: events are chained in timestamp order WITHIN
    each micro-batch, so results equal the batch funnel whenever
    batch boundaries respect event time (availableNow over ordered
    files, or any time-partitioned source).  An event arriving out
    of order ACROSS batches cannot retroactively re-chain steps that
    depended on it — the standard streaming-funnel approximation;
    state stays O(#steps) per user regardless.

    Batch input: exact one-shot computation via the same equi-join
    chain as :func:`funnel`, returning the same per-user shape —
    stream/batch parity on ordered input is the test contract.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    n_steps = len(steps)
    idx = {name: i for i, name in enumerate(steps)}

    # epoch-of-WALL-CLOCK seconds, session-timezone-proof.  NTZ input
    # (the loader shape since r7): pure field extraction via
    # naive_micros_sql — the r6-era
    # from_utc_timestamp(cast(ts), current_timezone()) construction
    # recovered wall-clock epochs under any CONSTANT offset but still
    # shifted spring-forward gap wall-clocks by an hour, because the
    # inner cast interprets the naive value in the session zone
    # before the offset is undone (caught by the r7 DST sweep,
    # tests/test_dst_timestamps.py::funnel_stages).  Instant input
    # keeps the from_utc construction (its documented purpose).
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        from semantic_olap_spark.functions.timeseries import (
            naive_micros_sql,
        )

        ts_expr = (
            F.expr(naive_micros_sql(f"`{ts_col}`")) / F.lit(1_000_000.0)
        ).cast("double")
    else:
        ts_expr = F.expr(
            f"cast(from_utc_timestamp(cast(`{ts_col}` as timestamp), "
            f"current_timezone()) as double)"
        )
    renamed = df.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("user_id"),
        ts_expr.alias("_ts"),
        F.col(type_col).alias("_et"),
    )

    if not df.isStreaming:
        from semantic_olap_spark.caching import tracked_persist

        # same scan diet as functions/analytics.py::funnel: each
        # stage's reached-set feeds BOTH its union branch and the
        # next stage's chaining join — without the persist the k
        # branches re-execute the whole prior chain, O(k²) scans of
        # the raw events source (measured: 6 parquet scan nodes for
        # 3 steps before this, k cached stage aggs after).  Tracked:
        # released by the caller via caching.release_caches().
        renamed = tracked_persist(renamed)
        prev = None
        stages = []
        for i, name in enumerate(steps):
            stage = renamed.filter(F.col("_et") == name).select(
                "user_id", "_ts"
            )
            if prev is not None:
                stage = stage.join(prev, "user_id").filter(
                    F.col("_ts") > F.col("_prev_ts")
                )
            reached = tracked_persist(
                stage.groupBy("user_id").agg(
                    F.min("_ts").alias("_prev_ts")
                )
            )
            stages.append(
                reached.select(
                    "user_id",
                    F.lit(i + 1).alias("stage"),
                    F.col("_prev_ts").alias("reached_ts"),
                )
            )
            prev = reached
        from functools import reduce as _reduce

        all_stages = _reduce(DataFrame.unionByName, stages)
        w = Window.partitionBy("user_id").orderBy(F.col("stage").desc())
        return (
            all_stages.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def update(key, pdfs, state: GroupState):
        reached = (
            list(state.get[0]) if state.exists else [None] * n_steps
        )
        events = []
        for pdf in pdfs:
            events.extend(zip(pdf["_ts"], pdf["_et"]))
        events.sort(key=lambda e: e[0])
        for ts, et in events:
            i = idx[et]
            if i == 0:
                if reached[0] is None or ts < reached[0]:
                    reached[0] = ts
            elif reached[i - 1] is not None and ts > reached[i - 1]:
                if reached[i] is None or ts < reached[i]:
                    reached[i] = ts
        state.update((reached,))
        stage = 0
        for i in range(n_steps):
            if reached[i] is None:
                break
            stage = i + 1
        # stage 0 = the user never entered the funnel (only
        # out-of-chain events so far): emit nothing, matching the
        # batch path, which has no row for such users
        if stage:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "stage": [stage],
                    "reached_ts": [reached[stage - 1]],
                }
            )

    return renamed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_funnel_out_schema(df.schema[user_col].dataType),
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
