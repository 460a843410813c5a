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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
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
