"""Round-5 review fixes (ADVICE r4), each pinned by a regression test.

1. llm_rerank's max_candidates guard pins the bounded slice
   (persist since r6 — lineage survives executor loss; was
   localCheckpoint in r5), so the candidate producer executes ONCE
   per invocation (previously the guard's count re-ran the whole
   upstream).
2. CLI --load-cube builds the loaded engine directly: --costs works
   (cost_stats threaded through OlapEngine.load) and --order-by
   warns instead of being silently ignored.
3. quantile_state refuses group keys that collide with reserved
   state column names; finalize_quantiles accepts explicit group_by.
4. streaming_anomalies orders null ts/id rows deterministically
   (Spark's ASC NULLS FIRST) instead of crashing on int(NaN) /
   sorting NaN tuples, keeping stream == batch parity.
"""

import datetime as dt
import sys

import pandas as pd
import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from semantic_olap_spark.functions.incremental import (
    finalize_quantiles,
    quantile_state,
)
from semantic_olap_spark.functions.retrieval import llm_rerank
from semantic_olap_spark.streaming.stateful import streaming_anomalies

cloudpickle.register_pickle_by_value(sys.modules[__name__])


# ---- 1. llm_rerank single-execution ------------------------------------


def test_rerank_guard_runs_candidate_producer_once(spark):
    runs = spark.sparkContext.accumulator(0)

    @F.pandas_udf(StringType())
    def tracked_text(s: pd.Series) -> pd.Series:
        runs.add(len(s))
        return s

    base = spark.createDataFrame(
        [(i, f"spark doc {i}") for i in range(20)],
        "doc_id long, text string",
    ).coalesce(1)
    candidates = base.withColumn("text", tracked_text(F.col("text")))
    out = llm_rerank(candidates, "text", "spark", k=5, max_candidates=100)
    assert out.count() == 5
    # guard count + scored run together touch the producer exactly once
    assert runs.value == 20


def test_rerank_guard_still_raises_on_oversize(spark):
    big = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    with pytest.raises(ValueError, match="prescreen"):
        llm_rerank(big, "text", "q", k=3, max_candidates=10)


# ---- 2. CLI --load-cube -------------------------------------------------


@pytest.fixture()
def keep_session(spark, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    return spark


def test_load_cube_costs_and_order_by_warning(keep_session, tmp_path, capsys):
    from semantic_olap_spark.__main__ import main

    cube = str(tmp_path / "cube")
    rc = main([
        "--data", "/root/testdata/sf0.001", "--table", "documents",
        "--order-by", "doc_id", "--save-cube", cube, "--limit", "3",
        "mentions spark in text",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "--data", "/root/testdata/sf0.001", "--load-cube", cube,
        "--order-by", "doc_id", "--costs", "--limit", "3",
        "mentions spark in text",
    ])
    captured = capsys.readouterr()
    assert rc == 0
    assert "--order-by is ignored with --load-cube" in captured.err
    # cost report now prints on the load path (was silently disabled)
    assert "llm_requests" in captured.err


# ---- 3. quantile-state reserved names ----------------------------------


def test_quantile_state_refuses_reserved_group_key(spark):
    df = spark.range(10).select(
        F.col("id").alias("min"), (F.col("id") * 2.0).alias("v")
    )
    with pytest.raises(ValueError, match="reserved"):
        quantile_state(df, "v", 0.0, 20.0, nbins=4, group_by="min")


def test_finalize_quantiles_explicit_group_by(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("v")
    )
    state = quantile_state(df, "v", 0.0, 100.0, nbins=10, group_by="g")
    inferred = finalize_quantiles(state, 0.0, 100.0, qs=(0.5,))
    explicit = finalize_quantiles(
        state, 0.0, 100.0, qs=(0.5,), group_by="g"
    )
    assert sorted(map(tuple, inferred.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    with pytest.raises(ValueError, match="not in state"):
        finalize_quantiles(state, 0.0, 100.0, group_by="nope")


# ---- 4. streaming anomalies with null ts / id --------------------------


def test_stream_equals_batch_with_null_ts_and_id(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", 0, base, 10.0),
        ("a", 1, base + dt.timedelta(minutes=1), 9.5),
        ("a", None, base + dt.timedelta(minutes=2), 10.5),  # null id
        ("a", 3, None, 9.0),                                # null ts
        ("a", 4, base + dt.timedelta(minutes=4), 11.0),
        ("a", 5, base + dt.timedelta(minutes=5), 10.2),
        ("a", 6, base + dt.timedelta(minutes=6), 9.8),
        ("a", 7, base + dt.timedelta(minutes=7), 100.0),
        ("b", 8, None, 50.0),                               # null ts
        ("b", 9, base + dt.timedelta(minutes=9), 51.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, value double"
    )
    src = str(tmp_path / "anom_nulls")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_anomalies(stream, n_prev=4, z=2.0, min_prev=2)
        .writeStream.format("memory").queryName("anom_nulls")
        .outputMode("update").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM anom_nulls").collect()),
        key=str,
    )
    want = sorted(
        map(
            tuple,
            streaming_anomalies(df, n_prev=4, z=2.0, min_prev=2).collect(),
        ),
        key=str,
    )
    assert got == want
