"""Streaming rolling z-score anomalies (streaming/stateful.py).

Parity contract: the availableNow stream equals the batch operator
(detect_anomalies) bit-for-bit whenever batch boundaries respect
event time — single-batch and time-split multi-batch both pinned.
State is the trailing n_prev value slots per key; nulls occupy
positions but never count, matching the batch row frame.
"""

import datetime as dt

import pytest

from semantic_olap_spark.streaming.stateful import streaming_anomalies


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (u, i, base + dt.timedelta(minutes=i), v)
        for i, (u, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "user_id string, event_id long, ts timestamp, value double"
    )


def _series():
    a = [("a", v) for v in
         [10.0, 9.5, 10.5, 9.0, 11.0, 10.2, 9.8, 10.7, 9.3, 100.0, 10.1]]
    b = [("b", v) for v in
         [50.0, 51.0, 49.0, 50.5, 49.5, 50.2, 5.0, 50.1]]
    return a + b


def _key(r):
    return (r["user_id"], r["event_id"])


def test_stream_equals_batch_single_batch(spark, tmp_path):
    df = _events(spark, _series())
    src = str(tmp_path / "anom_single")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_anomalies(stream, n_prev=8, z=3.0, min_prev=5)
        .writeStream.format("memory").queryName("anom_single")
        .outputMode("update").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = {
        _key(r): tuple(r)
        for r in spark.sql("SELECT * FROM anom_single").collect()
    }
    want = {
        _key(r): tuple(r)
        for r in streaming_anomalies(df, n_prev=8, z=3.0, min_prev=5)
        .collect()
    }
    assert got == want  # bit-exact, zscores included
    assert any(r[-1] for r in want.values())  # the planted spikes flag


def test_stream_state_across_time_ordered_batches(spark, tmp_path):
    df = _events(spark, _series())
    cut = dt.datetime(2024, 1, 1, 0, 8)
    src = str(tmp_path / "anom_split")
    df.filter(f"ts < timestamp'{cut}'").coalesce(1).write.mode(
        "overwrite").parquet(src)
    df.filter(f"ts >= timestamp'{cut}'").coalesce(1).write.mode(
        "append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_anomalies(stream, n_prev=8, z=3.0, min_prev=5)
        .writeStream.format("memory").queryName("anom_split")
        .outputMode("update").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = {
        _key(r): tuple(r)
        for r in spark.sql("SELECT * FROM anom_split").collect()
    }
    want = {
        _key(r): tuple(r)
        for r in streaming_anomalies(df, n_prev=8, z=3.0, min_prev=5)
        .collect()
    }
    # the deque carried across the batch boundary: scores after the
    # cut depend on values before it, and still match batch exactly
    assert got == want
    post_cut_flagged = [
        k for k, v in want.items() if v[1] >= 8 and v[-1]
    ]
    assert post_cut_flagged  # user a's spike at minute 9 is post-cut


def test_nulls_occupy_slots_match_batch(spark, tmp_path):
    rows = [("a", v) for v in
            [10.0, None, 9.5, 10.5, None, 9.0, 11.0, 10.2, 9.8, 55.0]]
    df = _events(spark, rows)
    src = str(tmp_path / "anom_nulls")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_anomalies(stream, n_prev=6, z=2.5, min_prev=4)
        .writeStream.format("memory").queryName("anom_nulls")
        .outputMode("update").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = {
        _key(r): tuple(r)
        for r in spark.sql("SELECT * FROM anom_nulls").collect()
    }
    want = {
        _key(r): tuple(r)
        for r in streaming_anomalies(df, n_prev=6, z=2.5, min_prev=4)
        .collect()
    }
    assert got == want
    # null rows appear in the output with NULL score, False flag
    null_rows = [v for v in want.values() if v[3] is None]
    assert len(null_rows) == 2
    assert all(v[5] is None and v[6] is False for v in null_rows)


def test_validation(spark):
    df = _events(spark, [("a", 1.0)])
    with pytest.raises(ValueError, match="n_prev"):
        streaming_anomalies(df, n_prev=1)
