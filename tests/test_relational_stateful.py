"""As-of/range joins (DuckDB ASOF oracle) + stateful streaming."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from semantic_olap_spark.operators.relational import asof_join, range_join
from semantic_olap_spark.streaming.stateful import running_user_stats
from tests.conftest import assert_matches


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_asof_join_small_handcheck(spark):
    left = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(10)), (1, _ts(2)), (2, _ts(7))],
        ["user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 100.0), (1, _ts(9), 200.0), (2, _ts(8), 300.0)],
        ["user_id", "ts", "score"],
    )
    out = {
        (r["user_id"], r["ts"].minute): (
            r["r_score"], r["r_ts"].minute if r["r_ts"] else None
        )
        for r in asof_join(left, right, "ts", ["user_id"]).collect()
    }
    assert out[(1, 5)] == (100.0, 4)   # latest right <= 00:05
    assert out[(1, 10)] == (200.0, 9)
    assert out[(1, 2)] == (None, None)  # nothing before 00:02
    assert out[(2, 7)] == (None, None)  # right at 00:08 is after


def test_asof_join_exact_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts(4))], ["user_id", "ts"])
    right = spark.createDataFrame([(1, _ts(4), 9.0)], ["user_id", "ts", "v"])
    row = asof_join(left, right, "ts", ["user_id"]).collect()[0]
    assert row["r_v"] == 9.0  # <= semantics: equal timestamps match


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(30))], ["user_id", "ts"])
    right = spark.createDataFrame([(1, _ts(2), 5.0)], ["user_id", "ts", "v"])
    loose = asof_join(left, right, "ts", ["user_id"]).collect()[0]
    assert loose["r_v"] == 5.0
    tight = asof_join(
        left, right, "ts", ["user_id"], tolerance="10 MINUTES"
    ).collect()[0]
    assert tight["r_v"] is None and tight["r_ts"] is None


def test_asof_join_duckdb_oracle(tables, duck):
    # events to the latest PRIOR event of the same user (self as-of):
    # left = error events, right = click events
    ev = tables["events"]
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(left, right, "ts", ["user_id"]).select(
        "event_id", "user_id", "ts", "r_value", "r_ts"
    )
    assert_matches(
        out,
        duck,
        """
        SELECT l.event_id, l.user_id, l.ts,
               r.value AS r_value, r.ts AS r_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'click') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
    )


def test_asof_join_single_shuffle_no_single_partition(tables):
    ev = tables["events"]
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    plan = (
        asof_join(left, right, "ts", ["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    # no join operator at all — the as-of is pure union + window
    assert "Join" not in plan


def test_range_join_with_keys(spark, tables, duck):
    ev = tables["events"]
    spans = spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1, 0), dt.datetime(2024, 1, 2, 0), f"day1-u{u}")
            for u in range(5)
        ],
        ["user_id", "t_start", "t_end", "tag"],
    )
    spans.createOrReplaceTempView("spans_tmp")
    out = range_join(
        ev.select("event_id", "user_id", "ts"), spans, "ts",
        "t_start", "t_end", by=["user_id"],
    ).select("event_id", "user_id", "ts", "tag")
    duck.register(
        "spans_py",
        spans.toPandas(),
    )
    assert_matches(
        out,
        duck,
        """
        SELECT e.event_id, e.user_id, e.ts, s.tag
        FROM events e JOIN spans_py s
          ON e.user_id = s.user_id AND e.ts >= s.t_start AND e.ts < s.t_end
        """,
    )


def test_asof_join_collision_raises(spark):
    left = spark.createDataFrame([(1, _ts(5), 0.0)], ["user_id", "ts", "r_v"])
    right = spark.createDataFrame([(1, _ts(4), 9.0)], ["user_id", "ts", "v"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "ts", ["user_id"])
    # a different prefix resolves it
    out = asof_join(left, right, "ts", ["user_id"], right_prefix="rr_")
    assert out.collect()[0]["rr_v"] == 9.0


def test_running_user_stats_string_keys_stream(spark, tmp_path):
    # the output schema must carry the key column's REAL type
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], ["user_id", "value"]
    )
    src = str(tmp_path / "strkeys")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("str_keys_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r["user_id"]: (r["running_count"], r["running_sum"])
        for r in spark.sql("SELECT * FROM str_keys_test").collect()
    }
    assert got == {"a": (2, 3.0), "b": (1, 3.0)}


def test_running_user_stats_batch(tables, duck):
    out = running_user_stats(tables["events"])
    assert_matches(
        out,
        duck,
        """
        SELECT user_id, count(*) AS running_count,
               round(sum(coalesce(value, 0)), 2) AS running_sum
        FROM events GROUP BY user_id
        """,
    )


def test_running_user_stats_stream_state_accumulates(spark, tmp_path):
    rows1 = [(1, 10.0), (1, 5.0), (2, 1.0)]
    rows2 = [(1, 2.0), (3, 7.0)]
    src = str(tmp_path / "stateful_src")
    df1 = spark.createDataFrame(rows1, ["user_id", "value"])
    df2 = spark.createDataFrame(rows2, ["user_id", "value"])
    df1.coalesce(1).write.mode("overwrite").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM running_stats_test").collect()
    # state accumulated across micro-batches: the LAST emission per
    # user must equal the all-data totals
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["running_count"], r["running_sum"])
    assert final[1] == (3, 17.0)  # 2 events in batch 1 + 1 in batch 2
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)
    # user 1 must have emitted an intermediate running value too
    user1 = [r["running_count"] for r in rows if r["user_id"] == 1]
    assert len(user1) >= 2 and max(user1) == 3


def test_asof_join_unkeyed_requires_opt_in(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(_ts(5), 1)], ["ts", "x"])
    right = spark.createDataFrame([(_ts(4), 2.0)], ["ts", "score"])
    # keyless = single-task global sort: guarded behind an explicit flag
    with _pytest.raises(ValueError, match="allow_unkeyed"):
        asof_join(left, right, "ts")
    row = asof_join(left, right, "ts", allow_unkeyed=True).collect()[0]
    assert row["r_score"] == 2.0


def test_shipping_priority_plan_shape(spark, sf_dir):
    # the Q3 shape: broadcast join + TakeOrderedAndProject, and the
    # ship-date predicate pushed to the fact scan
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    q = entry.queries()["shipping_priority"](spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters", 1)[1][:400]


def test_streaming_funnel_matches_batch_on_single_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from semantic_olap_spark.sources.loaders import load_table
    from semantic_olap_spark.streaming.stateful import streaming_funnel

    steps = ["view", "click", "purchase"]
    events = load_table(spark, sf_dir, "events")
    batch = streaming_funnel(events, steps)
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = streaming_funnel(stream, steps)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["user_id"], r["stage"], r["reached_ts"])
        for r in spark.sql("SELECT * FROM sfunnel").collect()
    }
    want = {
        (r["user_id"], r["stage"], r["reached_ts"])
        for r in batch.collect()
    }
    # stream/batch parity: stage-0 users (only out-of-chain events)
    # are emitted by neither path
    assert all(g[1] > 0 for g in got)
    assert got == want and len(want) > 0


def test_streaming_funnel_batch_agrees_with_funnel_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.analytics import funnel
    from semantic_olap_spark.sources.loaders import load_table
    from semantic_olap_spark.streaming.stateful import streaming_funnel

    steps = ["view", "click", "purchase"]
    events = load_table(spark, sf_dir, "events")
    per_user = streaming_funnel(events, steps)
    counts = {
        r["step"]: r["users"] for r in funnel(events, steps).collect()
    }
    # users at stage >= i equals funnel's "reached step i" count
    for i in (1, 2, 3):
        got = per_user.filter(F.col("stage") >= i).count()
        assert got == counts[i], (i, got, counts)


def test_streaming_funnel_stateful_chaining_across_batches(spark, tmp_path):
    import datetime as dt

    from semantic_olap_spark.streaming.stateful import streaming_funnel

    # two time-ordered batches: user 1 views in batch 1, clicks and
    # buys in batch 2; user 2 clicks before viewing (never advances
    # past view)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [(1, t0, "view"), (2, t0, "click")]
    rows2 = [
        (1, t0 + dt.timedelta(minutes=1), "click"),
        (1, t0 + dt.timedelta(minutes=2), "purchase"),
        (2, t0 + dt.timedelta(minutes=1), "view"),
    ]
    src = str(tmp_path / "events_src")
    cols = ["user_id", "ts", "event_type"]
    # one part file per batch + strictly increasing mtimes: the file
    # stream source orders batches by modification time, and equal
    # mtimes (or multi-part writes) make batch order — and therefore
    # the state chaining under test — nondeterministic
    import glob
    import os

    spark.createDataFrame(rows1, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b1")
    spark.createDataFrame(rows2, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b2")
    for i, d in enumerate(("b1", "b2")):
        for f in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(f, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    schema = spark.read.parquet(f"{src}/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_funnel(stream, ["view", "click", "purchase"])
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    # final state per user = last emitted row
    rows = spark.sql(
        "SELECT * FROM sfunnel2"
    ).collect()
    last = {}
    for r in rows:
        last[r["user_id"]] = max(
            last.get(r["user_id"], 0), r["stage"]
        )
    assert last[1] == 3      # advanced across batches via state
    assert last.get(2, 0) <= 1  # click-before-view never chains
