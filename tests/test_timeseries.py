"""resample gap-fill + LOCF ffill vs the DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.timeseries import ffill, resample
from tests.conftest import assert_matches


def test_resample_daily_by_type(tables, duck):
    out = resample(
        tables["events"], "ts", "day", "event_type", "value", "sum"
    ).withColumn("sum_value", F.round("sum_value", 4))
    assert_matches(
        out,
        duck,
        """
        WITH dense AS (
          SELECT event_type, date_trunc('day', ts) AS period,
                 count(*) AS n_events,
                 sum(value) AS sum_value
          FROM events GROUP BY 1, 2
        ), spine AS (
          SELECT event_type,
                 unnest(generate_series(min(period), max(period),
                                        INTERVAL 1 DAY)) AS period
          FROM dense GROUP BY event_type
        )
        SELECT s.event_type, s.period,
               coalesce(d.n_events, 0) AS n_events,
               round(d.sum_value, 4) AS sum_value
        FROM spine s LEFT JOIN dense d USING (event_type, period)
        """,
    )


def test_resample_fills_gaps(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1.0), ("a", "2024-01-04 09:00:00", 2.0)],
        "g string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(df, "ts", "day", "g", "v", "sum", fill=0.0).collect()
    assert len(out) == 4  # jan 1,2,3,4
    by_day = {str(r["period"])[:10]: (r["n_events"], r["sum_v"]) for r in out}
    assert by_day["2024-01-02"] == (0, 0.0)
    assert by_day["2024-01-03"] == (0, 0.0)
    assert by_day["2024-01-01"] == (1, 1.0)


def test_resample_validations(tables):
    with pytest.raises(ValueError, match="step"):
        resample(tables["events"], "ts", "minute")
    with pytest.raises(ValueError, match="unknown agg"):
        resample(tables["events"], "ts", "day", None, "value", "median")


def test_ffill_locf(spark, duck):
    df = spark.createDataFrame(
        [
            ("u1", 1, None), ("u1", 2, 10.0), ("u1", 3, None),
            ("u1", 4, None), ("u1", 5, 20.0),
            ("u2", 1, 5.0), ("u2", 2, None),
        ],
        "u string, t int, v double",
    )
    out = ffill(df, ["v"], "t", "u").collect()
    got = {(r["u"], r["t"]): r["v"] for r in out}
    assert got[("u1", 1)] is None          # nothing earlier
    assert got[("u1", 3)] == 10.0
    assert got[("u1", 4)] == 10.0
    assert got[("u1", 5)] == 20.0
    assert got[("u2", 2)] == 5.0           # groups independent


def test_ffill_requires_group(tables):
    with pytest.raises(ValueError, match="single-partition"):
        ffill(tables["events"], ["value"], "ts")


def test_ffill_on_events_oracle(tables, duck):
    ev = tables["events"].select(
        "event_id", "user_id", "ts",
        # null-out ~half the values deterministically, then fill
        F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.col("value"))
        .alias("v"),
    )
    out = ffill(ev, ["v"], "ts", "user_id").withColumn(
        "v", F.round("v", 4)
    )
    assert_matches(
        out,
        duck,
        """
        SELECT event_id, user_id, ts,
               round(last_value(CASE WHEN event_id % 2 = 0 THEN value END
                                IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING), 4) AS v
        FROM events
        """,
    )


def test_rolling_agg_oracle(tables, duck):
    from semantic_olap_spark.functions.timeseries import rolling_agg

    out = rolling_agg(
        tables["events"], "ts", "value", "user_id",
        window="1 days", aggs=("avg", "count"),
    ).select("event_id", "user_id", "ts", "avg_value_1_days",
             "count_value_1_days")
    assert_matches(
        out,
        duck,
        """
        SELECT event_id, user_id, ts,
               avg(value) OVER w AS avg_value_1_days,
               count(*) OVER w AS count_value_1_days
        FROM events
        WINDOW w AS (
          PARTITION BY user_id
          ORDER BY epoch(ts::TIMESTAMP)::BIGINT
          RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
        )
        """,
        float_tol=1e-6,
    )


def test_rolling_agg_validations(tables):
    from semantic_olap_spark.functions.timeseries import rolling_agg

    with pytest.raises(ValueError, match="group_by"):
        rolling_agg(tables["events"], "ts", "value", [])
    with pytest.raises(ValueError, match="window must"):
        rolling_agg(tables["events"], "ts", "value", "user_id", window="weekly")
    with pytest.raises(ValueError, match="unknown agg"):
        rolling_agg(tables["events"], "ts", "value", "user_id", aggs=("median",))


def test_sessionize_oracle(tables, duck):
    from semantic_olap_spark.functions.timeseries import sessionize

    out = sessionize(
        tables["events"], "ts", "user_id", gap="30 minutes"
    ).select("event_id", "user_id", "ts", "session_id")
    assert_matches(
        out,
        duck,
        """
        SELECT event_id, user_id, ts,
               sum(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM (
          SELECT event_id, user_id, ts,
                 CASE WHEN lag(epoch(ts::TIMESTAMP)::BIGINT) OVER
                          (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR epoch(ts::TIMESTAMP)::BIGINT
                          - lag(epoch(ts::TIMESTAMP)::BIGINT) OVER
                            (PARTITION BY user_id ORDER BY ts) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
        )
        """,
    )


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from semantic_olap_spark.functions.timeseries import sessionize

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("u", t0), ("u", t0 + dt.timedelta(minutes=10)),
            ("u", t0 + dt.timedelta(minutes=50)),   # 40m gap → new
            ("u", t0 + dt.timedelta(minutes=75)),   # 25m gap → same
        ],
        "u string, ts timestamp",
    )
    got = [r["session_id"] for r in
           sessionize(df, "ts", "u").orderBy("ts").collect()]
    assert got == [1, 1, 2, 2]
