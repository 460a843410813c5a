"""DST-transition timestamp semantics (closes the r6 loaders.py hole).

The driver testdata spans 2024-01 only, so no prior round proved what
happens when a tz-naive events table spans a DST transition and the
session timezone observes DST.  This module builds a synthetic events
table spanning BOTH 2024 US transitions — including wall-clocks inside
the spring-forward gap (2024-03-10 02:xx does not exist in
America/Los_Angeles) and the ambiguous fall-back hour (2024-11-03
01:xx occurs twice) — and replays every events-based driver query
against its DuckDB oracle under ``America/Los_Angeles``.

What this pins (the r7 naive-timestamp contract):

- load_table surfaces tz-naive parquet as TIMESTAMP_NTZ and never
  interprets it into the session TimestampType (sources/loaders.py);
- all epoch arithmetic on NTZ goes through field extraction
  (functions/timeseries.py ``naive_micros_sql`` — ``timestampdiff``
  and ``unix_micros`` both coerce NTZ through the session zone, which
  shifts gap wall-clocks by an hour);
- therefore batch results are a pure function of the stored
  wall-clock: identical under UTC and under a DST-observing zone, and
  identical to the naive-SQL oracle.

Streaming is the documented exception: Spark's event-time machinery
rejects NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so streams cast to
the session TimestampType and naive sources spanning a transition are
only fully supported on the batch path (streaming/windows.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

# every oracle-backed driver query whose inputs are ONLY the events
# table — the complete batch ts-emitting surface over the synthetic
# data (enumerated by scanning _q_* bodies for `_t(..., "events")`)
EVENT_QUERIES = [
    "sessionize_events",
    "resample_daily_events",
    "ffill_user_values",
    "rolling_user_value",
    "anomaly_events",
    "asof_join_events",
    "funnel_events",
    "cohort_retention",
    "filter_pattern",
    "running_user_stats",
    "range_join_events",
    "temporal_join_events",
    "events_props_agg",
    "funnel_stages",
    "windowed_agg",
    "session_agg",
    "roll_up_events",
    "dimension_catalog",
]

LA = "America/Los_Angeles"


@pytest.fixture(scope="module")
def dst_dir(tmp_path_factory):
    """Synthetic events parquet spanning both 2024 US DST transitions,
    encoded exactly like the driver testdata (naive timestamp[us])."""
    rng = np.random.default_rng(7)
    bases = [
        # spring forward 2024-03-10: 02:00-03:00 PT does not exist
        pd.Timestamp("2024-03-09 22:00:00"),
        pd.Timestamp("2024-03-10 00:30:00"),
        pd.Timestamp("2024-03-10 01:45:00"),
        pd.Timestamp("2024-03-10 02:15:00"),  # nonexistent in LA
        pd.Timestamp("2024-03-10 02:45:00"),  # nonexistent in LA
        pd.Timestamp("2024-03-10 03:30:00"),
        pd.Timestamp("2024-03-10 12:00:00"),
        # fall back 2024-11-03: 01:00-02:00 PT occurs twice
        pd.Timestamp("2024-11-02 23:00:00"),
        pd.Timestamp("2024-11-03 00:30:00"),
        pd.Timestamp("2024-11-03 01:30:00"),  # ambiguous in LA
        pd.Timestamp("2024-11-03 02:30:00"),
        pd.Timestamp("2024-11-03 13:00:00"),
    ]
    types = ["click", "view", "purchase", "error", "signup"]
    rows, eid = [], 0
    for u in range(8):
        for b in bases:
            for k in range(3):
                ts = b + pd.Timedelta(
                    minutes=int(rng.integers(0, 10)) + 7 * k
                )
                # quarters: binary-exact doubles, so windowed SUM +
                # round(2) cannot hit the cross-engine half-tie class
                # (that class is pinned elsewhere — quality_score,
                # SCALE.md r6 item 3); this module isolates TIMESTAMP
                # semantics
                rows.append(
                    (eid, ts, u,
                     types[int(rng.integers(0, len(types)))],
                     float(int(rng.integers(0, 80)) / 4.0),
                     '{"k": %d}' % int(rng.integers(0, 100)))
                )
                eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    d = tmp_path_factory.mktemp("dstdata")
    tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def dst_duck(dst_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{dst_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.fixture()
def la_session(spark):
    """Flip the runtime session timezone to a DST-observing zone for
    one test; always restore (the suite session is shared)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", LA)
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_under_la(
    name, la_session, dst_dir, dst_duck
):
    from tests.conftest import assert_matches

    df = entrymod.queries()[name](la_session, dst_dir)
    assert_matches(df, dst_duck, entrymod.oracle_sql()[name])


def test_batch_results_invariant_to_session_tz(spark, dst_dir):
    """The stronger property behind the oracle parity: the collected
    result of every event query is IDENTICAL under UTC and LA — the
    engine never consults the session zone for naive timestamps."""
    qs = entrymod.queries()
    prev = spark.conf.get("spark.sql.session.timeZone")

    def run_all():
        out = {}
        for name in EVENT_QUERIES:
            pdf = qs[name](spark, dst_dir).toPandas()
            cols = sorted(pdf.columns)
            out[name] = sorted(
                tuple(str(v) for v in row)
                for row in pdf[cols].itertuples(index=False, name=None)
            )
        return out

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        under_utc = run_all()
        spark.conf.set("spark.sql.session.timeZone", LA)
        under_la = run_all()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    for name in EVENT_QUERIES:
        assert under_utc[name] == under_la[name], name


def test_gap_wallclocks_survive_load(la_session, dst_dir):
    """The spring-forward gap rows (02:xx on 2024-03-10, nonexistent
    in LA) must come back verbatim — the r6 NTZ→TimestampType cast
    shifted them to 03:xx under a DST-observing session zone."""
    from semantic_olap_spark.sources.loaders import load_table

    ev = load_table(la_session, dst_dir, "events")
    got = sorted(
        str(r["ts"])
        for r in ev.filter(
            "ts >= '2024-03-10 02:00:00' AND ts < '2024-03-10 03:00:00'"
        ).collect()
    )
    assert got and all(s.startswith("2024-03-10 02:") for s in got)
