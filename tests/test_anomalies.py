"""Rolling z-score anomaly detection (functions/timeseries.py).

Contracts: a planted spike against a noisy baseline is flagged and
the baseline is not; the current value never enters its own frame;
warm-up and zero-variance windows yield NULL zscore / false flag;
tiebroken ordering is repartition-deterministic.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import fuzz_budget
from semantic_olap_spark.functions.timeseries import detect_anomalies


def _series(spark, values, user="u1"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (user, i, base + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, value double"
    )


def test_spike_flagged_baseline_not(spark):
    # noisy baseline around 10 (sd ~ 0.8), one 10x spike at the end
    vals = [10.0, 9.5, 10.5, 9.0, 11.0, 10.2, 9.8, 10.7, 9.3, 100.0]
    out = detect_anomalies(
        _series(spark, vals), "ts", "value", "user_id",
        n_prev=8, z=3.0, min_prev=5, order_by=["event_id"],
    ).collect()
    by_id = {r["event_id"]: r for r in out}
    assert by_id[9]["is_anomaly"] is True
    assert by_id[9]["zscore"] > 3.0
    assert not any(r["is_anomaly"] for r in out if r["event_id"] != 9)


def test_current_value_excluded_from_frame(spark):
    # if the spike entered its own frame it would inflate the stddev
    # and shrink its zscore; with 9 prev values (mean 10, sd ~0.73)
    # the spike at 100 must score (100-10)/sd ≈ 120+
    vals = [10.0, 9.5, 10.5, 9.0, 11.0, 10.2, 9.8, 10.7, 9.3, 100.0]
    out = detect_anomalies(
        _series(spark, vals), "ts", "value", "user_id",
        n_prev=20, z=3.0, min_prev=5, order_by=["event_id"],
    ).collect()
    spike = next(r for r in out if r["event_id"] == 9)
    assert spike["prev_n"] == 9  # not 10: itself is excluded
    assert spike["zscore"] > 100


def test_warmup_rows_null_and_false(spark):
    vals = [10.0, 9.5, 10.5, 9.0, 11.0, 10.2]
    out = detect_anomalies(
        _series(spark, vals), "ts", "value", "user_id",
        n_prev=10, z=2.0, min_prev=5, order_by=["event_id"],
    ).collect()
    for r in out:
        if r["prev_n"] < 5:
            assert r["zscore"] is None
            assert r["is_anomaly"] is False


def test_zero_variance_window_null(spark):
    vals = [5.0] * 8 + [50.0]
    out = detect_anomalies(
        _series(spark, vals), "ts", "value", "user_id",
        n_prev=8, z=2.0, min_prev=5, order_by=["event_id"],
    ).collect()
    spike = next(r for r in out if r["event_id"] == 8)
    # trailing window is constant: sample stddev 0 → undefined score
    assert spike["zscore"] is None
    assert spike["is_anomaly"] is False


def test_groups_isolated(spark):
    a = _series(spark, [10.0, 9.5, 10.5, 9.0, 11.0, 10.2, 100.0], "a")
    b = _series(spark, [100.0, 99.5, 100.5, 99.0, 101.0, 100.2, 100.1], "b")
    out = detect_anomalies(
        a.unionByName(b), "ts", "value", "user_id",
        n_prev=6, z=3.0, min_prev=5, order_by=["event_id"],
    ).collect()
    flags = {(r["user_id"], r["event_id"]): r["is_anomaly"] for r in out}
    assert flags[("a", 6)] is True  # spike vs a's own baseline
    # b's 100.1 is normal for b even though it equals a's spike scale
    assert flags[("b", 6)] is False


def test_repartition_deterministic(spark):
    vals = [10.0, 9.5, 10.5, 9.0, 11.0, 10.2, 9.8, 10.7, 9.3, 100.0]
    df = _series(spark, vals)
    one = detect_anomalies(
        df, "ts", "value", "user_id",
        n_prev=8, order_by=["event_id"],
    ).collect()
    many = detect_anomalies(
        df.repartition(7), "ts", "value", "user_id",
        n_prev=8, order_by=["event_id"],
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_validation(spark):
    df = _series(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="group_by"):
        detect_anomalies(df, "ts", "value", [])
    with pytest.raises(ValueError, match="n_prev"):
        detect_anomalies(df, "ts", "value", "user_id", n_prev=1)


# ---- hypothesis: flags match an independent Python reference ----------

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSETTINGS = dict(
    max_examples=fuzz_budget(10, 5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SERIES = st.lists(
    st.floats(min_value=-1e4, max_value=1e4,
              allow_nan=False, allow_infinity=False),
    min_size=0, max_size=40,
)


def _reference(vals, n_prev, z, min_prev):
    """Independent recompute of the documented contract: values
    quantized at decimal(18,6) (so sub-1e-6 magnitudes are zero to
    the engine by design), EXACT decimal Σv/Σv², then the fixed
    double decode — python Decimal here vs the JVM's BigDecimal in
    the engine."""
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("1e-6")

    def quant(x):
        return Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP)

    out = []
    for i, v in enumerate(vals):
        frame = [quant(x) for x in vals[max(0, i - n_prev):i]]
        n = len(frame)
        if n < min_prev:
            out.append((n, None, False))
            continue
        s, ss, nd = (
            float(sum(frame)),
            float(sum(x * x for x in frame)),
            float(n),
        )
        var = max(ss - s * s / nd, 0.0) / (nd - 1.0)
        if not var > 0:
            out.append((n, None, False))
            continue
        zz = float(
            Decimal(repr((v - s / nd) / math.sqrt(var))).quantize(
                q6, rounding=ROUND_HALF_UP
            )
        )
        out.append((n, zz, abs(zz) > z))
    return out


@settings(**_HSETTINGS)
@given(vals=_SERIES)
def test_matches_python_reference(spark, vals):
    n_prev, z, min_prev = 7, 2.0, 3
    df = _series(spark, vals)
    got = {
        r["event_id"]: (r["prev_n"], r["zscore"], r["is_anomaly"])
        for r in detect_anomalies(
            df, "ts", "value", "user_id",
            n_prev=n_prev, z=z, min_prev=min_prev, order_by=["event_id"],
        ).collect()
    }
    want = _reference(vals, n_prev, z, min_prev)
    assert len(got) == len(want)
    for i, (wn, wz, wf) in enumerate(want):
        gn, gz, gf = got[i]
        assert gn == wn
        if wz is None:
            assert gz is None and gf is False
        else:
            # same exact-sum construction on both sides → bit-equal
            assert gz == wz and gf == wf
