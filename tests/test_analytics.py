"""Funnel + cohort retention semantics on hand-crafted sequences."""

from __future__ import annotations

import datetime as dt

import pytest

from semantic_olap_spark.functions.analytics import cohort_retention, funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        ["user_id", "ts", "event_type"],
    )


class TestFunnel:
    def test_ordered_chaining(self, spark):
        df = _ev(spark, [
            # u1 completes in order
            (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
            # u2 clicks BEFORE viewing: click doesn't count, purchase
            # requires a click after the view
            (2, 1, 1, "click"), (2, 1, 2, "view"), (2, 1, 3, "purchase"),
            # u3 views only
            (3, 1, 0, "view"),
        ])
        got = {r["name"]: r["users"] for r in
               funnel(df, ["view", "click", "purchase"]).collect()}
        assert got == {"view": 3, "click": 1, "purchase": 1}

    def test_strictly_after_excludes_simultaneous(self, spark):
        df = _ev(spark, [(1, 1, 5, "view"), (1, 1, 5, "click")])
        got = {r["name"]: r["users"] for r in
               funnel(df, ["view", "click"]).collect()}
        assert got == {"view": 1, "click": 0}

    def test_earliest_first_chaining(self, spark):
        # the EARLIEST view anchors the chain, so a click between
        # two views still converts
        df = _ev(spark, [
            (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "view"),
        ])
        got = {r["name"]: r["users"] for r in
               funnel(df, ["view", "click"]).collect()}
        assert got["click"] == 1

    def test_empty_steps_raises(self, spark):
        df = _ev(spark, [(1, 1, 0, "view")])
        with pytest.raises(ValueError, match="at least one"):
            funnel(df, [])


class TestCohortRetention:
    def test_day_matrix(self, spark):
        df = _ev(spark, [
            (1, 1, 0, "view"), (1, 2, 0, "view"), (1, 4, 0, "view"),
            (2, 1, 5, "click"),
            (3, 2, 0, "view"), (3, 3, 0, "view"),
        ])
        got = {(str(r["cohort"]), r["offset"]): r["users"]
               for r in cohort_retention(df).collect()}
        assert got[("2024-01-01", 0)] == 2      # u1, u2
        assert got[("2024-01-01", 1)] == 1      # u1 on day 2
        assert got[("2024-01-01", 3)] == 1      # u1 on day 4
        assert got[("2024-01-02", 0)] == 1      # u3
        assert got[("2024-01-02", 1)] == 1
        assert ("2024-01-01", 2) not in got

    def test_week_period(self, spark):
        # Jan 1 2024 is a Monday; Jan 8 starts the next week
        df = _ev(spark, [
            (1, 1, 0, "view"), (1, 8, 0, "view"),
        ])
        got = {r["offset"]: r["users"]
               for r in cohort_retention(df, period="week").collect()}
        assert got == {0: 1, 1: 1}

    def test_bad_period_raises(self, spark):
        df = _ev(spark, [(1, 1, 0, "view")])
        with pytest.raises(ValueError, match="period"):
            cohort_retention(df, period="month")
