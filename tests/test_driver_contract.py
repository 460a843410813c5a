"""Replay the full driver contract locally.

The driver's t2 gate runs every ``__spark_entry__.queries()`` entry
against its ``oracle_sql()`` SQL at sf0.01 (CORRECTNESS_r{N}.json).
This module is the same gate at smoke scale (sf0.001), so a change
that would flip a CORRECTNESS row fails in ``pytest`` first — and on
the PARQUET-scan path, which LocalRelation-based unit tests don't
exercise (that difference is exactly where the Spark 4.1 higher-
order-function pushdown bug hid in sem_join).

Queries without an oracle (approximate / non-SQL-expressible) get
the driver's weaker check: they must run and return a well-formed
result; their semantics are covered by dedicated recall/property
tests elsewhere.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_matches

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()

_WITH_ORACLE = sorted(set(_QUERIES) & set(_ORACLES))
_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


def test_every_oracle_names_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.columns and df.count() >= 0


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_driver_query_matches_oracle(name, spark, duck, tables):
    assert_matches(_QUERIES[name](spark, SF_SMOKE), duck, _ORACLES[name])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(name, spark, tables):
    df = _QUERIES[name](spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0
