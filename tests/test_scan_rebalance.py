"""Layout-deficit scan rebalance (loaders.restore_scan_parallelism).

r13 optimization: a parquet table whose layout yields fewer row
groups than the session's parallelism runs every scan-side
expression on that many tasks — the local testdata (one
single-row-group file per table) runs them on ONE.  Opt-in
``load_table(..., rebalance=True)`` restores parallelism with a
round-robin repartition derived from the source layout; these tests
pin the rule's firing conditions and that it never changes results.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.sources.loaders import load_table

SF = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")

_KNOB = "SPARK_GRAFT_SCAN_REBALANCE_MIN_BYTES"


@pytest.fixture()
def forced_floor():
    old = os.environ.get(_KNOB)
    os.environ[_KNOB] = "1"
    yield
    if old is None:
        os.environ.pop(_KNOB, None)
    else:
        os.environ[_KNOB] = old


def test_default_off_is_plan_identical(spark):
    plain = load_table(spark, SF, "documents")
    default = load_table(spark, SF, "documents", rebalance=False)
    assert plain.rdd.getNumPartitions() == default.rdd.getNumPartitions()


def test_fires_on_single_row_group_layout(spark, forced_floor):
    reb = load_table(spark, SF, "documents", rebalance=True)
    n = reb.rdd.getNumPartitions()
    par = spark.sparkContext.defaultParallelism
    assert 1 < n <= par


def test_byte_floor_skips_small_tables(spark):
    # default floor (512 KiB): every sf0.001 table is far below it,
    # so rebalance=True must be a structural no-op — broadcast-sized
    # dimensions never pay a shuffle in front of their build
    reb = load_table(spark, SF, "nation", rebalance=True)
    assert reb.rdd.getNumPartitions() == 1


def test_results_invariant_under_rebalance(spark, forced_floor):
    from semantic_olap_spark.functions.text import text_profile

    plain = load_table(spark, SF, "documents")
    reb = load_table(spark, SF, "documents", rebalance=True)
    a = sorted(map(str, text_profile(plain).collect()))
    b = sorted(map(str, text_profile(reb).collect()))
    assert a == b


def test_pushdown_survives_rebalance(spark, forced_floor):
    reb = load_table(spark, SF, "lineitem", rebalance=True)
    q = reb.filter(F.col("l_quantity") > 25).select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):]
    # the predicate must reach the scan (below the repartition
    # exchange), not evaluate above it
    assert "l_quantity" in scan.split("ReadSchema")[0]
