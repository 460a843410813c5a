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


def test_footer_sweep_is_bounded_on_many_file_tables(
    spark, tmp_path, monkeypatch
):
    # r14: a well-laid-out table (more row groups than cores) must be
    # classified as a no-op after reading at most defaultParallelism
    # footers — not every footer of a many-thousand-file table
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_olap_spark.sources import loaders

    d = tmp_path / "many.parquet"
    d.mkdir()
    n_files = spark.sparkContext.defaultParallelism + 48
    for i in range(n_files):
        pq.write_table(pa.table({"x": [i]}), d / f"part-{i:05d}.parquet")

    calls = {"n": 0}
    real = pq.ParquetFile

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    # loaders imports pyarrow.parquet inside the function, so patching
    # the module attribute is seen by the sweep
    monkeypatch.setattr(pq, "ParquetFile", counting)
    df = spark.read.parquet(str(d))
    out = loaders.restore_scan_parallelism(spark, df, str(d))
    par = spark.sparkContext.defaultParallelism
    assert calls["n"] <= par, (
        f"footer sweep read {calls['n']} footers; must early-exit "
        f"at defaultParallelism={par} (table has {n_files} files)"
    )
    assert out is df  # enough groups -> rule is a no-op


def test_truncated_layout_cache_rescans_for_higher_threshold(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_olap_spark.sources.loaders import _scan_layout

    d = tmp_path / "t.parquet"
    d.mkdir()
    for i in range(8):
        pq.write_table(pa.table({"x": [i]}), d / f"p{i}.parquet")
    g, b, r, complete = _scan_layout(str(d), stop_groups=4)
    assert g >= 4 and not complete
    # a later caller with a higher threshold must not trust the
    # truncated counts
    g2, b2, r2, complete2 = _scan_layout(str(d), stop_groups=100)
    assert complete2 and g2 == 8 and r2 == 8


def test_pushdown_survives_rebalance(spark, forced_floor):
    reb = load_table(spark, SF, "lineitem", rebalance=True)
    q = reb.filter(F.col("l_quantity") > 25).select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):]
    # the predicate must reach the scan (below the repartition
    # exchange), not evaluate above it
    assert "l_quantity" in scan.split("ReadSchema")[0]
