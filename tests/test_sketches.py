"""Sketch contracts: error bounds, merge parity, heavy hitters.

HLL binary state is implementation-specific (no DuckDB oracle); the
substitute evidence is (1) estimates within the configured error
bound of exact distinct counts, and (2) batch-merge parity — the
union of per-batch sketches estimates exactly what the single-pass
sketch does, so incremental ingestion is loss-free by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.sketches import (
    distinct_sketch,
    estimate_distinct,
    freq_sketch,
    merge_distinct_sketches,
    top_frequent,
)


def test_estimate_within_bound(tables):
    li = tables["lineitem"]
    est = {
        r["l_returnflag"]: r["distinct_est"]
        for r in estimate_distinct(
            distinct_sketch(li, "l_orderkey", "l_returnflag")
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        # lg_k=12 → ~1.6% standard error; 5% is >3 sigma
        assert abs(e - exact[k]) <= max(2, 0.05 * exact[k]), (k, e, exact[k])


def test_merge_parity_with_single_pass(tables):
    # split the table into 3 arbitrary batches; union of per-batch
    # sketches must estimate exactly what one full-pass sketch does
    li = tables["lineitem"].withColumn(
        "_b", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(3))
    )
    per_batch = distinct_sketch(li, "l_suppkey", ["l_returnflag", "_b"])
    merged = estimate_distinct(
        merge_distinct_sketches(per_batch.drop("_b"), "l_returnflag")
    )
    single = estimate_distinct(distinct_sketch(li, "l_suppkey", "l_returnflag"))
    got = {r["l_returnflag"]: r["distinct_est"] for r in merged.collect()}
    want = {r["l_returnflag"]: r["distinct_est"] for r in single.collect()}
    assert got == want


def test_global_sketch_no_groups(tables):
    out = estimate_distinct(
        distinct_sketch(tables["orders"], "o_custkey")
    ).collect()
    assert len(out) == 1
    exact = tables["orders"].select("o_custkey").distinct().count()
    assert abs(out[0]["distinct_est"] - exact) <= max(2, 0.05 * exact)


def test_top_frequent_exact_on_small(spark):
    rows = [("g", v) for v in "aaaabbbcc d".split() for _ in range(1)]
    df = spark.createDataFrame(
        [("g", "a")] * 5 + [("g", "b")] * 3 + [("g", "c")] * 2 + [("g", "d")] * 1
        + [("h", "x")] * 4 + [("h", "y")] * 1,
        "grp string, v string",
    )
    out = top_frequent(df, "v", k=2, group_by="grp", support=0.0)
    got = {(r["grp"], r["rank"]): (r["value"], r["freq"]) for r in out.collect()}
    assert got[("g", 1)] == ("a", 5)
    assert got[("g", 2)] == ("b", 3)
    assert got[("h", 1)] == ("x", 4)
    assert got[("h", 2)] == ("y", 1)


def test_top_frequent_support_prunes_tail(tables):
    orders = tables["orders"]
    out = top_frequent(orders, "o_orderpriority", k=3, support=0.01)
    assert out.count() <= 3
    # survivors are genuinely the most frequent priorities
    exact = (
        orders.groupBy("o_orderpriority")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
    )
    want = {r["o_orderpriority"] for r in exact.collect()}
    assert {r["value"] for r in out.collect()} <= want


def test_freq_sketch_binary_mergeable(tables):
    out = freq_sketch(tables["orders"], "o_orderpriority", "o_orderstatus")
    rows = out.collect()
    assert len(rows) == 3  # F/O/P
    assert all(isinstance(r["cms"], (bytes, bytearray)) for r in rows)
    # decode driver-side with Spark's own CountMinSketch to sanity-
    # check a known-frequent value's estimate ≥ its true count
    sketch_bytes = dict((r["o_orderstatus"], bytes(r["cms"])) for r in rows)
    jvm = tables["orders"].sparkSession._jvm
    import io  # noqa: F401

    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch_bytes["O"])
    )
    true_count = (
        tables["orders"]
        .filter("o_orderstatus = 'O' and o_orderpriority = '1-URGENT'")
        .count()
    )
    est = cms.estimateCount("1-URGENT")
    assert est >= true_count  # CMS never underestimates
    assert est <= true_count * 1.2 + 10


def test_top_frequent_support_is_per_group(spark):
    # a small group must be judged against ITS OWN total, not the
    # global one (review finding: global total starved small groups)
    df = spark.createDataFrame(
        [("big", "a")] * 1000 + [("small", "y")] * 2 + [("small", "z")],
        "g string, v string",
    )
    out = top_frequent(df, "v", k=2, group_by="g", support=0.001)
    got = {(r["g"], r["value"]) for r in out.collect()}
    assert ("small", "y") in got and ("small", "z") in got
    assert ("big", "a") in got


def test_driver_row_golden_estimates(spark):
    """Strongest feasible check for the approx_distinct_merge driver
    row (its HLL binary state is not DuckDB-expressible, so the
    driver records rows-only): the FINALIZED estimates are a
    deterministic pure function of the input value set, so (1) pin
    them exactly at the driver's sf0.01, and (2) assert each sits
    inside 3x the lg_k=12 standard error (1.04/sqrt(4096) ~ 1.63%)
    of the exact per-flag distinct count — the replay tool's golden
    hash in tools/golden_hashes.json covers the same frame at the
    pandas protocol.
    """
    import duckdb

    import __spark_entry__ as entrymod
    from tests.conftest import SF_T2

    df = entrymod.queries()["approx_distinct_merge"](spark, SF_T2)
    got = {r["l_returnflag"]: r["distinct_est"] for r in df.collect()}
    assert got == {"A": 11170, "N": 11183, "R": 11215}

    exact = dict(
        duckdb.sql(
            "SELECT l_returnflag, count(DISTINCT l_orderkey) "
            f"FROM read_parquet('{SF_T2}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    for flag, est in got.items():
        assert abs(est - exact[flag]) / exact[flag] <= 3 * 1.04 / 64.0


# sha256 over the driver row's MERGED sketch binaries at sf0.01
# (sorted by flag, length-prefixed).  The HLL register array is a
# pointwise max over per-value register updates — commutative and
# associative — so the serialized state is a deterministic pure
# function of the input VALUE SET, independent of partitioning and
# merge order (verified at shuffle_partitions ∈ {5, 8, 32}).  This
# pins the sketch IMPLEMENTATION itself: a Spark-side change to the
# HLL encoding, seeding, or lg_k plumbing surfaces here even when
# the decoded estimates happen to survive (the weaker golden above).
_SKETCH_BYTES_SHA256 = (
    "ead52e954febdb4cbbd3acf54a1980e2411808cbc08ca0599ea62d108e4e3dec"
)


def test_driver_row_golden_sketch_bytes(spark):
    import hashlib

    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.sketches import (
        distinct_sketch,
        merge_distinct_sketches,
    )
    from semantic_olap_spark.sources.loaders import load_table
    from tests.conftest import SF_T2

    # the driver row's construction, stopped BEFORE estimate_distinct
    li = load_table(spark, SF_T2, "lineitem").withColumn(
        "_b", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(4))
    )
    per_batch = distinct_sketch(li, "l_orderkey", ["l_returnflag", "_b"])
    merged = merge_distinct_sketches(per_batch.drop("_b"), "l_returnflag")
    rows = sorted(
        (r["l_returnflag"], bytes(r["sketch"])) for r in merged.collect()
    )
    h = hashlib.sha256()
    for flag, b in rows:
        h.update(flag.encode())
        h.update(len(b).to_bytes(8, "big"))
        h.update(b)
    assert h.hexdigest() == _SKETCH_BYTES_SHA256
