"""Data-quality checks + snapshot diff vs the DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.quality import (
    quality_report,
    referential_violations,
    snapshot_diff,
    unique_violations,
)
from tests.conftest import assert_matches


RULES = [
    {"name": "qty_range", "between": ["l_quantity", 1, 50]},
    {"name": "disc_range", "between": ["l_discount", 0.0, 0.08]},
    {"name": "flag_set", "isin": ["l_returnflag", ["A", "N", "R"]]},
    {"name": "key_not_null", "not_null": "l_orderkey"},
    {"name": "price_pos", "expr": "l_extendedprice > 0"},
]


def test_quality_report_oracle(tables, duck):
    out = quality_report(tables["lineitem"], RULES)
    assert_matches(
        out,
        duck,
        """
        WITH wide AS (
          SELECT count(*) AS n_rows,
            sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
                     THEN 1 ELSE 0 END) AS qty_range,
            sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0.0 AND 0.08, FALSE)
                     THEN 1 ELSE 0 END) AS disc_range,
            sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
                     THEN 1 ELSE 0 END) AS flag_set,
            sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS key_not_null,
            sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
                     THEN 1 ELSE 0 END) AS price_pos
          FROM lineitem
        ), long AS (
          SELECT 'qty_range' AS rule, qty_range AS violations, n_rows FROM wide
          UNION ALL SELECT 'disc_range', disc_range, n_rows FROM wide
          UNION ALL SELECT 'flag_set', flag_set, n_rows FROM wide
          UNION ALL SELECT 'key_not_null', key_not_null, n_rows FROM wide
          UNION ALL SELECT 'price_pos', price_pos, n_rows FROM wide
        )
        SELECT rule, n_rows, violations,
               round((n_rows - violations) / n_rows, 6) AS pass_rate
        FROM long
        """,
    )


def test_quality_report_one_scan(tables):
    plan = (
        quality_report(tables["lineitem"], RULES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1  # all rules in one pass


def test_quality_report_validations(tables):
    with pytest.raises(ValueError, match="at least one rule"):
        quality_report(tables["lineitem"], [])
    with pytest.raises(ValueError, match="unknown rule spec"):
        quality_report(tables["lineitem"], [{"frobnicate": "x"}])
    with pytest.raises(ValueError, match="duplicate rule names"):
        quality_report(
            tables["lineitem"],
            [{"not_null": "l_orderkey"}, {"not_null": "l_orderkey"}],
        )


def test_unique_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "k int, v string",
    )
    got = {r["k"]: r["n_dup"] for r in unique_violations(df, ["k"]).collect()}
    assert got == {1: 2, 3: 3}


def test_referential_violations(tables, duck):
    # orphan lineitems vs a truncated orders parent
    parent = tables["orders"].filter("o_orderkey % 3 = 0")
    out = referential_violations(
        tables["lineitem"].select("l_orderkey", "l_linenumber"),
        parent, "l_orderkey", "o_orderkey",
    )
    assert_matches(
        out,
        duck,
        """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_orderkey NOT IN
              (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
        """,
    )


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c2", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert set(rows) == {1, 3, 4}  # 2 unchanged → dropped
    assert rows[1]["change"] == "removed"
    assert rows[4]["change"] == "added"
    assert rows[3]["change"] == "changed"
    assert rows[3]["s_old"] == "c" and rows[3]["s_new"] == "c2"


def test_snapshot_diff_reconstruction(tables, spark):
    # applying the diff to old reproduces new exactly: drop removed,
    # add added, replace changed
    old = tables["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = old.filter("o_orderkey % 7 != 0").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.5)
        .otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(old, new, "o_orderkey").collect()
    removed = {r["o_orderkey"] for r in diff if r["change"] == "removed"}
    upserts = {
        r["o_orderkey"]: (r["o_orderstatus_new"], r["o_totalprice_new"])
        for r in diff if r["change"] in ("added", "changed")
    }
    rebuilt = {}
    for r in old.collect():
        if r["o_orderkey"] not in removed:
            rebuilt[r["o_orderkey"]] = (r["o_orderstatus"], r["o_totalprice"])
    rebuilt.update(upserts)
    want = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in new.collect()
    }
    assert rebuilt == want


def test_snapshot_diff_identity_empty(tables):
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    assert snapshot_diff(o, o, "o_orderkey").count() == 0


def test_snapshot_diff_null_safe(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, None)], "k int, v string")
    assert snapshot_diff(old, new, "k").count() == 0  # NULL == NULL here


def test_quality_report_on_stream(spark, sf_dir):
    # expectation gates run on streaming frames too: the one-pass
    # aggregate is a streaming global agg (complete output mode)
    from semantic_olap_spark.sources.loaders import load_table

    schema = load_table(spark, sf_dir, "lineitem").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    rules = [
        {"name": "qty_range", "between": ["l_quantity", 1, 50]},
        {"name": "key_not_null", "not_null": "l_orderkey"},
    ]
    rep = quality_report(stream, rules)
    assert rep.isStreaming
    q = (
        rep.writeStream.format("memory")
        .queryName("quality_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in spark.sql("SELECT * FROM quality_stream_test").collect()
    }
    want = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in quality_report(
            load_table(spark, sf_dir, "lineitem"), rules
        ).collect()
    }
    assert got == want


def test_quality_report_nonidentifier_names(tables):
    # unnamed expr rules and dashed names must not break the stack()
    # reshape (review finding: unquoted selectExpr interpolation)
    out = quality_report(
        tables["orders"],
        [
            {"expr": "o_totalprice > 0"},
            {"name": "price-not-null", "not_null": "o_totalprice"},
        ],
    ).collect()
    assert len(out) == 2
    assert all(r["violations"] == 0 for r in out)


def test_unique_violations_limit_zero(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    assert unique_violations(df, ["k"], limit=0).count() == 0


def test_snapshot_diff_key_only_membership(spark):
    old = spark.createDataFrame([(1,), (2,)], "k int")
    new = spark.createDataFrame([(2,), (3,)], "k int")
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "removed", 3: "added"}


def test_k_anonymity_violations(tables, duck):
    from semantic_olap_spark.functions.quality import (
        k_anonymity_violations,
    )

    out = k_anonymity_violations(
        tables["customer"], ["c_nationkey", "c_mktsegment"], k=3
    )
    assert_matches(
        out,
        duck,
        """
        SELECT c_nationkey, c_mktsegment, count(*) AS group_size
        FROM customer GROUP BY 1, 2 HAVING count(*) < 3
        """,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        k_anonymity_violations(tables["customer"], ["c_nationkey"], k=0)
