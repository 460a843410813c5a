"""Histogram + correlation matrix vs the DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.stats import corr_matrix, histogram
from tests.conftest import assert_matches


def test_histogram_oracle(tables, duck):
    out = histogram(tables["orders"], "o_totalprice", bins=10, lo=0.0, hi=600000.0)
    assert_matches(
        out,
        duck,
        """
        WITH spine AS (
          SELECT unnest(generate_series(0, 9))::BIGINT AS bin
        ), counts AS (
          SELECT least(floor(o_totalprice / 60000.0), 9)::BIGINT AS bin,
                 count(*) AS n
          FROM orders
          WHERE o_totalprice BETWEEN 0.0 AND 600000.0
          GROUP BY 1
        )
        SELECT s.bin,
               round(s.bin * 60000.0, 6) AS lo,
               round((s.bin + 1) * 60000.0, 6) AS hi,
               coalesce(c.n, 0) AS n
        FROM spine s LEFT JOIN counts c USING (bin)
        """,
    )


def test_histogram_covers_all_rows(tables):
    out = histogram(tables["orders"], "o_totalprice", bins=7)
    rows = out.collect()
    assert len(rows) == 7
    assert sum(r["n"] for r in rows) == tables["orders"].count()


def test_histogram_degenerate_and_errors(spark, tables):
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = histogram(one, "v", bins=3).collect()
    assert sum(r["n"] for r in rows) == 2
    with pytest.raises(ValueError, match="bins"):
        histogram(tables["orders"], "o_totalprice", bins=0)
    allnull = spark.createDataFrame([("x",), ("y",)], "v string")
    with pytest.raises(ValueError, match="no numeric"):
        histogram(allnull, "v", bins=3)


def test_corr_matrix_oracle(tables, duck):
    out = corr_matrix(
        tables["lineitem"],
        ["l_quantity", "l_extendedprice", "l_discount"],
    )
    assert_matches(
        out,
        duck,
        """
        SELECT * FROM (
          SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                 round(corr(l_quantity, l_extendedprice), 4) AS corr
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity', 'l_discount',
                 round(corr(l_quantity, l_discount), 4) FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', 'l_discount',
                 round(corr(l_extendedprice, l_discount), 4) FROM lineitem
        )
        """,
        float_tol=1e-4,
    )


def test_corr_matrix_self_correlation(spark):
    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(50)],
        "a double, b double, c double",
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert len(got) == 3


def test_histogram_explicit_lo_no_numeric(spark):
    allnull = spark.createDataFrame([("x",), ("y",)], "v string")
    with pytest.raises(ValueError, match="no numeric"):
        histogram(allnull, "v", bins=3, lo=0.0)
