"""Z-order layout: key correctness and the file-skipping payoff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.sources.layout import write_zordered, zorder_key


def _files_touched(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    return (
        df.select(F.input_file_name().alias("f")).distinct().count(),
        df.count(),
    )


def test_zorder_key_locality(tables):
    # rows close in BOTH dimensions share high key bits: the key of
    # (lo,lo) and (hi,hi) quantile corners must straddle the keys of
    # mixed corners
    li = tables["lineitem"]
    keyed = li.withColumn(
        "_z", zorder_key(li, ["l_extendedprice", "l_quantity"], bits=4)
    )
    rows = keyed.select("l_extendedprice", "l_quantity", "_z").collect()
    assert all(r["_z"] is not None and r["_z"] >= 0 for r in rows)
    # keys span more than one value ⇒ buckets actually differentiate
    assert len({r["_z"] for r in rows}) > 16


def test_zorder_key_validations(tables):
    li = tables["lineitem"]
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_key(li, ["l_quantity"])
    with pytest.raises(ValueError, match="fit a long"):
        zorder_key(li, ["l_quantity", "l_tax", "l_discount"], bits=21)


def test_zorder_write_skips_files(spark, tmp_path, tables):
    li = tables["lineitem"].select(
        "l_orderkey", "l_extendedprice", "l_quantity", "l_discount"
    )
    z_path = str(tmp_path / "zorder")
    h_path = str(tmp_path / "hashed")
    write_zordered(li, z_path, ["l_extendedprice", "l_quantity"], num_files=16)
    li.repartition(16).write.parquet(h_path)

    # a selective rectangle in (price, quantity) space (~3% of rows
    # — enough that the hash layout touches ~every file whp)
    pred = (
        "l_extendedprice between 1000 and 20000 "
        "and l_quantity between 1 and 10"
    )
    z_files, z_rows = _files_touched(spark, z_path, pred)
    h_files, h_rows = _files_touched(spark, h_path, pred)
    assert z_rows == h_rows  # layout never changes results
    # hash layout smears the rectangle over ~every file; z-order
    # confines it to the files whose rectangle intersects it
    assert h_files >= 12, h_files
    assert z_files <= h_files // 2, (z_files, h_files)


def test_zorder_write_no_single_partition_stage(tables, tmp_path):
    # the layout job itself must stay distributed: range shuffle,
    # no windows, no SinglePartition exchange
    li = tables["lineitem"]
    key = zorder_key(li, ["l_extendedprice", "l_quantity"])
    plan = (
        li.withColumn("_zkey", key)
        .repartitionByRange(8, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_zorder_key_on_date_column(tables):
    # dates z-order chronologically (review finding: try_cast DATE →
    # DOUBLE is an analysis error)
    li = tables["lineitem"]
    keyed = li.withColumn(
        "_z", zorder_key(li, ["l_shipdate", "l_extendedprice"], bits=4)
    )
    rows = keyed.select("l_shipdate", "_z").collect()
    assert all(r["_z"] is not None for r in rows)
    assert len({r["_z"] for r in rows}) > 8
