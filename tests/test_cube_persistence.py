"""save_cube / load_cube: cross-session lattice reuse."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_olap_spark.plans.memory import (
    CubeMemory,
    load_cube,
    save_cube,
)


def _build(tables):
    mem = CubeMemory(tables["documents"])
    root = mem.nodes[mem.root_id]
    spark_docs = root.df.filter(F.lower(F.col("text")).contains("spark"))
    n1 = mem.add_node(
        "mentions spark", spark_docs,
        [{"operator_name": "keyword_filter",
          "parameters": {"columns": ["text"], "keywords": ["spark"]}}],
        [mem.root_id],
    )
    labels = n1.df.select("OLAP_ID", F.col("lang").alias("lang_family"))
    mem.register_granularity(
        n1.id, "lang", "lang_family", labels, "coarser lang buckets"
    )
    return mem, n1


def test_save_load_round_trip(tables, spark, tmp_path):
    mem, n1 = _build(tables)
    d = str(tmp_path / "cube")
    save_cube(mem, d)

    mem2 = load_cube(spark, d)
    assert len(mem2.nodes) == 2
    root2 = mem2.nodes[mem2.root_id]
    assert root2.query == "All Data"
    assert root2.df.count() == mem.nodes[mem.root_id].df.count()

    # Equal probe hits the reloaded child without recomputation
    hit, _ = mem2.get_current_node("mentions spark")
    assert hit is not None
    assert hit.df.count() == n1.df.count()
    assert hit.plan[0]["operator_name"] == "keyword_filter"
    # topology preserved
    assert hit.parents == [mem2.root_id]

    # granularity catalog restored, label join works
    g = mem2.find_granularity(hit.id, "lang", "lang_family")
    assert g is not None and g.description == "coarser lang buckets"
    joined = mem2.attach_labels(hit.id, g)
    assert joined.filter(F.col("lang_family").isNull()).count() == 0


def test_loaded_frames_are_disk_backed(tables, spark, tmp_path):
    mem, _ = _build(tables)
    d = str(tmp_path / "cube2")
    save_cube(mem, d)
    mem2 = load_cube(spark, d)
    hit, _ = mem2.get_current_node("mentions spark")
    plan = hit.df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan  # scan, not an in-memory relation
    # pushdown applies to reuse-time filters on the materialized node
    filtered = hit.df.filter(F.col("doc_id") > 100)
    fplan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in fplan


def test_engine_save_load(tables, spark, tmp_path):
    from semantic_olap_spark.engine import OlapEngine

    eng = OlapEngine(tables["documents"], order_by=["doc_id"])
    n = eng.run("mentions spark in text").count()
    d = str(tmp_path / "engine_cube")
    eng.save(d)

    eng2 = OlapEngine.load(spark, d)
    # Equal probe reuses the reloaded node — same rows, no recompute
    out = eng2.run("mentions spark in text")
    assert out.count() == n
    assert len(eng2.memory.nodes) == len(eng.memory.nodes)
