"""Sink layer: partitioned writes, compaction, streaming file sink."""

import glob

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.sources.sinks import (
    compact,
    write_partitioned,
    write_stream_parquet,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_write_partitioned_roundtrip_and_layout(spark, tables, tmp_path):
    docs = tables["documents"]
    out = str(tmp_path / "docs")
    write_partitioned(docs, out, partition_by=["source"])
    back = spark.read.parquet(out)
    cols = ["doc_id", "text", "source"]
    assert _rows(back, cols) == _rows(docs, cols)
    # hive layout: one directory per source value
    parts = {p.split("=")[1] for p in glob.glob(f"{out}/source=*")
             for p in [p.rsplit("/", 1)[1]]}
    want = {r["source"] for r in docs.select("source").distinct().collect()}
    assert parts == want


def test_write_partitioned_bounds_file_size(spark, tables, tmp_path):
    docs = tables["documents"].coalesce(1)
    out = str(tmp_path / "bounded")
    write_partitioned(docs, out, max_records_per_file=100)
    files = glob.glob(f"{out}/*.parquet")
    n = tables["documents"].count()
    # a single 500-row task must have split into >= n/100 files
    assert len(files) >= n // 100


def test_compact_merges_small_files(spark, tables, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compacted")
    # fragment: 32 tasks x partitioned-by-source -> many tiny files
    tables["documents"].repartition(32).write.partitionBy(
        "source"
    ).parquet(src)
    n_before = len(glob.glob(f"{src}/source=*/*.parquet"))
    compact(spark, src, dst)
    n_after = len(glob.glob(f"{dst}/source=*/*.parquet"))
    assert n_after < n_before
    # layout preserved (partition columns auto-detected) + data equal
    assert glob.glob(f"{dst}/source=*")
    cols = ["doc_id", "text", "source"]
    assert _rows(spark.read.parquet(dst), cols) == _rows(
        tables["documents"], cols
    )


def test_compact_refuses_in_place(spark, tmp_path):
    with pytest.raises(ValueError, match="swap"):
        compact(spark, str(tmp_path / "p"), str(tmp_path / "p"))


def test_write_stream_parquet_exactly_once(spark, tables, tmp_path):
    src = str(tmp_path / "stream_src")
    tables["events"].select("event_id", "user_id", "value").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = write_stream_parquet(stream, out, ckpt, trigger_once=True)
    assert q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == tables["events"].count()
    # restart with the same checkpoint: nothing new -> no duplicates
    q2 = write_stream_parquet(
        spark.readStream.schema(schema).parquet(src), out, ckpt,
        trigger_once=True,
    )
    assert q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == tables["events"].count()


def test_orc_roundtrip_partitioned_and_compact(spark, tables, tmp_path):
    from semantic_olap_spark.sources.loaders import load_orc

    docs = tables["documents"]
    out = str(tmp_path / "docs_orc")
    write_partitioned(docs, out, partition_by=["source"], format="orc")
    assert glob.glob(f"{out}/source=*/*.orc")
    back = load_orc(spark, out)
    cols = ["doc_id", "text", "source"]
    assert _rows(back, cols) == _rows(docs, cols)
    # compaction preserves format and layout
    dst = str(tmp_path / "docs_orc2")
    compact(spark, out, dst, format="orc")
    assert glob.glob(f"{dst}/source=*/*.orc")
    assert _rows(load_orc(spark, dst), cols) == _rows(docs, cols)


def test_orc_scan_prunes_and_pushes_down(spark, tables, tmp_path):
    from semantic_olap_spark.sources.loaders import load_orc

    docs = tables["documents"]
    out = str(tmp_path / "docs_orc_scan")
    write_partitioned(docs, out, partition_by=["source"], format="orc")
    q = (
        load_orc(spark, out)
        .filter((F.col("source") == "src1") & (F.col("n_chars") > 100))
        .select("doc_id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the source predicate became a PartitionFilter
    # (inputFiles() lists the unpruned relation, so assert on the plan)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "src1" in pf
    # predicate pushdown reaches the ORC scan
    assert "PushedFilters: [" in plan and "n_chars" in plan.split(
        "PushedFilters", 1
    )[1].split("]", 1)[0]


def test_write_partitioned_rejects_unknown_format(spark, tables):
    with pytest.raises(ValueError):
        write_partitioned(tables["documents"], "/tmp/x", format="avro")


def test_jsonl_export_roundtrip(spark, tables, tmp_path):
    from semantic_olap_spark.sources.loaders import load_jsonl

    docs = tables["documents"].select("doc_id", "text", "source")
    out = str(tmp_path / "docs_jsonl")
    write_partitioned(docs, out, format="json")
    assert glob.glob(f"{out}/*.json")
    back = load_jsonl(spark, out)
    cols = ["doc_id", "text", "source"]
    assert _rows(back, cols) == _rows(docs, cols)


def test_write_shards_deterministic_manifest_and_roundtrip(
    spark, tables, tmp_path
):
    from semantic_olap_spark.sources.sinks import write_shards

    docs = tables["documents"]
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_shards(docs, p1, ["doc_id"], rows_per_shard=150, seed=7)
    m2 = write_shards(docs, p2, ["doc_id"], rows_per_shard=150, seed=7)
    n = docs.count()
    assert m1["n_rows"] == n
    assert m1["n_shards"] == m1["expected_shards"] == (n + 149) // 150
    # same seed → identical shard census AND identical shard contents
    assert m1["shards"] == m2["shards"]
    a = spark.read.parquet(p1).select("doc_id", "shard", "shuffle_rank")
    b = spark.read.parquet(p2).select("doc_id", "shard", "shuffle_rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # shards are contiguous rank ranges of the right size
    for s in m1["shards"][:-1]:
        assert s["rows"] == 150
        assert s["max_rank"] - s["min_rank"] + 1 == s["rows"]
        assert s["min_rank"] == s["shard"] * 150
    # manifest persisted next to the data
    import json, os
    with open(os.path.join(p1, "_manifest.json")) as fh:
        disk = json.load(fh)
    assert disk == m1
    # hive layout: shard=K dirs, one data file each
    kdirs = [d for d in os.listdir(p1) if d.startswith("shard=")]
    assert len(kdirs) == m1["n_shards"]
    for d in kdirs:
        files = [f for f in os.listdir(os.path.join(p1, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_write_shards_seed_changes_contents(spark, tables, tmp_path):
    from semantic_olap_spark.sources.sinks import write_shards

    docs = tables["documents"]
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_shards(docs, p1, ["doc_id"], rows_per_shard=100, seed=1)
    write_shards(docs, p2, ["doc_id"], rows_per_shard=100, seed=2)
    a = {r.doc_id for r in
         spark.read.parquet(p1).filter("shard = 0").collect()}
    b = {r.doc_id for r in
         spark.read.parquet(p2).filter("shard = 0").collect()}
    assert a != b


def test_write_shards_validates_args(tables, tmp_path):
    import pytest

    from semantic_olap_spark.sources.sinks import write_shards

    with pytest.raises(ValueError):
        write_shards(tables["documents"], str(tmp_path / "x"),
                     ["doc_id"], rows_per_shard=0)
    with pytest.raises(ValueError):
        write_shards(tables["documents"], str(tmp_path / "y"),
                     ["doc_id"], format="avro")
