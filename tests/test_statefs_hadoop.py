"""Round-13 pins: the streaming state layer's Hadoop FileSystem port.

The marker/list/rename surface (``statefs.StateFS``) now has two
implementations: os-level for plain local paths and the Hadoop
``FileSystem`` API (``spark._jvm.org.apache.hadoop.fs``) for
URI-form paths.  A ``file://`` URI resolves to Hadoop's
``LocalFileSystem`` — the exact code path an HDFS deployment runs,
minus the namenode — so these tests drive spans + materialized state
end to end through :class:`HadoopStateFS` and assert the class is
actually the one serving the path (not the local fallback).

Also pinned here (ADVICE r12, all four):
1. the Spark-side path is always a ``file://`` URI, never a bare
   path that a non-local ``fs.defaultFS`` could re-root;
2. the delta write forces ``partitionOverwriteMode=static``
   per-write, so a session-wide ``dynamic`` setting cannot leave a
   crashed attempt's stale ``h_bucket=`` dirs to poison the census;
3. a relative path whose first segment contains a colon
   (``run:2024/state``) is a legal LOCAL path, not a URI scheme;
4. ``pruned_dirs`` counts bucketed-dir skips identically on the
   gram-less early return and the main probe path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.streaming.materialized import (
    fold_batch,
    read_agg_state,
)
from semantic_olap_spark.streaming.spans import (
    _BUCKET_RE,
    _N_MARKER,
    _probe_paths,
    compact_span_index,
    fold_span_batch,
    read_clean_output,
    read_span_index,
    replace_index_with_compacted,
)
from semantic_olap_spark.streaming.statefs import (
    HadoopStateFS,
    LocalStateFS,
    resolve_state_fs,
)

BOILER = "alpha beta gamma delta epsilon zeta"  # 6 tokens, k=4 spans
K = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(df) -> dict:
    return {r["doc_id"]: r["text"] for r in df.collect()}


# ---- resolver unit matrix ------------------------------------------------


def test_plain_path_uses_local_fs():
    fs, p = resolve_state_fs("/tmp/x/state")
    assert isinstance(fs, LocalStateFS)
    assert p == "/tmp/x/state"


def test_colon_bearing_relative_path_is_local():
    """``run:2024/state`` is a legal local path (the colon is not
    followed by a slash, so it is not a URI scheme) — ADVICE r12 #3."""
    fs, p = resolve_state_fs("run:2024/state")
    assert isinstance(fs, LocalStateFS)
    assert p == "run:2024/state"


def test_file_uri_with_session_uses_hadoop_fs(spark):
    fs, p = resolve_state_fs("file:///tmp/x", spark=spark)
    assert isinstance(fs, HadoopStateFS)
    assert p == "file:///tmp/x"  # URI preserved, never stripped


def test_file_uri_without_session_falls_back_local():
    fs, p = resolve_state_fs("file:///tmp/x")
    assert isinstance(fs, LocalStateFS)
    assert p == "/tmp/x"


def test_hdfs_uri_without_session_asks_for_one():
    with pytest.raises(ValueError, match="SparkSession"):
        resolve_state_fs("hdfs://nn/state")


def test_object_store_refusal_names_manifest_remedy():
    for uri in ("s3a://bkt/x", "gs://bkt/x", "abfss://c@a/x"):
        with pytest.raises(ValueError, match="manifest-based commit"):
            resolve_state_fs(uri, spark=None)


def test_unknown_scheme_refused():
    with pytest.raises(ValueError, match="rename-atomic"):
        resolve_state_fs("ftp://host/x")


def test_local_spark_path_is_file_uri():
    """ADVICE r12 #1: the path handed to Spark always carries the
    file:// scheme, so a non-local fs.defaultFS can never re-root
    the parquet side away from the os-level markers."""
    fs = LocalStateFS()
    assert fs.spark_path("/tmp/x").startswith("file:///")
    assert fs.spark_path("rel/x") == "file://" + os.path.abspath("rel/x")


# ---- HadoopStateFS primitive surface (against LocalFileSystem) -----------


def test_hadoop_fs_primitives(spark, tmp_path):
    root = "file://" + str(tmp_path / "hfs")
    fs = HadoopStateFS(spark, root)
    assert not fs.exists(root)
    fs.makedirs(root + "/a/b")
    assert fs.isdir(root + "/a/b")
    fs.write_text(root + "/a/b/_MARK", "42")
    assert fs.read_text(root + "/a/b/_MARK") == "42"
    # the write really landed on the local disk (same tree the
    # os-level implementation would use)
    assert (tmp_path / "hfs" / "a" / "b" / "_MARK").read_text() == "42"
    names = fs.listdir(root + "/a/b")
    assert "_MARK" in names
    fs.move(root + "/a/b", root + "/a/c")
    assert fs.exists(root + "/a/c/_MARK")
    assert not fs.exists(root + "/a/b")
    assert fs.tree_parquet_bytes(root + "/a") == 0
    fs.rmtree(root + "/a")
    assert not fs.exists(root + "/a")
    with pytest.raises(FileNotFoundError):
        fs.listdir(root + "/a")
    fs.rmtree(root + "/nope", ignore_errors=True)  # no raise


# ---- spans end-to-end through file:// (Hadoop code path) -----------------


def test_span_ingest_end_to_end_via_hadoop_fs(spark, tmp_path):
    """Two epochs + compaction + swap + replay, every state path a
    file:// URI — the full span-index lifecycle through the Hadoop
    FileSystem implementation."""
    idx = "file://" + str(tmp_path / "idx")
    out = "file://" + str(tmp_path / "out")
    fs, _ = resolve_state_fs(idx, spark=spark)
    assert isinstance(fs, HadoopStateFS)  # the port is what runs

    stats: dict = {}
    fold_span_batch(
        _docs(spark, [(1, f"one admits {BOILER} first time")]),
        0, idx, out, k=K, n_buckets=8,
    )
    fold_span_batch(
        _docs(spark, [(2, f"two repeats {BOILER} later on")]),
        1, idx, out, k=K, n_buckets=8, stats=stats,
    )
    got = _texts(read_clean_output(spark, out))
    assert BOILER in got[1] and BOILER not in got[2]
    # probe stats flow through the Hadoop surface too
    assert stats["probe_bytes"] > 0 and stats["buckets_probed"]

    # markers landed on the same local tree (URI and os view agree)
    assert (tmp_path / "idx" / "delta=0" / "_STATE_COMMITTED").exists()
    assert (
        tmp_path / "idx" / "delta=0" / _N_MARKER
    ).read_text() == "8"

    # compaction + rename-swap through Hadoop rename
    compacted = "file://" + str(tmp_path / "c")
    compact_span_index(spark, idx, compacted, n_buckets=8)
    replace_index_with_compacted(idx, compacted, spark=spark)
    assert read_span_index(spark, idx).count() > 0
    assert (tmp_path / "idx" / "delta=1" / "_COMPACTED").exists()

    # epoch 2 probes the compacted tree and still strips the boiler
    fold_span_batch(
        _docs(spark, [(3, f"three repeats {BOILER} again")]),
        2, idx, out, k=K, n_buckets=8,
    )
    got = _texts(read_clean_output(spark, out))
    assert BOILER not in got[3]


def test_span_replay_idempotent_via_hadoop_fs(spark, tmp_path):
    """A replayed epoch through file:// reproduces, never duplicates
    — the commit-marker discipline holds on the Hadoop surface."""
    idx = "file://" + str(tmp_path / "idx")
    out = "file://" + str(tmp_path / "out")
    b0 = _docs(spark, [(1, f"one admits {BOILER} once")])
    b1 = _docs(spark, [(2, f"two repeats {BOILER} twice")])
    fold_span_batch(b0, 0, idx, out, k=K, n_buckets=8)
    fold_span_batch(b1, 1, idx, out, k=K, n_buckets=8)
    first = _texts(read_clean_output(spark, out))
    fold_span_batch(b1, 1, idx, out, k=K, n_buckets=8)  # replay
    assert _texts(read_clean_output(spark, out)) == first


def test_mixed_path_forms_refused_for_swap(spark, tmp_path):
    idx = "file://" + str(tmp_path / "idx")
    fold_span_batch(
        _docs(spark, [(1, f"x {BOILER} y")]), 0, idx,
        "file://" + str(tmp_path / "out"), k=K, n_buckets=8,
    )
    compacted = str(tmp_path / "c")  # plain local form
    compact_span_index(spark, idx, compacted, n_buckets=8)
    with pytest.raises(ValueError, match="different state"):
        replace_index_with_compacted(idx, compacted, spark=spark)


# ---- materialized state end-to-end through file:// -----------------------


def test_agg_state_folds_via_hadoop_fs(spark, tmp_path):
    state = "file://" + str(tmp_path / "state")
    fs, _ = resolve_state_fs(state, spark=spark)
    assert isinstance(fs, HadoopStateFS)
    b0 = spark.range(5).select(F.col("id").cast("double").alias("v"))
    b1 = spark.range(5, 8).select(F.col("id").cast("double").alias("v"))
    fold_batch(b0, 0, state, ["v"])
    fold_batch(b1, 1, state, ["v"])
    st = read_agg_state(spark, state)
    row = st.collect()[0]
    assert row["v_count"] == 8 and row["v_sum"] == sum(range(8))
    # replay epoch 1: no double count
    fold_batch(b1, 1, state, ["v"])
    assert read_agg_state(spark, state).collect()[0]["v_count"] == 8
    # markers visible on the local tree
    assert (
        tmp_path / "state" / "epoch=1" / "_STATE_COMMITTED"
    ).exists()


# ---- cube persistence end-to-end through file:// -------------------------


def test_cube_roundtrip_via_hadoop_fs(spark, tables, tmp_path):
    """save_cube / incremental checkpoint / load_cube with the cube
    path as a file:// URI — manifests and frames both through the
    Hadoop surface, exclusive delta commit included."""
    from semantic_olap_spark.plans.memory import (
        CubeMemory,
        load_cube,
        save_cube_incremental,
    )

    d = "file://" + str(tmp_path / "cube")
    mem = CubeMemory(tables["documents"])
    root = mem.nodes[mem.root_id]
    mem.add_node(
        "mentions spark",
        root.df.filter(F.lower(F.col("text")).contains("spark")),
        [{"operator_name": "keyword_filter",
          "parameters": {"columns": ["text"], "keywords": ["spark"]}}],
        [mem.root_id],
    )
    save_cube_incremental(mem, d)  # full save through Hadoop fs
    assert (tmp_path / "cube" / "cube.json").exists()
    mem.add_node(
        "mentions join",
        root.df.filter(F.lower(F.col("text")).contains("join")),
        [{"operator_name": "keyword_filter",
          "parameters": {"columns": ["text"], "keywords": ["join"]}}],
        [mem.root_id],
    )
    save_cube_incremental(mem, d)  # delta through publish_exclusive
    assert (tmp_path / "cube" / "delta-000001.json").exists()
    m2 = load_cube(spark, d)
    assert len(m2.nodes) == 3
    assert {n.query for n in m2.nodes.values()} == {
        "All Data", "mentions spark", "mentions join"
    }
    assert all(n.df.count() >= 0 for n in m2.nodes.values())


def test_cube_object_store_refused(spark):
    from semantic_olap_spark.plans.memory import load_cube

    with pytest.raises(ValueError, match="cube persistence layer"):
        load_cube(spark, "s3a://bkt/cube")


# ---- ADVICE r12 #2: dynamic partitionOverwriteMode poisoning -------------


def test_delta_write_static_overwrite_despite_dynamic_session(
    spark, tmp_path
):
    """With session-wide partitionOverwriteMode=dynamic, a replayed
    epoch must still WIPE the whole delta dir: a crashed attempt
    written at a different n_buckets would otherwise leave stale
    h_bucket= dirs that the census over-counts and the fresh
    _N_BUCKETS marker mislabels."""
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    b = _docs(spark, [(1, f"one has {BOILER} inside")])
    # simulate the crashed attempt: delta=0 bucketed at N=64, parquet
    # written, NOT committed (no marker)
    fold_span_batch(b, 0, idx, out, k=K, n_buckets=64)
    os.remove(os.path.join(idx, "delta=0", "_STATE_COMMITTED"))
    os.remove(os.path.join(idx, "delta=0", _N_MARKER))
    stale = {
        n for n in os.listdir(os.path.join(idx, "delta=0"))
        if _BUCKET_RE.match(n)
    }
    assert stale  # the hazard exists
    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf, "static")
    spark.conf.set(conf, "dynamic")
    try:
        # the replay writes at N=4 — every surviving h_bucket= dir
        # must come from THIS attempt (mod 4 → buckets < 4)
        fold_span_batch(b, 0, idx, out, k=K, n_buckets=4)
    finally:
        spark.conf.set(conf, prev)
    now = {
        n for n in os.listdir(os.path.join(idx, "delta=0"))
        if _BUCKET_RE.match(n)
    }
    assert all(int(n.split("=")[1]) < 4 for n in now), now
    with open(os.path.join(idx, "delta=0", _N_MARKER)) as f:
        assert f.read().strip() == "4"


# ---- ADVICE r12 #4: pruned_dirs consistency ------------------------------


def test_gramless_probe_counts_only_bucketed_skips(tmp_path):
    """The gram-less early return and the main path agree: a skipped
    legacy FLAT delta contributes 0 to pruned_dirs on both."""
    idx = str(tmp_path / "idx")
    # legacy flat delta
    os.makedirs(os.path.join(idx, "delta=0"))
    open(os.path.join(idx, "delta=0", "y.parquet"), "w").close()
    # bucketed delta with 2 buckets
    for b in (1, 3):
        os.makedirs(os.path.join(idx, "delta=1", f"h_bucket={b}"))
        open(
            os.path.join(idx, "delta=1", f"h_bucket={b}", "x.parquet"),
            "w",
        ).close()
    with open(os.path.join(idx, "delta=1", _N_MARKER), "w") as f:
        f.write("16")
    lfs = LocalStateFS()
    # gram-less: no paths, pruned counts ONLY the 2 bucketed dirs
    paths, pruned, mismatched = _probe_paths(
        lfs, idx, [0, 1], buckets=[], n_buckets=16
    )
    assert paths == [] and mismatched == 0
    assert pruned == 2  # not 3: the flat delta is not a pruned bucket
