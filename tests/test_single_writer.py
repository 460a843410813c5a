"""Round-13 pins: the single-writer contract on persisted state.

VERDICT r12 ask #5: the cube directory and the span-index delta tree
are parquet + manifest/marker layouts, correct for ONE writer; the
contract is now documented (save_cube docstring, spans.py module
docstring) and its detectable violations REFUSE loudly:

1. concurrent ``save_cube_incremental`` checkpoints race the delta
   manifest — the commit is an exclusive create (link(2)), so
   exactly one writer wins and the loser aborts with a remedy
   instead of silently interleaving frames;
2. a second span stream with a fresh checkpoint (the reused-path
   concurrent-writer shape) trips the existing newer-delta refusal
   — pinned here as part of the same contract.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.plans.memory import (
    CubeMemory,
    load_cube,
    save_cube_incremental,
)
from semantic_olap_spark.streaming.spans import fold_span_batch


def _build(tables):
    mem = CubeMemory(tables["documents"])
    root = mem.nodes[mem.root_id]
    spark_docs = root.df.filter(F.lower(F.col("text")).contains("spark"))
    mem.add_node(
        "mentions spark", spark_docs,
        [{"operator_name": "keyword_filter",
          "parameters": {"columns": ["text"], "keywords": ["spark"]}}],
        [mem.root_id],
    )
    return mem


def test_concurrent_manifest_commit_refused(tmp_path):
    """The race window is manifest-read → commit: the commit refuses
    if the delta chain changed since the checkpoint's directory view
    (same window in which both writers allocate the same dir ids),
    and the final create itself is exclusive (link(2))."""
    from semantic_olap_spark.plans.memory import _commit_delta_manifest
    from semantic_olap_spark.streaming.statefs import LocalStateFS

    lfs = LocalStateFS()
    d = str(tmp_path / "cube")
    os.makedirs(d)
    # writer A read the directory when it held no deltas; writer B
    # commits delta-000001 while A is still writing frames
    with open(os.path.join(d, "delta-000001.json"), "w") as f:
        json.dump({"nodes": []}, f)
    with pytest.raises(ValueError, match="CONCURRENT"):
        _commit_delta_manifest(lfs, d, [{"id": 7}], deltas_at_read=[])
    # the loser left no manifest (tmp or final) of its own behind
    assert sorted(os.listdir(d)) == ["delta-000001.json"]

    # exact-collision branch: chain view matches, but the target
    # file appears between the re-check and the link — simulate by
    # passing a stale-but-matching view with the target pre-created
    with pytest.raises(ValueError, match="CONCURRENT"):
        _commit_delta_manifest(
            lfs, d, [{"id": 8}], deltas_at_read=["delta-000001.json"],
        ) or _commit_delta_manifest(
            lfs, d, [{"id": 9}], deltas_at_read=["delta-000001.json"],
        )
    # first call committed delta-000002; the repeat with the SAME
    # stale view trips the chain check
    assert os.path.exists(os.path.join(d, "delta-000002.json"))


def test_serialized_checkpoints_still_work(tables, spark, tmp_path):
    """Same shape, no race: once the conflicting delta is accounted
    for (reload from disk), checkpointing resumes normally."""
    d = str(tmp_path / "cube")
    mem = _build(tables)
    save_cube_incremental(mem, d)
    mem2 = load_cube(spark, d)
    root = mem2.nodes[mem2.root_id]
    scan_docs = root.df.filter(F.lower(F.col("text")).contains("scan"))
    mem2.add_node(
        "mentions scan", scan_docs,
        [{"operator_name": "keyword_filter",
          "parameters": {"columns": ["text"], "keywords": ["scan"]}}],
        [mem2.root_id],
    )
    save_cube_incremental(mem2, d)
    assert os.path.exists(os.path.join(d, "delta-000001.json"))
    assert len(load_cube(spark, d).nodes) == 3


def test_second_span_stream_fresh_checkpoint_refused(spark, tmp_path):
    """The span-index shape of the same contract: a second writer
    (fresh checkpoint, epochs restarting at 0) against an index that
    already holds committed deltas is refused, not merged."""
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    fold_span_batch(docs, 0, idx, out, k=4)
    fold_span_batch(docs, 1, idx, out, k=4)
    with pytest.raises(ValueError, match="different stream run"):
        fold_span_batch(docs, 0, idx, str(tmp_path / "out2"), k=4)
