"""Round-10 review fixes (ADVICE r9), each pinned by a regression test.

1. shuffle_rows validates uniqueness on the SAME joined key string the
   md5 order consumes — key tuples that alias through the "\\x1f"
   separator (or the null sentinel) now FAIL validation instead of
   silently sharing one shuffle key and reintroducing shuffle-fetch
   nondeterminism.
2. lineage_cut's eager reliable path scratch-persists only frames the
   caller has NOT already persisted — the finally-unpersist must never
   evict a cache the caller owns.
3. lineage_cut's checkpoint-dir memo re-verifies the live value: if
   foreign code called sc.setCheckpointDir directly, the next
   lineage_cut re-points the context at OUR dir instead of silently
   checkpointing into the foreign one.
"""

import tempfile

import pytest
from pyspark import StorageLevel

from semantic_olap_spark.caching import lineage_cut
from semantic_olap_spark.functions.sampling import shuffle_rows


# ---- 1. separator-aliasing keys fail uniqueness validation ------------


def test_shuffle_rows_separator_collision_raises(spark):
    # ("a\x1fb", "c") and ("a", "b\x1fc") join to the same key string
    df = spark.createDataFrame(
        [("a\x1fb", "c"), ("a", "b\x1fc")], "k1 string, k2 string"
    )
    with pytest.raises(ValueError, match="unique key_cols"):
        shuffle_rows(df, ["k1", "k2"], seed=7).collect()


def test_shuffle_rows_null_sentinel_collision_raises(spark):
    # a literal "\x00<null>" value collides with the null sentinel
    df = spark.createDataFrame(
        [("\x00<null>",), (None,)], "k1 string"
    )
    with pytest.raises(ValueError, match="unique key_cols"):
        shuffle_rows(df, ["k1"], seed=7).collect()


def test_shuffle_rows_distinct_keys_still_pass(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "k long")
    out = shuffle_rows(df, ["k"], seed=3)
    ranks = [r["shuffle_rank"] for r in out.orderBy("shuffle_rank").collect()]
    assert ranks == list(range(20))


# ---- 2. caller-persisted frames are not evicted ------------------------


def test_lineage_cut_preserves_caller_persist(spark, tmp_path):
    df = spark.range(100).persist(StorageLevel.MEMORY_ONLY)
    try:
        df.count()
        assert df.storageLevel.useMemory
        out = lineage_cut(df, checkpoint_dir=str(tmp_path / "ckpt"))
        assert out.count() == 100
        # the caller's cache must survive the cut
        assert df.storageLevel.useMemory, (
            "lineage_cut evicted a cache the caller owns"
        )
    finally:
        df.unpersist()


def test_lineage_cut_scratch_persist_released(spark, tmp_path):
    df = spark.range(100)
    out = lineage_cut(df, checkpoint_dir=str(tmp_path / "ckpt2"))
    assert out.count() == 100
    # the un-persisted input stays un-persisted after the cut
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


# ---- 3. memo re-verifies against a foreign setCheckpointDir -----------


def test_lineage_cut_recovers_from_foreign_setCheckpointDir(spark, tmp_path):
    sc = spark.sparkContext
    ours = str(tmp_path / "ours")
    foreign = str(tmp_path / "foreign")

    lineage_cut(spark.range(10), checkpoint_dir=ours).count()
    live = sc.getCheckpointDir() or ""
    assert ours in live

    # foreign code bypasses lineage_cut
    sc.setCheckpointDir(foreign)
    assert foreign in (sc.getCheckpointDir() or "")

    # next cut must notice and re-point at OUR dir
    lineage_cut(spark.range(10), checkpoint_dir=ours).count()
    live = sc.getCheckpointDir() or ""
    assert ours in live and foreign not in live


# ---- 4. (self-review) sibling-prefix checkpoint dir is NOT ours --------


def test_lineage_cut_sibling_prefix_dir_not_trusted(spark, tmp_path):
    """/data/ckpt_backup must not satisfy a /data/ckpt re-verify —
    a raw startswith would accept the foreign sibling and silently
    checkpoint into it."""
    sc = spark.sparkContext
    ours = str(tmp_path / "ckpt")
    sibling = str(tmp_path / "ckpt_backup")

    lineage_cut(spark.range(5), checkpoint_dir=ours).count()
    sc.setCheckpointDir(sibling)  # foreign code, prefix-sharing dir
    lineage_cut(spark.range(5), checkpoint_dir=ours).count()
    live = sc.getCheckpointDir() or ""
    assert "ckpt_backup" not in live and "/ckpt" in live


# ---- 5. (self-review) shared PYTHONPATH scrub helper -------------------


def test_scrub_repo_from_pythonpath(monkeypatch):
    import os
    import sys

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, _repo)
    from tools.build_wheel import scrub_repo_from_pythonpath

    monkeypatch.setenv(
        "PYTHONPATH", os.pathsep.join([_repo, "/somewhere/else"])
    )
    scrub_repo_from_pythonpath(_repo)
    assert os.environ["PYTHONPATH"] == "/somewhere/else"

    monkeypatch.setenv("PYTHONPATH", _repo)
    scrub_repo_from_pythonpath(_repo)
    assert "PYTHONPATH" not in os.environ

    monkeypatch.delenv("PYTHONPATH", raising=False)
    scrub_repo_from_pythonpath(_repo)  # no-op, no KeyError
