"""Continuous ExactSubstr ingest (streaming/spans.py).

Core contract: a span admitted in epoch N is stripped from every
LATER epoch; within-epoch repetition survives (remove_duplicate_spans'
job — the two compose); every fold is replay-idempotent; the stream's
final output equals the batch-mode composition.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.dedup import (
    remove_spans_against,
    span_index,
)
from semantic_olap_spark.streaming.spans import (
    _committed,
    _DELTA_RE,
    _EPOCH_RE,
    compact_span_index,
    fold_span_batch,
    maintain_span_dedup,
    read_clean_output,
    read_span_index,
    replace_index_with_compacted,
)

BOILER = "alpha beta gamma delta epsilon zeta"  # 6 tokens, k=4 spans
K = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch1(spark):
    return _docs(spark, [
        (1, f"one unique opening {BOILER} and a tail"),
        (2, "totally unrelated text with no shared windows at all"),
    ])


def _batch2(spark):
    return _docs(spark, [
        (3, f"three starts here {BOILER} then differs completely"),
        (4, f"four also carries {BOILER} in the middle part"),
    ])


def _stage(src: str, df, name: str, mtime: int) -> None:
    staging = src + f"_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.makedirs(src, exist_ok=True)
    dst = os.path.join(src, f"{name}.parquet")
    shutil.copyfile(os.path.join(staging, part), dst)
    os.utime(dst, (mtime, mtime))


def _texts(df) -> dict:
    return {r["doc_id"]: r["text"] for r in df.collect()}


def _run(spark, src, schema, paths, **kw):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_span_dedup(
        stream, paths["idx"], paths["out"], paths["ckpt"],
        k=K, trigger_once=True, **kw,
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def paths(tmp_path):
    return {
        "idx": str(tmp_path / "idx"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
        "src": str(tmp_path / "src"),
    }


def test_stream_matches_batch_composition(spark, paths):
    b1, b2 = _batch1(spark), _batch2(spark)
    _stage(paths["src"], b1, "b1", 1_000)
    _stage(paths["src"], b2, "b2", 2_000)
    schema = b1.schema
    _run(spark, paths["src"], schema, paths)

    got = _texts(read_clean_output(spark, paths["out"]))
    # batch-mode composition: b1 against empty, b2 against idx(b1)
    empty = spark.createDataFrame([], "h long")
    want = _texts(remove_spans_against(b1, empty, k=K))
    want.update(_texts(remove_spans_against(b2, span_index(b1, k=K), k=K)))
    assert got == want
    # the boilerplate is admitted exactly once (doc 1), stripped later
    assert BOILER in got[1]
    assert BOILER not in got[3] and BOILER not in got[4]
    # the index holds both deltas
    assert _committed(paths["idx"], _DELTA_RE) == [0, 1]
    assert _committed(paths["out"], _EPOCH_RE) == [0, 1]


def test_within_batch_repetition_survives(spark, paths):
    # both docs share the span INSIDE one epoch: neither is stripped
    b = _batch2(spark)
    _stage(paths["src"], b, "b", 1_000)
    _run(spark, paths["src"], b.schema, paths)
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER in got[3] and BOILER in got[4]


def test_replay_is_idempotent(spark, paths):
    b1, b2 = _batch1(spark), _batch2(spark)
    _stage(paths["src"], b1, "b1", 1_000)
    _stage(paths["src"], b2, "b2", 2_000)
    _run(spark, paths["src"], b1.schema, paths)
    before = _texts(read_clean_output(spark, paths["out"]))

    # replay epoch 1 directly (the foreachBatch crash-retry path):
    # its own delta=1 already exists but must NOT be visible to the
    # replayed probe (prior = strictly below), so the output is
    # bit-identical, and nothing duplicates
    fold_span_batch(b2, 1, paths["idx"], paths["out"], k=K)
    after = _texts(read_clean_output(spark, paths["out"]))
    assert after == before
    assert read_clean_output(spark, paths["out"]).count() == 4


def test_kill_resume_continues_epochs(spark, paths):
    b1, b2 = _batch1(spark), _batch2(spark)
    _stage(paths["src"], b1, "b1", 1_000)
    _run(spark, paths["src"], b1.schema, paths)
    assert _committed(paths["out"], _EPOCH_RE) == [0]

    # session "dies"; new files land; SAME checkpoint resumes
    _stage(paths["src"], b2, "b2", 2_000)
    _run(spark, paths["src"], b1.schema, paths)
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER in got[1]
    assert BOILER not in got[3] and BOILER not in got[4]
    # no double-processing of b1
    assert read_clean_output(spark, paths["out"]).count() == 4


def test_seed_index_strips_from_epoch_zero(spark, paths):
    seen = _docs(spark, [(100, f"frozen corpus already has {BOILER} here")])
    seed = span_index(seen, k=K)
    b1 = _batch1(spark)
    _stage(paths["src"], b1, "b1", 1_000)
    _run(spark, paths["src"], b1.schema, paths, seed_index=seed)
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[1]  # stripped against the frozen seed
    assert "unique opening" in got[1]


def test_foreign_run_dirs_refused(spark, paths):
    b1 = _batch1(spark)
    os.makedirs(os.path.join(paths["idx"], "delta=5"))
    with open(
        os.path.join(paths["idx"], "delta=5", "_STATE_COMMITTED"), "w"
    ):
        pass
    with pytest.raises(ValueError, match="different stream run"):
        fold_span_batch(b1, 0, paths["idx"], paths["out"], k=K)


def test_compaction_preserves_index_and_blocks_fresh_overwrite(
    spark, paths, tmp_path
):
    b1, b2 = _batch1(spark), _batch2(spark)
    _stage(paths["src"], b1, "b1", 1_000)
    _stage(paths["src"], b2, "b2", 2_000)
    _run(spark, paths["src"], b1.schema, paths)
    before = {
        r["h"] for r in read_span_index(spark, paths["idx"]).collect()
    }
    compacted = str(tmp_path / "compacted")
    compact_span_index(spark, paths["idx"], compacted)
    replace_index_with_compacted(paths["idx"], compacted)
    after_rows = read_span_index(spark, paths["idx"]).collect()
    assert {r["h"] for r in after_rows} == before
    assert len(after_rows) == len(before)  # duplicates reclaimed
    # the compacted delta keeps the max id: a FRESH-checkpoint run
    # (epoch 0) is refused instead of overwriting the corpus
    assert _committed(paths["idx"], _DELTA_RE) == [1]
    with pytest.raises(ValueError, match="different stream run"):
        fold_span_batch(b1, 0, paths["idx"], paths["out"], k=K)


def test_interrupted_compaction_recovers(spark, paths, tmp_path):
    # crash window: old tree moved aside, new tree not yet in place —
    # readers and folds must restore the set-aside tree instead of
    # proceeding against an empty index
    b1, b2 = _batch1(spark), _batch2(spark)
    _stage(paths["src"], b1, "b1", 1_000)
    _run(spark, paths["src"], b1.schema, paths)
    before = {
        r["h"] for r in read_span_index(spark, paths["idx"]).collect()
    }
    # simulate the mid-swap crash
    shutil.move(paths["idx"], paths["idx"] + ".precompact")
    assert not os.path.isdir(paths["idx"])
    after = {
        r["h"] for r in read_span_index(spark, paths["idx"]).collect()
    }
    assert after == before  # auto-restored
    # and a fold resuming right after the crash sees the restored
    # index: doc 3's boilerplate (admitted in epoch 0) is stripped
    shutil.move(paths["idx"], paths["idx"] + ".precompact")
    fold_span_batch(b2, 1, paths["idx"], paths["out"], k=K)
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[3]
