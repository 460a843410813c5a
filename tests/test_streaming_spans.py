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


from semantic_olap_spark.streaming.statefs import LocalStateFS

_LFS = LocalStateFS()

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
    assert _committed(_LFS, paths["idx"], _DELTA_RE) == [0, 1]
    assert _committed(_LFS, paths["out"], _EPOCH_RE) == [0, 1]


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
    assert _committed(_LFS, paths["out"], _EPOCH_RE) == [0]

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
    assert _committed(_LFS, paths["idx"], _DELTA_RE) == [1]
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


# ---- bucketed index layout: probe I/O pruning (r11) --------------------

N_BUCKETS = 16


def _gen_docs(spark, epoch, n=12, n_tokens=150):
    """Deterministic per-epoch corpus of unique-ish random words —
    grows the index across epochs without cross-epoch duplication."""
    import random

    rng = random.Random(7_000 + epoch)
    rows = [
        (
            epoch * 1_000 + i,
            " ".join(
                f"e{epoch}w{rng.randrange(10_000_000)}"
                for _ in range(n_tokens)
            ),
        )
        for i in range(n)
    ]
    return _docs(spark, rows)


def _tiny_probe(spark, doc_id):
    # k+1 = 5 tokens → 2 grams → at most 2 of N_BUCKETS buckets;
    # all tokens sit inside BOILER, so a working probe strips the
    # whole doc down to nothing
    return _docs(spark, [(doc_id, "alpha beta gamma delta epsilon")])


def _bucket_dirs_on_disk(idx: str) -> int:
    n = 0
    for d in os.listdir(idx):
        full = os.path.join(idx, d)
        if os.path.isdir(full):
            n += sum(1 for s in os.listdir(full) if s.startswith("h_bucket="))
    return n


def test_probe_scan_fraction_stays_flat_as_index_grows(spark, paths):
    """The structural 100 TB contract: per-batch index READ I/O is
    proportional to the batch's bucket footprint (|B|/N of the
    index), NOT to the stream's lifetime — the scanned FRACTION stays
    flat while the index doubles, and compaction collapses the probe
    to exactly |B| bucket directories."""
    kw = dict(k=K, n_buckets=N_BUCKETS)
    fold_span_batch(
        _docs(spark, [(1, f"seed doc carries {BOILER} exactly once")]),
        0, paths["idx"], paths["out"], **kw,
    )
    for e in range(1, 6):
        fold_span_batch(
            _gen_docs(spark, e), e, paths["idx"], paths["out"], **kw
        )

    s1: dict = {}
    fold_span_batch(
        _tiny_probe(spark, 60_001), 6, paths["idx"], paths["out"],
        stats=s1, **kw,
    )
    assert 1 <= len(s1["buckets_probed"]) <= 2
    # pruning is real: most bucketed dirs were skipped, and the path
    # list is exactly |B ∩ present| per prior delta
    assert s1["pruned_dirs"] > 0
    assert len(s1["probe_paths"]) <= 6 * len(s1["buckets_probed"])
    # ...and the pruned probe still FINDS the epoch-0 span
    got = _texts(read_clean_output(spark, paths["out"]))
    assert "alpha" not in got[60_001]

    # double the index lifetime, probe the same tiny content again
    for e in range(7, 12):
        fold_span_batch(
            _gen_docs(spark, e), e, paths["idx"], paths["out"], **kw
        )
    s2: dict = {}
    fold_span_batch(
        _tiny_probe(spark, 60_002), 12, paths["idx"], paths["out"],
        stats=s2, **kw,
    )
    assert s2["buckets_probed"] == s1["buckets_probed"]
    assert s2["index_bytes"] > s1["index_bytes"] * 1.6  # it DID grow
    frac1 = s1["probe_bytes"] / s1["index_bytes"]
    frac2 = s2["probe_bytes"] / s2["index_bytes"]
    # scanned fraction ≈ |B|/N both times (slack for parquet footer
    # overhead on toy files) — the O(lifetime) failure mode would
    # push frac toward 1.0
    bound = len(s1["buckets_probed"]) / N_BUCKETS * 3.0
    assert frac1 <= bound, (frac1, bound)
    assert frac2 <= bound, (frac2, bound)

    # compaction collapses the per-delta file term: the same probe
    # now opens AT MOST |B| directories, one per bucket
    compacted = paths["idx"] + "_compacted"
    compact_span_index(spark, paths["idx"], compacted, n_buckets=N_BUCKETS)
    replace_index_with_compacted(paths["idx"], compacted)
    s3: dict = {}
    fold_span_batch(
        _tiny_probe(spark, 60_003), 13, paths["idx"], paths["out"],
        stats=s3, **kw,
    )
    assert len(s3["probe_paths"]) <= len(s1["buckets_probed"])
    got = _texts(read_clean_output(spark, paths["out"]))
    assert "alpha" not in got[60_003]  # still correct post-compaction


def test_pruned_fold_matches_full_index_batch_mode(spark, paths):
    """Bucket pruning is lossless: the fold's cleaned output equals
    remove_spans_against over the FULL (unpruned) index."""
    for e in range(3):
        fold_span_batch(
            _gen_docs(spark, e, n=6), e, paths["idx"], paths["out"],
            k=K, n_buckets=N_BUCKETS,
        )
    batch = _gen_docs(spark, 1, n=6)  # epoch 1's docs again → dups
    fold_span_batch(
        batch, 3, paths["idx"], paths["out"], k=K, n_buckets=N_BUCKETS
    )
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            os.path.join(paths["out"], "epoch=3")
        ).collect()
    }
    # batch-mode referent: the FULL unpruned index of deltas 0..2
    idx012 = (
        spark.read.option("basePath", paths["idx"])
        .parquet(
            *[os.path.join(paths["idx"], f"delta={d}") for d in range(3)]
        )
        .select("h")
    )
    want = _texts(remove_spans_against(batch, idx012, k=K))
    assert got == want
    # and stripping actually happened (epoch 1 re-sent → all dup)
    orig = _texts(batch)
    assert all(got[i] != orig[i] for i in orig)


def test_legacy_flat_delta_still_probed(spark, paths):
    """Deltas written by the pre-bucketing layout (flat parquet, no
    h_bucket= dirs) are still read — fully scanned — and the next
    compaction migrates them to the bucketed layout."""
    b1 = _batch1(spark)
    from semantic_olap_spark.functions.dedup import _gram_stream

    flat = os.path.join(paths["idx"], "delta=0")
    _gram_stream(b1, "text", "doc_id", K, "xxhash64", None).select(
        "h"
    ).distinct().write.mode("overwrite").parquet(flat)
    with open(os.path.join(flat, "_STATE_COMMITTED"), "w"):
        pass

    s: dict = {}
    fold_span_batch(
        _batch2(spark), 1, paths["idx"], paths["out"],
        k=K, n_buckets=N_BUCKETS, stats=s,
    )
    assert flat in s["probe_paths"]  # legacy dir scanned whole
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[3] and BOILER not in got[4]

    # MIXED probe: one read spanning the flat delta=0 AND bucketed
    # delta=1 leaf dirs (file-containing roots both — no partition
    # discovery conflict)
    s2: dict = {}
    fold_span_batch(
        _docs(spark, [(9, f"nine has {BOILER} and that is all")]),
        2, paths["idx"], paths["out"],
        k=K, n_buckets=N_BUCKETS, stats=s2,
    )
    assert flat in s2["probe_paths"]
    assert any("h_bucket=" in p for p in s2["probe_paths"])
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[9]

    # compaction rewrites the mixed tree bucketed
    compacted = paths["idx"] + "_c"
    compact_span_index(spark, paths["idx"], compacted, n_buckets=N_BUCKETS)
    replace_index_with_compacted(paths["idx"], compacted)
    assert _bucket_dirs_on_disk(paths["idx"]) > 0
    rows = read_span_index(spark, paths["idx"]).collect()
    assert len(rows) == len({r["h"] for r in rows})  # distinct
