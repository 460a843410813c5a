"""Round-11 review fixes (ADVICE r10), each pinned by a regression test.

1. (medium) Compacting the span index while the stream is crashed
   MID-EPOCH can no longer silently erase the dedup history:
   - `replace_index_with_compacted(checkpoint=...)` refuses the swap
     unless the checkpoint's commits log shows the highest committed
     delta's batch as done;
   - even without the checkpoint arg, a resume that replays epoch N
     against an index holding ONLY delta=N is refused by
     `fold_span_batch` instead of cleaning against an empty index and
     overwriting the compacted corpus.
2. (low) A reused `out_path` holding committed epochs NEWER than the
   folding epoch is refused, mirroring the index-side contract —
   `read_clean_output` must never silently union a dead run's
   generations.
3. (low) `lineage_cut`'s checkpoint-dir memo now records
   `getCheckpointDir()`'s own qualified return and re-verifies
   against THAT — a relative or `file://`-qualified caller path no
   longer defeats the memo (which used to re-mkdir a fresh UUID dir
   on every call).
4. (low) `_q_span_stream_ingest` cleans up its tempdir staging tree
   (a full copy of the documents table) instead of leaking it into
   /tmp on every replay/bench invocation.
"""

from __future__ import annotations

import glob
import os

import pytest

from semantic_olap_spark.streaming.spans import (
    _committed,
    _DELTA_RE,
    compact_span_index,
    fold_span_batch,
    replace_index_with_compacted,
)

K = 4
BOILER = "alpha beta gamma delta epsilon zeta"


from semantic_olap_spark.streaming.statefs import LocalStateFS

_LFS = LocalStateFS()

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _b1(spark):
    return _docs(spark, [(1, f"one unique opening {BOILER} and a tail")])


def _b2(spark):
    return _docs(spark, [(3, f"three starts here {BOILER} then differs")])


# ---- 1. compaction vs crashed-mid-epoch stream --------------------------


def _fake_checkpoint(tmp_path, committed_through: int | None):
    ck = tmp_path / "ckpt"
    commits = ck / "commits"
    commits.mkdir(parents=True)
    (ck / "offsets").mkdir()
    if committed_through is not None:
        for i in range(committed_through + 1):
            (commits / str(i)).write_text("v1\n{}")
    return str(ck)


def test_swap_refused_when_checkpoint_behind_index(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold_span_batch(_b1(spark), 0, idx, out, k=K)
    fold_span_batch(_b2(spark), 1, idx, out, k=K)
    compacted = str(tmp_path / "compacted")
    compact_span_index(spark, idx, compacted)
    # the stream crashed after writing delta=1 but before the
    # checkpoint committed batch 1 → swap must refuse
    ck = _fake_checkpoint(tmp_path, committed_through=0)
    with pytest.raises(ValueError, match="crashed mid-epoch"):
        replace_index_with_compacted(idx, compacted, checkpoint=ck)
    # both trees intact after the refusal
    assert _committed(_LFS, idx, _DELTA_RE) == [0, 1]
    assert os.path.isdir(compacted)


def test_swap_allowed_after_clean_drain(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold_span_batch(_b1(spark), 0, idx, out, k=K)
    fold_span_batch(_b2(spark), 1, idx, out, k=K)
    compacted = str(tmp_path / "compacted")
    compact_span_index(spark, idx, compacted)
    ck = _fake_checkpoint(tmp_path, committed_through=1)
    replace_index_with_compacted(idx, compacted, checkpoint=ck)
    assert _committed(_LFS, idx, _DELTA_RE) == [1]


def test_swap_refused_on_empty_commits_log(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold_span_batch(_b1(spark), 0, idx, out, k=K)
    compacted = str(tmp_path / "compacted")
    compact_span_index(spark, idx, compacted)
    ck = _fake_checkpoint(tmp_path, committed_through=None)
    with pytest.raises(ValueError, match="crashed mid-epoch"):
        replace_index_with_compacted(idx, compacted, checkpoint=ck)


def test_fold_refuses_replay_onto_compacted_only_own_delta(spark, tmp_path):
    """The belt-and-braces guard: even if compaction happened without
    the checkpoint check, the replaying fold detects the poisoned
    state (index == ONLY its own delta, no prior) and refuses instead
    of erasing history."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold_span_batch(_b1(spark), 0, idx, out, k=K)
    fold_span_batch(_b2(spark), 1, idx, out, k=K)
    compacted = str(tmp_path / "compacted")
    compact_span_index(spark, idx, compacted)
    replace_index_with_compacted(idx, compacted)  # no checkpoint arg
    assert _committed(_LFS, idx, _DELTA_RE) == [1]
    # checkpoint replays epoch 1 (it never committed batch 1)
    with pytest.raises(ValueError, match="compacted while the stream"):
        fold_span_batch(_b2(spark), 1, idx, out, k=K)
    # the compacted history is still there
    assert _committed(_LFS, idx, _DELTA_RE) == [1]


def test_fold_epoch_zero_with_empty_index_still_fine(spark, tmp_path):
    # the guard must not fire on the normal first-ever epoch
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold_span_batch(_b1(spark), 0, idx, out, k=K)
    # ...nor on a replay of epoch 0
    fold_span_batch(_b1(spark), 0, idx, out, k=K)
    assert _committed(_LFS, idx, _DELTA_RE) == [0]


# ---- 2. reused out_path with newer epochs is refused --------------------


def test_foreign_out_dir_refused(spark, tmp_path):
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    stale = os.path.join(out, "epoch=7")
    os.makedirs(stale)
    with open(os.path.join(stale, "_STATE_COMMITTED"), "w"):
        pass
    with pytest.raises(ValueError, match="different stream run"):
        fold_span_batch(_b1(spark), 0, idx, out, k=K)
    # index side untouched by the refusal
    assert _committed(_LFS, idx, _DELTA_RE) == []


# ---- 3. lineage_cut memo survives non-canonical path forms --------------


def test_lineage_cut_relative_path_sets_dir_once(spark, tmp_path):
    """A relative checkpoint_dir never string-matches the qualified
    live value — the old prefix check re-invoked setCheckpointDir on
    every call, recreating the UUID-dir-per-call proliferation."""
    from semantic_olap_spark.caching import lineage_cut

    ckdir = tmp_path / "ck_rel"
    rel = os.path.relpath(str(ckdir), os.getcwd())
    lineage_cut(spark.range(5), rel).count()
    lineage_cut(spark.range(5), rel).count()
    lineage_cut(spark.range(5), rel).count()
    subdirs = os.listdir(str(ckdir))
    assert len(subdirs) == 1, subdirs


def test_lineage_cut_file_qualified_path_sets_dir_once(spark, tmp_path):
    from semantic_olap_spark.caching import lineage_cut

    ckdir = tmp_path / "ck_file"
    qualified = "file://" + str(ckdir)
    lineage_cut(spark.range(5), qualified).count()
    lineage_cut(spark.range(5), qualified).count()
    subdirs = os.listdir(str(ckdir))
    assert len(subdirs) == 1, subdirs


# ---- 4. span_stream_ingest row cleans its tempdir -----------------------


def test_span_stream_ingest_row_leaves_no_tmp(spark):
    import tempfile

    import __spark_entry__ as entry

    pat = os.path.join(tempfile.gettempdir(), "solap_span_stream_*")
    before = set(glob.glob(pat))
    df = entry.queries()["span_stream_ingest"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() > 0  # result survives the cleanup (materialized)
    after = set(glob.glob(pat))
    assert after == before, after - before
