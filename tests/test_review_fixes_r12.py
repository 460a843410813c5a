"""Round-12 hardening pins (VERDICT r11 asks 1–3 + ADVICE r11).

1. The span-index ``n_buckets`` layout invariant is CHECKED, not
   prayed: every bucketed delta records the N it was written mod; a
   probe at a different N full-scans that delta (lossless) instead of
   silently reading the wrong sliver and re-admitting duplicates.
2. The compacted-while-crashed guard no longer false-positives on a
   reused checkpoint against a fresh index dir (the ``_COMPACTED``
   provenance marker distinguishes the two states).
3. The streaming state layer declares its filesystem scope loudly:
   object-store paths (``s3://``, ``abfss://``, ...) are refused at
   every entry point (the swap protocol needs atomic rename);
   ``file:`` URIs are served through the Hadoop FileSystem port and
   work end-to-end (r13: ``hdfs://`` is supported, no longer
   refused — see test_statefs_hadoop.py).
"""

from __future__ import annotations

import os
import shutil

import pytest

from semantic_olap_spark.streaming.spans import (
    _COMPACTED_MARKER,
    _N_MARKER,
    _probe_paths,
    compact_span_index,
    fold_span_batch,
    read_clean_output,
    read_span_index,
    replace_index_with_compacted,
)

BOILER = "alpha beta gamma delta epsilon zeta"  # 6 tokens, k=4 spans
K = 4
N_SMALL = 16
N_BIG = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(df) -> dict:
    return {r["doc_id"]: r["text"] for r in df.collect()}


@pytest.fixture()
def paths(tmp_path):
    return {
        "idx": str(tmp_path / "idx"),
        "out": str(tmp_path / "out"),
    }


def _seed_boiler(spark, paths, n_buckets):
    fold_span_batch(
        _docs(spark, [(1, f"seed admits {BOILER} exactly once here")]),
        0, paths["idx"], paths["out"], k=K, n_buckets=n_buckets,
    )


# ---- 1. n_buckets layout invariant ---------------------------------------


def test_delta_records_n_buckets_marker(spark, paths):
    _seed_boiler(spark, paths, N_SMALL)
    marker = os.path.join(paths["idx"], "delta=0", _N_MARKER)
    assert os.path.exists(marker)
    with open(marker) as f:
        assert int(f.read()) == N_SMALL
    # matched-N probe still PRUNES (no mismatch fallback)
    s: dict = {}
    fold_span_batch(
        _docs(spark, [(2, f"two repeats {BOILER} and must be cut")]),
        1, paths["idx"], paths["out"], k=K, n_buckets=N_SMALL, stats=s,
    )
    assert s["mismatched_n_deltas"] == 0
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER in got[1] and BOILER not in got[2]


def test_mismatched_n_falls_back_to_lossless_full_scan(spark, paths):
    """The exact silent-footgun migration path VERDICT r11 named:
    fold at N=16, compact at N=64 (the recommended raise-N move),
    resume folding at the default-ish N=16 — pre-fix the probe reads
    wanted dirs mod 16 of a mod-64 tree (those names EXIST, nothing
    errors) and re-admits the planted duplicate; post-fix the
    recorded-N mismatch forces a full scan and the duplicate dies."""
    _seed_boiler(spark, paths, N_SMALL)
    compacted = paths["idx"] + "_c"
    compact_span_index(spark, paths["idx"], compacted, n_buckets=N_BIG)
    replace_index_with_compacted(paths["idx"], compacted)
    kept = os.path.join(paths["idx"], "delta=0")
    with open(os.path.join(kept, _N_MARKER)) as f:
        assert int(f.read()) == N_BIG

    # (a) the pre-fix behavior WOULD have lost rows: naive wanted-name
    # pruning (mod-16 bucket set against the mod-64 tree) selects a
    # strict subset of the delta's bucket dirs for this probe
    all_bucket_dirs = sorted(
        d for d in os.listdir(kept) if d.startswith("h_bucket=")
    )
    s: dict = {}
    fold_span_batch(
        _docs(spark, [(9, f"nine replays {BOILER} after the resize")]),
        1, paths["idx"], paths["out"], k=K, n_buckets=N_SMALL, stats=s,
    )
    # (b) the guard fired: full scan of the mismatched delta, loudly
    assert s["mismatched_n_deltas"] == 1
    assert sorted(os.path.basename(p) for p in s["probe_paths"]) == (
        all_bucket_dirs
    )
    # (a) quantified: the pre-fix wanted-name pruning (this probe's
    # mod-16 bucket census against the mod-64 tree) keeps only a
    # STRICT subset of the dirs the lossless scan needed
    naive = {f"h_bucket={b}" for b in s["buckets_probed"]}
    assert len([d for d in all_bucket_dirs if d in naive]) < len(
        all_bucket_dirs
    )
    # ...and the planted duplicate is STRIPPED, not re-admitted
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[9]
    assert "nine replays" in got[9]


def test_mismatch_probe_warns(spark, paths):
    _seed_boiler(spark, paths, N_SMALL)
    os.remove(os.path.join(paths["idx"], "delta=0", _N_MARKER))
    with pytest.warns(UserWarning, match="different n_buckets"):
        fold_span_batch(
            _docs(spark, [(3, f"three has {BOILER} to strip")]),
            1, paths["idx"], paths["out"], k=K, n_buckets=N_SMALL,
        )


def test_unrecorded_bucketed_delta_treated_as_mismatch(spark, paths):
    """Deltas written by the pre-marker layout (r11) carry no
    ``_N_BUCKETS`` file: their true N is unknown, so pruning against
    them is unsafe — full scan, duplicate still stripped."""
    _seed_boiler(spark, paths, N_SMALL)
    os.remove(os.path.join(paths["idx"], "delta=0", _N_MARKER))
    s: dict = {}
    fold_span_batch(
        _docs(spark, [(4, f"four carries {BOILER} in the middle")]),
        1, paths["idx"], paths["out"], k=K, n_buckets=N_SMALL, stats=s,
    )
    assert s["mismatched_n_deltas"] == 1
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[4]


def test_compaction_restores_pruning_after_resize(spark, paths):
    """compact_span_index at one N is the documented remedy: after
    re-compacting the mixed tree at the probe's N, pruning is back."""
    _seed_boiler(spark, paths, N_SMALL)
    c1 = paths["idx"] + "_c1"
    compact_span_index(spark, paths["idx"], c1, n_buckets=N_BIG)
    replace_index_with_compacted(paths["idx"], c1)
    # re-size back down to the probe's N
    c2 = paths["idx"] + "_c2"
    compact_span_index(spark, paths["idx"], c2, n_buckets=N_SMALL)
    replace_index_with_compacted(paths["idx"], c2)
    s: dict = {}
    fold_span_batch(
        _docs(spark, [(5, f"five re-sends {BOILER} post resize")]),
        1, paths["idx"], paths["out"], k=K, n_buckets=N_SMALL, stats=s,
    )
    assert s["mismatched_n_deltas"] == 0
    assert s["pruned_dirs"] > 0
    got = _texts(read_clean_output(spark, paths["out"]))
    assert BOILER not in got[5]


def test_probe_paths_unit_matrix(tmp_path):
    """_probe_paths: matched-N prunes, mismatched/unrecorded
    full-scans, legacy flat scans whole, empty skips."""
    idx = str(tmp_path / "idx")
    # delta=0: bucketed at N=16, recorded
    for b in (0, 5):
        os.makedirs(os.path.join(idx, "delta=0", f"h_bucket={b}"))
        open(
            os.path.join(idx, "delta=0", f"h_bucket={b}", "x.parquet"),
            "w",
        ).close()
    with open(os.path.join(idx, "delta=0", _N_MARKER), "w") as f:
        f.write("16")
    # delta=1: bucketed, recorded at a DIFFERENT N
    os.makedirs(os.path.join(idx, "delta=1", "h_bucket=3"))
    open(
        os.path.join(idx, "delta=1", "h_bucket=3", "x.parquet"), "w"
    ).close()
    with open(os.path.join(idx, "delta=1", _N_MARKER), "w") as f:
        f.write("64")
    # delta=2: legacy flat
    os.makedirs(os.path.join(idx, "delta=2"))
    open(os.path.join(idx, "delta=2", "y.parquet"), "w").close()
    # delta=3: committed-but-empty
    os.makedirs(os.path.join(idx, "delta=3"))

    from semantic_olap_spark.streaming.statefs import LocalStateFS

    with pytest.warns(UserWarning, match="different n_buckets"):
        paths, pruned, mismatched = _probe_paths(
            LocalStateFS(), idx, [0, 1, 2, 3], buckets=[5], n_buckets=16
        )
    assert mismatched == 1
    assert pruned == 1  # delta=0's h_bucket=0 skipped
    tails = sorted(os.path.relpath(p, idx) for p in paths)
    assert tails == [
        "delta=0/h_bucket=5",  # pruned to the wanted bucket
        "delta=1/h_bucket=3",  # mismatched N: every bucket dir
        "delta=2",  # legacy flat: whole delta
    ]


# ---- 2. compacted-marker provenance (ADVICE r11 low #1) ------------------


def test_fresh_index_reused_checkpoint_replay_proceeds(spark, paths):
    """The supported look-alike state: a stream reuses its checkpoint
    against a FRESH index dir (the module's own error messages
    suggest exactly this), its first fold is epoch 5, it crashes
    after committing delta=5, and the replay of epoch 5 sees
    prior=[] with delta=5 present.  No compaction ever happened —
    the idempotent replay must proceed, not be refused."""
    b = _docs(spark, [(7, f"seven brings {BOILER} for the first time")])
    fold_span_batch(b, 5, paths["idx"], paths["out"], k=K)
    before = _texts(read_clean_output(spark, paths["out"]))
    # the crash-replay: same epoch id, same batch — pre-fix this
    # raised "compacted while the stream was crashed mid-epoch"
    fold_span_batch(b, 5, paths["idx"], paths["out"], k=K)
    assert _texts(read_clean_output(spark, paths["out"])) == before
    assert read_clean_output(spark, paths["out"]).count() == 1


def test_genuinely_compacted_tree_still_refused(spark, paths):
    b0 = _docs(spark, [(1, f"one admits {BOILER} here first")])
    b1 = _docs(spark, [(2, f"two repeats {BOILER} later on")])
    fold_span_batch(b0, 0, paths["idx"], paths["out"], k=K)
    fold_span_batch(b1, 1, paths["idx"], paths["out"], k=K)
    compacted = paths["idx"] + "_c"
    compact_span_index(spark, paths["idx"], compacted)
    replace_index_with_compacted(paths["idx"], compacted)
    kept = os.path.join(paths["idx"], "delta=1")
    assert os.path.exists(os.path.join(kept, _COMPACTED_MARKER))
    # epoch 1 replays against a tree compacted into ONLY delta=1:
    # proceeding would erase the dedup history — still refused
    with pytest.raises(ValueError, match="compacted"):
        fold_span_batch(b1, 1, paths["idx"], paths["out"], k=K)


# ---- 3. local-FS scope (VERDICT r11 ask #2) ------------------------------


def test_object_store_paths_refused_loudly(spark, paths, tmp_path):
    b = _docs(spark, [(1, "any text at all")])
    with pytest.raises(ValueError, match="object-store"):
        fold_span_batch(b, 0, "s3://bkt/idx", paths["out"], k=K)
    with pytest.raises(ValueError, match="atomic directory rename"):
        fold_span_batch(b, 0, paths["idx"], "gs://bkt/out", k=K)
    with pytest.raises(ValueError, match="object-store"):
        read_span_index(spark, "s3a://bkt/idx")
    with pytest.raises(ValueError, match="object-store"):
        read_clean_output(spark, "abfss://c@a.dfs.core.windows.net/o")
    with pytest.raises(ValueError, match="object-store"):
        compact_span_index(spark, paths["idx"], "s3://bkt/c")
    with pytest.raises(ValueError, match="object-store"):
        replace_index_with_compacted("s3://bkt/idx", str(tmp_path / "c"))

    from semantic_olap_spark.streaming.materialized import (
        fold_batch,
        read_agg_state,
    )

    with pytest.raises(ValueError, match="object-store"):
        fold_batch(
            spark.range(3).withColumnRenamed("id", "value"),
            0, "s3://bkt/state", ["value"],
        )
    # r13: hdfs:// is now SERVED (Hadoop FileSystem port), no longer
    # refused — but only with a live session to reach the JVM
    from semantic_olap_spark.streaming.statefs import resolve_state_fs

    with pytest.raises(ValueError, match="SparkSession"):
        resolve_state_fs("hdfs://nn/state")


def test_file_uri_paths_normalized_and_work(spark, paths):
    """``file:`` URIs (single-slash and triple-slash forms) are
    accepted and behave identically to plain paths — markers land
    where the Spark reads look."""
    fold_span_batch(
        _docs(spark, [(1, f"one admits {BOILER} via file uri")]),
        0, "file://" + paths["idx"], "file:" + paths["out"], k=K,
    )
    assert os.path.exists(
        os.path.join(paths["idx"], "delta=0", "_STATE_COMMITTED")
    )
    fold_span_batch(
        _docs(spark, [(2, f"two repeats {BOILER} via plain path")]),
        1, paths["idx"], paths["out"], k=K,
    )
    got = _texts(read_clean_output(spark, "file://" + paths["out"]))
    assert BOILER in got[1] and BOILER not in got[2]
    assert read_span_index(spark, "file://" + paths["idx"]).count() > 0


def test_file_uri_nonlocal_authority_refused(spark, paths):
    with pytest.raises(ValueError, match="non-empty"):
        fold_span_batch(
            _docs(spark, [(1, "x")]),
            0, "file://otherhost/idx", paths["out"], k=K,
        )


# ---- 4. the two remaining /tmp-leaking registry rows (VERDICT #3) --------


def _assert_row_leaves_no_tmp(spark, row, prefix):
    import glob
    import tempfile

    import __spark_entry__ as entry

    pat = os.path.join(tempfile.gettempdir(), prefix + "*")
    before = set(glob.glob(pat))
    df = entry.queries()[row](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0  # result survives the cleanup (materialized)
    after = set(glob.glob(pat))
    assert after == before, after - before


def test_stream_materialized_agg_row_leaves_no_tmp(spark):
    _assert_row_leaves_no_tmp(spark, "stream_materialized_agg", "mvq_")


def test_stream_anomalies_row_leaves_no_tmp(spark):
    _assert_row_leaves_no_tmp(spark, "stream_anomalies", "stream_anom_")


# ---- 5. review-pass fixes on the r12 diff itself --------------------------


def test_premarker_sole_delta_refused_ambiguous(spark, paths):
    """A pre-marker (r11-era) delta=N with no prior deltas could be
    an old compaction (folding erases history) OR the stream's own
    old crashed write — indistinguishable without provenance, so the
    fold refuses (exactly what the pre-marker guard did), naming both
    resolutions.  This closes the migration hole where gating only on
    _COMPACTED silently dropped the r11 data-loss guard for trees
    compacted before the marker existed."""
    from semantic_olap_spark.functions.dedup import _gram_stream

    b = _docs(spark, [(1, f"one wrote {BOILER} before the upgrade")])
    flat = os.path.join(paths["idx"], "delta=5")
    _gram_stream(b, "text", "doc_id", K, "xxhash64", None).select(
        "h"
    ).distinct().write.mode("overwrite").parquet(flat)
    open(os.path.join(flat, "_STATE_COMMITTED"), "w").close()
    with pytest.raises(ValueError, match="pre-marker"):
        fold_span_batch(b, 5, paths["idx"], paths["out"], k=K)


def test_gramless_batch_probes_nothing_and_stays_quiet(spark, paths):
    """A batch whose docs are all shorter than k tokens has an empty
    gram census: the probe must open NO index paths (matched,
    mismatched and legacy deltas alike — nothing could join) and must
    not warn about pruning an index it never needed."""
    import warnings as _w

    _seed_boiler(spark, paths, N_SMALL)
    os.remove(os.path.join(paths["idx"], "delta=0", _N_MARKER))
    s: dict = {}
    with _w.catch_warnings():
        _w.simplefilter("error")  # any UserWarning fails the test
        fold_span_batch(
            _docs(spark, [(8, "too short")]),
            1, paths["idx"], paths["out"], k=K,
            n_buckets=N_SMALL, stats=s,
        )
    assert s["probe_paths"] == []
    assert s["mismatched_n_deltas"] == 0
    got = _texts(read_clean_output(spark, paths["out"]))
    assert got[8] == "too short"


def test_swap_refuses_markerless_compacted_tree(spark, paths, tmp_path):
    """A compacted tree without its _N_BUCKETS marker (crash-
    truncated compact_span_index, or a pre-marker artifact) is
    refused at swap time — swapping it in would make every future
    fold full-scan the whole index per micro-batch."""
    _seed_boiler(spark, paths, N_SMALL)
    compacted = str(tmp_path / "c")
    compact_span_index(spark, paths["idx"], compacted, n_buckets=N_SMALL)
    os.remove(os.path.join(compacted, _N_MARKER))  # simulate the crash
    with pytest.raises(ValueError, match="_N_BUCKETS"):
        replace_index_with_compacted(paths["idx"], compacted)
    # remedy works: re-produce the marker (re-run semantics) and swap
    compacted2 = str(tmp_path / "c2")
    compact_span_index(spark, paths["idx"], compacted2, n_buckets=N_SMALL)
    replace_index_with_compacted(paths["idx"], compacted2)
    assert read_span_index(spark, paths["idx"]).count() > 0


def test_state_layer_errors_name_their_own_subsystem(spark):
    """materialized.py shares the local-FS contract via statefs but
    its refusals must blame the aggregate-state layer, not the span
    index (and never suggest a span-dedup operator as the remedy)."""
    from semantic_olap_spark.streaming.materialized import read_agg_state

    with pytest.raises(ValueError) as exc:
        read_agg_state(spark, "s3://bucket/state")
    msg = str(exc.value)
    assert "aggregate-state layer" in msg
    assert "span" not in msg
    assert "remove_spans_against" not in msg
    with pytest.raises(ValueError, match="span-index"):
        read_span_index(spark, "s3://bucket/idx")
