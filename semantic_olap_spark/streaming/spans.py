"""Continuous ExactSubstr ingest: stream-maintained span dedup.

The batch half of the family (``functions/dedup.py``:
``span_index`` / ``remove_spans_against``) covers the frozen-corpus
+ daily-batch shape.  This module closes the loop for CONTINUOUS
ingest: each micro-batch is cleaned against every span seen in all
EARLIER batches (plus an optional frozen seed index), then its own
k-gram fingerprints join the index — so duplicated boilerplate is
admitted at most once across the whole stream's lifetime.

Layout (same commit-marker discipline as ``materialized.py``):

- ``out_path/epoch=<id>/``   cleaned batch output, one generation
  per foreachBatch epoch, ``mode("overwrite")`` + commit marker —
  a replayed epoch reproduces, never duplicates;
- ``index_path/delta=<id>/h_bucket=<b>/`` the batch's own
  ``span_index``, hash-partitioned into ``n_buckets`` directories by
  ``pmod(xxhash64(h), n_buckets)`` — APPEND-ONLY deltas, never a
  rewrite.  The probe tolerates duplicate fingerprints across deltas
  by construction (duplicate index rows duplicate hit intervals,
  which the island merge's min/max collapses —
  ``functions/dedup.py`` ``duplicate_spans_against``), so the
  per-batch cost is fingerprinting the BATCH only: no corpus-sized
  shuffle, no index rewrite, the shape a 100 TB stream needs.

  The bucket layout is what bounds per-batch index READ I/O: the
  fold derives the batch's own bucket set from its gram stream
  (bounded — at most ``n_buckets`` values) and opens ONLY those
  ``h_bucket=<b>`` directories of each prior delta.  A micro-batch
  touching B of N buckets scans B/N of the index instead of all of
  it; after compaction (one bucketed delta) that is exactly B
  files.  Without pruning the probe's I/O grows with the stream's
  LIFETIME; with it, the scan is proportional to the batch's bucket
  footprint times the compacted index's per-bucket size.  Deltas
  written by older versions (flat, no ``h_bucket=``) are still read
  — fully scanned, legacy — and the next compaction rewrites them
  bucketed.  Cross-delta duplicate hashes cost only index bytes;
  reclaim them (and the per-delta file-count term) with the offline
  compaction on whatever cadence storage demands.

Semantics note: within-batch repetition is deliberately NOT removed
(a span occurring twice inside epoch N survives epoch N) — that is
``remove_duplicate_spans``' job and the two compose; the FIRST
occurrence epoch of any span is the one the stream admits, every
later epoch's occurrence is stripped.  Exactly the Lee et al. 2022
"seen before" policy applied at ingest time.

Single-writer contract (deliberate scope cut, same posture as
``plans/memory.py`` cube persistence): one index tree has ONE
writing stream at a time — that is what Structured Streaming's
checkpoint already serializes (epochs commit in order through one
query).  The detectable violations are refused loudly rather than
silently merged: a second stream with a FRESH checkpoint trips the
newer-delta/newer-epoch refusal in ``fold_span_batch``, and
compaction against a live (non-drained) stream trips
``replace_index_with_compacted``'s checkpoint precondition.  Two
writers racing the SAME epoch id (two streams sharing neither
checkpoint nor epoch history) are undefined — at cluster scale that
coordination wants a transactional table format (Delta/Iceberg-style
commits), which this module deliberately does not claim.

Reference scope note: the reference engine has neither streaming nor
span dedup; this is part of the beyond-reference training-pipeline
family (SURVEY.md §7.1 M7/M8).
"""

from __future__ import annotations

import os
import re
import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_olap_spark.functions.dedup import (
    _gram_stream,
    _merge_islands,
    _window_hits,
    remove_duplicate_spans,
)

_DELTA_RE = re.compile(r"^delta=(\d+)$")
_EPOCH_RE = re.compile(r"^epoch=(\d+)$")
_BUCKET_RE = re.compile(r"^h_bucket=(\d+)$")
_COMMIT_MARKER = "_STATE_COMMITTED"
#: Layout marker: the n_buckets a bucketed delta was written mod.
#: ``pmod(xxhash64(h), N)`` only names the same directory for the
#: same row when N agrees, so a probe pruning a delta written at a
#: DIFFERENT N would silently read the wrong sliver of the index and
#: re-admit duplicates — the marker makes N a checked layout
#: invariant instead of a docstring prayer.  Underscore prefix keeps
#: it invisible to Spark's file index, same as ``_STATE_COMMITTED``.
_N_MARKER = "_N_BUCKETS"
#: Written by ``replace_index_with_compacted`` into the kept delta:
#: distinguishes "this tree was compacted" from "this is the
#: stream's own crashed first write" in ``fold_span_batch``'s
#: history-erasure guard (a reused checkpoint against a fresh index
#: dir legitimately replays epoch N>0 with no prior deltas).
_COMPACTED_MARKER = "_COMPACTED"

#: Index partition fan-out.  Sizing rule (measured at sf0.1 and
#: sf1): a batch with g distinct grams hits ≈ N·(1−(1−1/N)^g) ≈
#: min(g, N) buckets, so the probe scans ≈ that fraction of the
#: index — 143 grams against N=1024 read 13.1% of the index, a
#: 10-doc (~350-gram) late batch against the compacted sf1 index
#: reads 30.6%, and g ≫ N degrades to the one full pass the flat
#: layout always paid.  Choose N ≳ (expected batch grams) ÷ (target
#: read amplification).  The write side is NOT free at small file
#: sizes (r13 measurement): corpus-sized waves materialize ~N files
#: per delta, and the per-FILE fixed cost (task scheduling, parquet
#: footers) added ~55s to a 4-epoch ingest at N=1024 vs N=64 —
#: roughly constant across a 10× corpus growth (sf0.1 81.5s→26.0s,
#: sf1 89.4s→33.7s), i.e. pure file-count overhead that amortizes
#: only once per-bucket delta files reach MBs.  Size N to the
#: TRICKLE batches you need to prune for, not higher: 64 suits the
#: toy-scale tests; a production deployment raises it (4k–64k,
#: where 100 TB-scale waves make per-bucket files large) with
#: compaction cadence.
DEFAULT_N_BUCKETS = 64


def _bucket_expr(h: Column, n_buckets: int) -> Column:
    """Index partition key: ``pmod(xxhash64(h), n_buckets)``.

    ``xxhash64`` (fixed seed 42) works on both fingerprint dtypes
    (long for xxhash64 mode, string for md5 mode) and is
    deterministic across JVMs/sessions — the write side and every
    future probe must agree bit-for-bit on a row's bucket."""
    return F.pmod(F.xxhash64(h), F.lit(int(n_buckets)))


def _state_fs(path: str, what: str = "path", spark=None):
    """Span-index instantiation of the shared state-filesystem seam
    (:mod:`semantic_olap_spark.streaming.statefs`): plain paths use
    os-level I/O, URI-form paths (``file://``, ``hdfs://``) the
    Hadoop FileSystem API.  The BATCH span family
    (``functions/dedup.py``) is pure Spark I/O and has no such
    restriction, so the object-store refusal names it as the
    alternative.  Returns ``(fs, normalized_path)``."""
    from semantic_olap_spark.streaming.statefs import resolve_state_fs

    return resolve_state_fs(
        path,
        what=what,
        layer="streaming span-index state layer",
        remedy=(
            "For object-store corpora run the batch span family "
            "(functions.dedup.remove_spans_against) instead."
        ),
        spark=spark,
    )


def _read_n_marker(fs, delta_dir: str) -> int | None:
    """The n_buckets a bucketed delta records, or None (legacy
    bucketed delta written before the marker existed — its true N is
    unknown, so pruning against it is unsafe)."""
    p = os.path.join(delta_dir, _N_MARKER)
    try:
        return int(fs.read_text(p).strip())
    except (OSError, ValueError):
        return None


def _write_n_marker(fs, delta_dir: str, n_buckets: int) -> None:
    fs.write_text(
        os.path.join(delta_dir, _N_MARKER), str(int(n_buckets))
    )


def _delta_bucket_dirs(fs, delta_dir: str) -> list[str] | None:
    """``h_bucket=<b>`` subdirectory names of a bucketed delta, or
    ``None`` for a legacy flat delta (top-level parquet files)."""
    names = fs.listdir(delta_dir)
    buckets = [n for n in names if _BUCKET_RE.match(n)]
    if buckets:
        return sorted(buckets, key=lambda n: int(n.split("=")[1]))
    if any(n.endswith(".parquet") for n in names):
        return None  # legacy flat layout: scan the whole delta
    return []  # committed-but-empty delta: nothing to read


def _probe_paths(
    fs, index_path: str, deltas: list[int], buckets: list[int],
    n_buckets: int,
) -> tuple[list[str], int, int]:
    """Concrete parquet directories a probe for ``buckets`` must
    open, plus how many bucketed index dirs pruning SKIPPED and how
    many deltas were FULL-SCANNED because their recorded n_buckets
    disagrees with the probe's (or is unrecorded).

    Explicit path selection (not a Catalyst partition filter) so the
    pruning is deterministic and directly testable: the scan is the
    returned list, nothing else.  Matches the module's existing
    local-FS commit-marker model (``_committed``).

    The N check is the layout invariant: ``buckets`` was computed
    mod the PROBE's n_buckets, so against a delta written mod a
    different N the wanted directory names simply don't correspond —
    pruning there would silently skip index rows and re-admit
    duplicates.  The fallback (read every bucket dir of that delta)
    is always lossless; the next compaction rewrites the tree at one
    N and restores pruning."""
    wanted = {f"h_bucket={b}" for b in buckets}
    paths: list[str] = []
    skipped = 0
    mismatched = 0
    if not wanted:
        # a gram-less batch (every doc shorter than k tokens) needs
        # NO index rows — nothing it could join on.  Skip every
        # delta (legacy flat and mismatched-N alike: full-scanning
        # them would read parquet into a guaranteed-empty join) and
        # don't warn about pruning a probe that needed no index.
        # pruned_dirs counts BUCKETED dirs only, same as the main
        # path (a skipped legacy flat delta is not a pruned bucket).
        for d in deltas:
            sub = _delta_bucket_dirs(
                fs, os.path.join(index_path, f"delta={d}")
            )
            skipped += len(sub) if sub else 0
        return paths, skipped, mismatched
    for d in deltas:
        delta_dir = os.path.join(index_path, f"delta={d}")
        sub = _delta_bucket_dirs(fs, delta_dir)
        if sub is None:
            paths.append(delta_dir)  # legacy flat: scan whole
        elif not sub:
            continue  # committed-but-empty delta
        elif _read_n_marker(fs, delta_dir) != n_buckets:
            # bucketed at a different (or unrecorded) N: the bucket
            # names don't correspond to the probe's — full-scan this
            # delta (every bucket leaf dir, so mixed reads stay free
            # of partition-discovery conflicts)
            mismatched += 1
            paths.extend(os.path.join(delta_dir, name) for name in sub)
        else:
            for name in sub:
                if name in wanted:
                    paths.append(os.path.join(delta_dir, name))
                else:
                    skipped += 1
    if mismatched:
        warnings.warn(
            f"span index {index_path}: {mismatched} delta(s) were "
            f"written with a different n_buckets than this probe's "
            f"({n_buckets}) — bucket pruning disabled for them "
            f"(lossless full scan). Re-run compact_span_index at one "
            f"N to restore pruning.",
            stacklevel=3,
        )
    return paths, skipped, mismatched


def _tree_bytes(fs, paths: list[str]) -> int:
    return sum(fs.tree_parquet_bytes(p) for p in paths)


def _committed(fs, path: str, pattern: re.Pattern) -> list[int]:
    if not fs.isdir(path):
        return []
    out = []
    for name in fs.listdir(path):
        m = pattern.match(name)
        if m and fs.exists(os.path.join(path, name, _COMMIT_MARKER)):
            out.append(int(m.group(1)))
    return sorted(out)


def _mark(fs, path: str) -> None:
    fs.write_text(os.path.join(path, _COMMIT_MARKER))


def _recover_compaction(fs, index_path: str) -> None:
    """Heal a compaction interrupted mid-swap.

    ``replace_index_with_compacted`` moves the old tree ASIDE (to
    ``<index_path>.precompact``) before the compacted tree moves in;
    a crash between the two renames leaves ``index_path`` missing.
    Restoring the set-aside tree is always safe (it is the complete
    pre-compaction index), so every reader/writer entry point calls
    this first — an interrupted compaction can never present as an
    empty index (which would silently re-admit the whole dedup
    history)."""
    old = index_path + ".precompact"
    if fs.isdir(old) and not fs.isdir(index_path):
        fs.move(old, index_path)


def fold_span_batch(
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    out_path: str,
    k: int = 20,
    fingerprint: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    seed_index: DataFrame | None = None,
    max_doc_tokens: int | None = 2_000_000,
    n_buckets: int = DEFAULT_N_BUCKETS,
    stats: dict | None = None,
) -> None:
    """One idempotent span-dedup fold (the foreachBatch body).

    1. index = union of committed deltas STRICTLY BELOW ``epoch_id``
       (+ ``seed_index``), pruned to the batch's own bucket set —
       a replay of epoch N sees exactly the index the first attempt
       saw (pruning is lossless: an index row can only hit a batch
       gram if they share ``h``, hence the same bucket), so the
       cleaned output is bit-reproducible;
    2. cleaned batch overwrites ``out_path/epoch=<id>``;
    3. the batch's own ``span_index`` overwrites
       ``index_path/delta=<id>``, partitioned by ``h_bucket``.

    Deltas/epochs NEWER than the folding epoch mean the dirs belong
    to a different stream run (reused path, fresh checkpoint) —
    refused loudly, same contract as ``materialized.fold_batch``,
    and checked on BOTH trees (a reused ``out_path`` would otherwise
    silently union a dead run's generations into
    ``read_clean_output``).

    ``stats`` (tests/ops introspection): when a dict is passed, the
    fold records ``buckets_probed``, ``probe_paths``,
    ``probe_bytes``, ``pruned_dirs``, ``index_bytes`` — the exact
    I/O footprint of the index read, measured from the selected
    directory list itself.
    """
    spark = batch.sparkSession
    ifs, index_path = _state_fs(index_path, "index_path", spark)
    ofs, out_path = _state_fs(out_path, "out_path", spark)
    _recover_compaction(ifs, index_path)
    deltas = _committed(ifs, index_path, _DELTA_RE)
    newer = [d for d in deltas if d > epoch_id]
    if newer:
        raise ValueError(
            f"index dir {index_path} already holds deltas {newer} newer "
            f"than epoch {epoch_id}: it belongs to a different stream "
            f"run (reused path with a fresh checkpoint?). Point the "
            f"stream at an empty index dir or reuse its checkpoint."
        )
    newer_out = [
        e for e in _committed(ofs, out_path, _EPOCH_RE) if e > epoch_id
    ]
    if newer_out:
        raise ValueError(
            f"output dir {out_path} already holds epochs {newer_out} "
            f"newer than epoch {epoch_id}: it belongs to a different "
            f"stream run (reused path with a fresh checkpoint?). Point "
            f"the stream at an empty output dir or reuse its checkpoint."
        )
    prior = [d for d in deltas if d < epoch_id]
    if epoch_id > 0 and not prior and epoch_id in deltas:
        # The look-alike states behind "delta=N exists, no prior,
        # epoch N replaying", told apart by PROVENANCE markers:
        #
        # 1. ``_COMPACTED`` present — the compacted-while-crashed-
        #    mid-epoch state: delta=N was committed by a crashed
        #    attempt, compaction during the downtime collapsed the
        #    tree to ONLY delta=N, and the checkpoint now replays
        #    epoch N.  Proceeding would clean against an EMPTY prior
        #    index and then overwrite delta=N with just this batch's
        #    grams — silently discarding the whole dedup history.
        #    Refuse.
        # 2. ``_N_BUCKETS`` present without ``_COMPACTED`` — the
        #    delta is THIS code's own fold output (every fold stamps
        #    N before committing): the SUPPORTED state of a stream
        #    reusing its checkpoint against a fresh index dir whose
        #    first-ever fold is epoch N>0 and crashed mid-epoch.
        #    Prior history never existed; the idempotent replay
        #    proceeds.
        # 3. NEITHER marker — a pre-marker (r11-era) delta whose
        #    provenance is genuinely unknowable: it could equally be
        #    an old compaction (folding erases history) or the
        #    stream's own old crashed write (replay is safe).
        #    Refuse — that is exactly what the pre-marker guard did
        #    in this state, so no data-loss protection regresses
        #    across the upgrade — and name both resolutions.
        delta_dir = os.path.join(index_path, f"delta={epoch_id}")
        compacted = ifs.exists(
            os.path.join(delta_dir, _COMPACTED_MARKER)
        )
        own_write = not compacted and _read_n_marker(
            ifs, delta_dir
        ) is not None
        if compacted:
            raise ValueError(
                f"index dir {index_path} holds ONLY delta={epoch_id} "
                f"while epoch {epoch_id} is replaying with no prior "
                f"deltas: the index was compacted while the stream "
                f"was crashed mid-epoch (the checkpoint had not "
                f"committed batch {epoch_id}). Folding now would "
                f"erase the compacted history. Compact only after a "
                f"clean availableNow drain (pass checkpoint= to "
                f"replace_index_with_compacted to enforce this)."
            )
        if not own_write:
            raise ValueError(
                f"index dir {index_path} holds ONLY delta={epoch_id} "
                f"(written by a pre-marker version) while epoch "
                f"{epoch_id} is replaying with no prior deltas — "
                f"this is EITHER an old compaction (folding would "
                f"erase the dedup history) or this stream's own "
                f"crashed first write (replay is safe), and without "
                f"a provenance marker the two cannot be told apart. "
                f"If it is the stream's own crashed write, delete "
                f"{delta_dir} and resume (the replay rebuilds it); "
                f"if it is a compaction, restore the pre-compaction "
                f"tree or re-run compaction with this version."
            )

    # ONE gram stream feeds two consumers (the delta index and the
    # probe's hit intervals) — persisted so the batch is tokenized/
    # fingerprinted once per epoch, not once per job; gram rows ≈
    # micro-batch tokens, a bounded scratch footprint.  Equivalent
    # by construction to remove_spans_against + span_index:
    # duplicate_spans_against IS merge_islands(window_hits(grams,
    # index)) and span_index IS grams.select("h").distinct()
    # (functions/dedup.py).
    grams = _gram_stream(
        batch, text_col, id_col, k, fingerprint, tokens_col,
        max_doc_tokens=max_doc_tokens,
    ).persist()
    try:
        # The delta's PARQUET is written first (its commit marker
        # still lands last, after the epoch output commits, so the
        # crash-window ordering is unchanged): the batch's bucket
        # census is then the literal h_bucket= directory listing of
        # what was just written — the exact distinct(pmod(xxhash64
        # (h), N)) set — for free, instead of a second
        # distinct+collect job re-shuffling the gram stream per
        # epoch (measured: the census job was roughly half of the
        # bucketed layout's per-epoch overhead vs the flat layout).
        delta_dir = os.path.join(index_path, f"delta={epoch_id}")
        (
            grams.select("h")
            .distinct()
            .withColumn("h_bucket", _bucket_expr(F.col("h"), n_buckets))
            # one task per bucket → one file per bucket per delta:
            # bounds the delta's file count at n_buckets
            .repartition(F.col("h_bucket"))
            .write.mode("overwrite")
            # pin STATIC overwrite per-write: under a session-wide
            # partitionOverwriteMode=dynamic, a replayed epoch would
            # only overwrite the buckets present in THIS attempt,
            # leaving stale h_bucket= dirs from a crashed attempt
            # written at a different n_buckets — which the census
            # below would then over-count and the fresh _N_BUCKETS
            # marker would mislabel
            .option("partitionOverwriteMode", "static")
            .partitionBy("h_bucket")
            .parquet(ifs.spark_path(delta_dir))
        )
        need_index = bool(prior) or seed_index is not None
        buckets: list[int] = []
        if need_index:
            # bounded driver artifact: at most n_buckets ints — the
            # price of static path-level pruning, paid once per batch
            buckets = sorted(
                int(name.split("=")[1])
                for name in ifs.listdir(delta_dir)
                if _BUCKET_RE.match(name)
            )
        paths, pruned, mismatched = _probe_paths(
            ifs, index_path, prior, buckets, n_buckets
        )
        parts = []
        if paths:
            parts.append(
                spark.read.parquet(
                    *[ifs.spark_path(p) for p in paths]
                ).select("h")
            )
        if seed_index is not None:
            # same lossless bucket filter on the in-memory seed: the
            # rows land in a broadcast/shuffle build side, so
            # shrinking them is pure win even without file pruning
            parts.append(
                seed_index.select("h").filter(
                    _bucket_expr(F.col("h"), n_buckets).isin(
                        [int(b) for b in buckets]
                    )
                    if buckets
                    else F.lit(False)
                )
            )
        if parts:
            idx = parts[0]
            for p in parts[1:]:
                idx = idx.unionByName(p)
        else:
            h_type = "string" if fingerprint == "md5" else "long"
            idx = spark.createDataFrame([], f"h {h_type}")
        if stats is not None:
            stats["buckets_probed"] = list(buckets)
            stats["probe_paths"] = list(paths)
            stats["probe_bytes"] = _tree_bytes(ifs, paths)
            stats["pruned_dirs"] = pruned
            stats["mismatched_n_deltas"] = mismatched
            stats["index_bytes"] = _tree_bytes(
                ifs,
                [os.path.join(index_path, f"delta={d}") for d in prior],
            )

        spans = _merge_islands(
            _window_hits(grams, idx.select("h"), id_col, k), id_col
        )
        cleaned = remove_duplicate_spans(
            batch,
            text_col=text_col,
            id_col=id_col,
            k=k,
            tokens_col=tokens_col,
            spans=spans,
        )
        out_dir = os.path.join(out_path, f"epoch={epoch_id}")
        cleaned.write.mode("overwrite").parquet(ofs.spark_path(out_dir))
        _mark(ofs, out_dir)

        # the delta's parquet was written above (census source);
        # commit it LAST — same marker order as ever, so a crash
        # between the two _mark calls leaves the exact window the
        # replay contract already covers (epoch committed, delta
        # not: the replay rebuilds both).  Layout invariant: record
        # the N this delta was bucketed mod BEFORE the commit
        # marker — committed implies N-recorded.
        _write_n_marker(ifs, delta_dir, n_buckets)
        _mark(ifs, delta_dir)
    finally:
        grams.unpersist()


def maintain_span_dedup(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 20,
    fingerprint: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    seed_index: DataFrame | None = None,
    max_doc_tokens: int | None = 2_000_000,
    n_buckets: int = DEFAULT_N_BUCKETS,
    trigger_once: bool = False,
):
    """Start the continuous span-dedup ingest on a streaming frame.

    ``trigger_once=True`` uses availableNow — drain-then-stop, the
    batch-parity mode the tests and the driver row use.  Returns the
    StreamingQuery (caller owns ``awaitTermination``/``stop``).
    """
    # validate eagerly: an object-store state path should fail at
    # start(), not as an ENOENT inside foreachBatch epoch 0
    _, index_path = _state_fs(
        index_path, "index_path", stream.sparkSession
    )
    _, out_path = _state_fs(out_path, "out_path", stream.sparkSession)

    def fold(batch: DataFrame, epoch_id: int) -> None:
        fold_span_batch(
            batch,
            epoch_id,
            index_path,
            out_path,
            k=k,
            fingerprint=fingerprint,
            id_col=id_col,
            text_col=text_col,
            tokens_col=tokens_col,
            seed_index=seed_index,
            max_doc_tokens=max_doc_tokens,
            n_buckets=n_buckets,
        )

    writer = (
        stream.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_clean_output(spark: SparkSession, out_path: str) -> DataFrame:
    """All committed cleaned batches as one frame."""
    ofs, out_path = _state_fs(out_path, "out_path", spark)
    epochs = _committed(ofs, out_path, _EPOCH_RE)
    if not epochs:
        raise ValueError(f"no committed output generations in {out_path}")
    dfs = [
        spark.read.parquet(
            ofs.spark_path(os.path.join(out_path, f"epoch={e}"))
        )
        for e in epochs
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_span_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The live index as one ``h`` column: union of committed deltas
    (duplicates across deltas possible and harmless — distinct() to
    compact).  Reads bucketed and legacy flat deltas alike; the
    ``h_bucket`` layout column never surfaces."""
    ifs, index_path = _state_fs(index_path, "index_path", spark)
    _recover_compaction(ifs, index_path)
    deltas = _committed(ifs, index_path, _DELTA_RE)
    if not deltas:
        raise ValueError(f"no committed index deltas in {index_path}")
    dfs = []
    for d in deltas:
        delta_dir = os.path.join(index_path, f"delta={d}")
        if _delta_bucket_dirs(ifs, delta_dir) == []:
            continue  # committed-but-empty delta: nothing to read
        dfs.append(
            spark.read.parquet(ifs.spark_path(delta_dir)).select("h")
        )
    if not dfs:
        raise ValueError(
            f"all committed index deltas in {index_path} are empty"
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def compact_span_index(
    spark: SparkSession,
    index_path: str,
    compacted_path: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """Offline maintenance: rewrite the delta tree as one distinct
    BUCKETED index (reclaims cross-delta duplicate fingerprints AND
    the per-delta file-count term of the probe — after the swap a
    probe for B buckets opens exactly B files).  Also migrates
    legacy flat deltas to the bucketed layout.  Run on storage
    cadence, never in the ingest hot path.  Compacting at a
    DIFFERENT ``n_buckets`` than the deltas were written with is the
    supported way to re-size the layout: the recorded-N marker makes
    both this read (mismatch → full scan, lossless) and every later
    probe agree on what the tree actually is."""
    cfs, compacted_path = _state_fs(compacted_path, "compacted_path", spark)
    (
        read_span_index(spark, index_path)
        .distinct()
        .withColumn("h_bucket", _bucket_expr(F.col("h"), n_buckets))
        .repartition(F.col("h_bucket"))
        .write.mode("overwrite")
        # static per-write, for the same crashed-attempt-at-
        # different-N census/labeling hazard as the fold's delta
        # write (see fold_span_batch)
        .option("partitionOverwriteMode", "static")
        .partitionBy("h_bucket")
        .parquet(cfs.spark_path(compacted_path))
    )
    _write_n_marker(cfs, compacted_path, n_buckets)


def _checkpoint_max_committed(fs, checkpoint: str) -> int | None:
    """Highest batch id in a structured-streaming checkpoint's
    ``commits/`` log (plain integer filenames), or None if none."""
    commits = os.path.join(checkpoint, "commits")
    if not fs.isdir(commits):
        return None
    ids = [int(n) for n in fs.listdir(commits) if n.isdigit()]
    return max(ids) if ids else None


def replace_index_with_compacted(
    index_path: str,
    compacted_path: str,
    checkpoint: str | None = None,
    spark: SparkSession | None = None,
) -> None:
    """Swap the delta tree for one compacted delta.

    The compacted delta KEEPS the highest committed delta id: a
    stream resuming its checkpoint continues at higher epochs and
    sees it as prior state, while a fresh-checkpoint run (epochs
    restarting at 0) trips ``fold_span_batch``'s newer-delta refusal
    instead of silently overwriting the compacted corpus.

    Only safe after a CLEAN drain (e.g. an availableNow run that
    terminated), not merely "stream not running": if the stream
    crashed after committing delta=N but before the checkpoint
    committed batch N, a post-compaction resume replays epoch N
    against an index holding ONLY delta=N — ``fold_span_batch``
    refuses that state loudly, but the compaction itself is the
    wrong move.  Pass ``checkpoint=`` (the stream's checkpoint
    location) to enforce the precondition here: the swap is refused
    unless the checkpoint's commits log shows batch id >= the
    highest committed delta.
    """
    ifs, index_path = _state_fs(index_path, "index_path", spark)
    cfs, compacted_path = _state_fs(compacted_path, "compacted_path", spark)
    if type(ifs) is not type(cfs):
        raise ValueError(
            f"index_path {index_path!r} and compacted_path "
            f"{compacted_path!r} resolve to different state "
            f"filesystems — the swap is a same-filesystem rename; "
            f"use the same path form (both plain local, or both "
            f"URIs on one filesystem) for both."
        )
    if checkpoint is not None:
        kfs, checkpoint = _state_fs(checkpoint, "checkpoint", spark)
    if _read_n_marker(cfs, compacted_path) is None:
        # a compacted tree without its _N_BUCKETS marker is either a
        # crash-truncated compact_span_index run (parquet written,
        # marker not yet) or a pre-marker artifact — swapping it in
        # would make EVERY future fold treat the sole delta as
        # unrecorded-N and full-scan the whole index per micro-batch
        # (with a warning each time): the exact I/O the bucketed
        # layout exists to avoid.  Refuse at the swap, where the fix
        # is one cheap re-run.
        raise ValueError(
            f"compacted tree {compacted_path} carries no "
            f"{_N_MARKER} marker (crash-truncated or pre-marker "
            f"compaction output). Re-run compact_span_index to "
            f"produce a complete artifact before swapping it in."
        )
    deltas = _committed(ifs, index_path, _DELTA_RE)
    if not deltas:
        raise ValueError(f"no committed index deltas in {index_path}")
    keep = deltas[-1]
    if checkpoint is not None:
        done = _checkpoint_max_committed(kfs, checkpoint)
        if done is None or done < keep:
            raise ValueError(
                f"checkpoint {checkpoint} has committed through batch "
                f"{done}, but the index holds delta={keep}: the stream "
                f"crashed mid-epoch and will REPLAY epoch {keep} on "
                f"resume. Compacting now would leave the replay with "
                f"no prior history. Resume the stream to a clean drain "
                f"first, then compact."
            )
    tmp = index_path + ".compacting"
    if ifs.exists(tmp):
        ifs.rmtree(tmp)
    ifs.makedirs(tmp)
    ifs.move(compacted_path, os.path.join(tmp, f"delta={keep}"))
    # the kept delta carries compact_span_index's _N_BUCKETS marker;
    # add the compaction provenance marker so fold_span_batch can
    # tell "history was compacted into this delta" apart from "this
    # is the stream's own crashed first write" when epoch `keep`
    # replays against it with no prior deltas
    ifs.write_text(
        os.path.join(tmp, f"delta={keep}", _COMPACTED_MARKER)
    )
    _mark(ifs, os.path.join(tmp, f"delta={keep}"))
    # rename-based swap: the old tree is moved ASIDE before the new
    # one moves in, so no crash instant leaves index_path missing —
    # an rmtree-then-move window would let a resuming stream see an
    # EMPTY index (no deltas → no refusal) and silently re-admit the
    # whole dedup history
    old = index_path + ".precompact"
    if ifs.exists(old):
        ifs.rmtree(old)
    ifs.move(index_path, old)
    try:
        ifs.move(tmp, index_path)
    except BaseException:
        ifs.move(old, index_path)  # restore on failure
        raise
    ifs.rmtree(old)
