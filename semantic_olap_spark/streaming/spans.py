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
- ``index_path/delta=<id>/`` the batch's own ``span_index`` —
  APPEND-ONLY deltas, never a rewrite.  The probe tolerates
  duplicate fingerprints across deltas by construction (duplicate
  index rows duplicate hit intervals, which the island merge's
  min/max collapses — ``functions/dedup.py``
  ``duplicate_spans_against``), so the per-batch cost is
  fingerprinting the BATCH only: no corpus-sized shuffle, no
  index rewrite, the shape a 100 TB stream needs.  Cross-delta
  duplicate hashes cost only index bytes; reclaim them with an
  offline compaction (read the index, ``.distinct()``, rewrite) on
  whatever cadence storage demands.

Semantics note: within-batch repetition is deliberately NOT removed
(a span occurring twice inside epoch N survives epoch N) — that is
``remove_duplicate_spans``' job and the two compose; the FIRST
occurrence epoch of any span is the one the stream admits, every
later epoch's occurrence is stripped.  Exactly the Lee et al. 2022
"seen before" policy applied at ingest time.

Reference scope note: the reference engine has neither streaming nor
span dedup; this is part of the beyond-reference training-pipeline
family (SURVEY.md §7.1 M7/M8).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from semantic_olap_spark.functions.dedup import (
    _gram_stream,
    _merge_islands,
    _window_hits,
    remove_duplicate_spans,
)

_DELTA_RE = re.compile(r"^delta=(\d+)$")
_EPOCH_RE = re.compile(r"^epoch=(\d+)$")
_COMMIT_MARKER = "_STATE_COMMITTED"


def _committed(path: str, pattern: re.Pattern) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = pattern.match(name)
        if m and os.path.exists(os.path.join(path, name, _COMMIT_MARKER)):
            out.append(int(m.group(1)))
    return sorted(out)


def _mark(path: str) -> None:
    with open(os.path.join(path, _COMMIT_MARKER), "w"):
        pass


def _recover_compaction(index_path: str) -> None:
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
    if os.path.isdir(old) and not os.path.isdir(index_path):
        shutil.move(old, index_path)


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
) -> None:
    """One idempotent span-dedup fold (the foreachBatch body).

    1. index = union of committed deltas STRICTLY BELOW ``epoch_id``
       (+ ``seed_index``) — a replay of epoch N sees exactly the
       index the first attempt saw, so the cleaned output is
       bit-reproducible;
    2. cleaned batch overwrites ``out_path/epoch=<id>``;
    3. the batch's own ``span_index`` overwrites
       ``index_path/delta=<id>``.

    Deltas NEWER than the folding epoch mean the dirs belong to a
    different stream run (reused path, fresh checkpoint) — refused
    loudly, same contract as ``materialized.fold_batch``.
    """
    spark = batch.sparkSession
    _recover_compaction(index_path)
    deltas = _committed(index_path, _DELTA_RE)
    newer = [d for d in deltas if d > epoch_id]
    if newer:
        raise ValueError(
            f"index dir {index_path} already holds deltas {newer} newer "
            f"than epoch {epoch_id}: it belongs to a different stream "
            f"run (reused path with a fresh checkpoint?). Point the "
            f"stream at an empty index dir or reuse its checkpoint."
        )
    prior = [d for d in deltas if d < epoch_id]
    parts = [
        spark.read.parquet(os.path.join(index_path, f"delta={d}"))
        for d in prior
    ]
    if seed_index is not None:
        parts.append(seed_index.select("h"))
    if parts:
        idx = parts[0]
        for p in parts[1:]:
            idx = idx.unionByName(p)
    else:
        h_type = "string" if fingerprint == "md5" else "long"
        idx = spark.createDataFrame([], f"h {h_type}")

    # ONE gram stream feeds both jobs (the probe's hit intervals and
    # the delta index are both views of it) — persisted so the batch
    # is tokenized/fingerprinted once per epoch, not once per write;
    # gram rows ≈ micro-batch tokens, a bounded scratch footprint.
    # Equivalent by construction to remove_spans_against +
    # span_index: duplicate_spans_against IS
    # merge_islands(window_hits(grams, index)) and span_index IS
    # grams.select("h").distinct() (functions/dedup.py).
    grams = _gram_stream(
        batch, text_col, id_col, k, fingerprint, tokens_col,
        max_doc_tokens=max_doc_tokens,
    ).persist()
    try:
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
        cleaned.write.mode("overwrite").parquet(out_dir)
        _mark(out_dir)

        delta_dir = os.path.join(index_path, f"delta={epoch_id}")
        grams.select("h").distinct().write.mode("overwrite").parquet(
            delta_dir
        )
        _mark(delta_dir)
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
    trigger_once: bool = False,
):
    """Start the continuous span-dedup ingest on a streaming frame.

    ``trigger_once=True`` uses availableNow — drain-then-stop, the
    batch-parity mode the tests and the driver row use.  Returns the
    StreamingQuery (caller owns ``awaitTermination``/``stop``).
    """

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
    epochs = _committed(out_path, _EPOCH_RE)
    if not epochs:
        raise ValueError(f"no committed output generations in {out_path}")
    dfs = [
        spark.read.parquet(os.path.join(out_path, f"epoch={e}"))
        for e in epochs
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_span_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The live index: union of committed deltas (duplicates across
    deltas possible and harmless — distinct() to compact)."""
    _recover_compaction(index_path)
    deltas = _committed(index_path, _DELTA_RE)
    if not deltas:
        raise ValueError(f"no committed index deltas in {index_path}")
    dfs = [
        spark.read.parquet(os.path.join(index_path, f"delta={d}"))
        for d in deltas
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def compact_span_index(
    spark: SparkSession, index_path: str, compacted_path: str
) -> None:
    """Offline maintenance: rewrite the delta tree as one distinct
    index (reclaims cross-delta duplicate fingerprints).  Run on
    storage cadence, never in the ingest hot path."""
    read_span_index(spark, index_path).distinct().write.mode(
        "overwrite"
    ).parquet(compacted_path)


def replace_index_with_compacted(
    index_path: str, compacted_path: str
) -> None:
    """Swap the delta tree for one compacted delta.

    The compacted delta KEEPS the highest committed delta id: a
    stream resuming its checkpoint continues at higher epochs and
    sees it as prior state, while a fresh-checkpoint run (epochs
    restarting at 0) trips ``fold_span_batch``'s newer-delta refusal
    instead of silently overwriting the compacted corpus.  Only safe
    while no stream is writing ``index_path``.
    """
    deltas = _committed(index_path, _DELTA_RE)
    if not deltas:
        raise ValueError(f"no committed index deltas in {index_path}")
    keep = deltas[-1]
    tmp = index_path + ".compacting"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    shutil.move(compacted_path, os.path.join(tmp, f"delta={keep}"))
    _mark(os.path.join(tmp, f"delta={keep}"))
    # rename-based swap: the old tree is moved ASIDE before the new
    # one moves in, so no crash instant leaves index_path missing —
    # an rmtree-then-move window would let a resuming stream see an
    # EMPTY index (no deltas → no refusal) and silently re-admit the
    # whole dedup history
    old = index_path + ".precompact"
    if os.path.exists(old):
        shutil.rmtree(old)
    shutil.move(index_path, old)
    try:
        shutil.move(tmp, index_path)
    except BaseException:
        shutil.move(old, index_path)  # restore on failure
        raise
    shutil.rmtree(old)
