"""Continuous materialized views: stream-maintained aggregate state.

Composes Structured Streaming with the exact mergeable states of
functions/incremental.py: each micro-batch's ``agg_state`` folds
into a persisted state table via ``foreachBatch``, giving an
always-current aggregate over an unbounded stream at per-batch cost
|groups|, not |history|.

Exactly-once story (the part that usually goes wrong): a failed
micro-batch can be REPLAYED, and a naive read-modify-write would
double-count it.  State generations are therefore written to
``<path>/epoch=<id>`` keyed by the foreachBatch epoch: a replay of
epoch N rebuilds from the newest generation *strictly below* N and
overwrites ``epoch=N`` — idempotent by construction (the standard
idempotent-foreachBatch discipline, keyed on the engine's batch id).
Old generations are pruned past ``keep_generations``.

Reads never block writes: ``read_agg_state`` loads the newest
complete generation; ``finalize_agg`` turns it into user-facing
aggregates.

State-layer scope (same contract as ``streaming/spans.py``): the
commit markers and generation pruning go through the shared state
filesystem seam (:mod:`semantic_olap_spark.streaming.statefs`) —
plain local paths use os-level I/O, ``file://``/``hdfs://`` URIs
the Hadoop FileSystem API.  Object-store schemes (``s3a://``, ...)
are refused loudly at every entry point: the swap/recovery protocol
of the sibling span layer needs atomic rename, and this layer keeps
one contract with it rather than a per-module carve-out.
"""

from __future__ import annotations

import os
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from semantic_olap_spark.functions.incremental import (
    agg_state,
    merge_agg_states,
    merge_quantile_states,
    quantile_state,
)
from semantic_olap_spark.streaming.statefs import resolve_state_fs

_EPOCH_RE = re.compile(r"^epoch=(\d+)$")


_COMMIT_MARKER = "_STATE_COMMITTED"


def _state_fs(path: str, spark=None):
    """Aggregate-state instantiation of the shared seam; returns
    ``(fs, normalized_path)``."""
    return resolve_state_fs(
        path, "state path", layer="aggregate-state layer", spark=spark
    )


def _generations(fs, path: str) -> list[int]:
    # A generation counts only once its explicit commit marker exists
    # (written by fold_batch AFTER the parquet job returns).  Hadoop's
    # _SUCCESS is accepted for back-compat with pre-marker state dirs,
    # but is not relied on: clusters with
    # mapreduce.fileoutputcommitter.marksuccessfuljobs=false never
    # write it, which would otherwise make every generation invisible
    # and silently rebuild state from empty.
    if not fs.isdir(path):
        return []
    out = []
    for name in fs.listdir(path):
        m = _EPOCH_RE.match(name)
        if m and (
            fs.exists(os.path.join(path, name, _COMMIT_MARKER))
            or fs.exists(os.path.join(path, name, "_SUCCESS"))
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def fold_batch(
    batch: DataFrame,
    epoch_id: int,
    path: str,
    metrics: Sequence[str],
    group_by: str | Sequence[str] | None = None,
    keep_generations: int = 2,
    state_fn=None,
    merge_fn=None,
) -> None:
    """One idempotent state fold (the foreachBatch body).

    The state algebra is pluggable: ``state_fn(batch) -> state`` and
    ``merge_fn([prev, new]) -> state`` default to the exact algebraic
    aggregates (``agg_state``/``merge_agg_states`` over ``metrics``);
    any mergeable state with the same
    commutative-monoid contract (quantile histograms, HLL binaries)
    folds through the identical generation machinery.

    Rebuilds from the newest generation strictly below ``epoch_id``
    and overwrites ``epoch=<epoch_id>`` — replaying an epoch
    reproduces, never double-counts.

    ``keep_generations`` must be ≥ 1: the replayed epoch rebuilds
    from its predecessor, so pruning everything below the current
    epoch would make failure recovery drop all pre-crash history.

    Generations NEWER than the folding epoch mean the state dir
    belongs to a different stream run (a reused path with a fresh
    checkpoint restarts epochs at 0) — that is refused loudly,
    because the alternative is ``read_agg_state`` silently serving
    the previous run's aggregate forever.
    """
    if keep_generations < 1:
        raise ValueError(
            "keep_generations must be >= 1 — a replayed epoch rebuilds "
            "from its predecessor (the idempotence contract)"
        )
    fs, path = _state_fs(path, batch.sparkSession)
    gens = _generations(fs, path)
    newer = [g for g in gens if g > epoch_id]
    if newer:
        raise ValueError(
            f"state dir {path} already holds generations {newer} newer "
            f"than epoch {epoch_id}: it belongs to a different stream "
            f"run (reused path with a fresh checkpoint?). Point the "
            f"stream at an empty state dir or reuse its checkpoint."
        )
    spark = batch.sparkSession
    new = (
        state_fn(batch) if state_fn is not None
        else agg_state(batch, metrics, group_by)
    )
    prior = [g for g in gens if g < epoch_id]
    if prior:
        prev = spark.read.parquet(
            fs.spark_path(os.path.join(path, f"epoch={prior[-1]}"))
        )
        new = (
            merge_fn([prev, new]) if merge_fn is not None
            else merge_agg_states([prev, new], metrics, group_by)
        )
    gen_dir = os.path.join(path, f"epoch={epoch_id}")
    new.write.mode("overwrite").parquet(fs.spark_path(gen_dir))
    # explicit commit marker, independent of Hadoop's configurable
    # _SUCCESS — a generation without it is treated as incomplete
    fs.write_text(os.path.join(gen_dir, _COMMIT_MARKER))
    # prune: keep the newest `keep_generations` strictly-older
    # generations for replay and readers in flight, drop the rest
    done = [g for g in _generations(fs, path) if g < epoch_id]
    for g in done[:-keep_generations]:
        fs.rmtree(os.path.join(path, f"epoch={g}"), ignore_errors=True)


def maintain_agg_state(
    stream: DataFrame,
    path: str,
    metrics: Sequence[str],
    group_by: str | Sequence[str] | None = None,
    checkpoint: str | None = None,
    keep_generations: int = 2,
    trigger_available_now: bool = True,
):
    """Start a stream that maintains a merged aggregate state at ``path``.

    Returns the ``StreamingQuery``; call ``awaitTermination()`` for
    availableNow runs.  The state at any time is readable with
    :func:`read_agg_state`.
    """
    _, path = _state_fs(path, stream.sparkSession)

    def fold(batch: DataFrame, epoch_id: int) -> None:
        fold_batch(batch, epoch_id, path, metrics, group_by, keep_generations)

    writer = stream.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_quantile_state(
    stream: DataFrame,
    path: str,
    metric: str,
    lo: float,
    hi: float,
    nbins: int = 64,
    group_by: str | Sequence[str] | None = None,
    checkpoint: str | None = None,
    keep_generations: int = 2,
    trigger_available_now: bool = True,
):
    """Stream-maintained quantile state: the percentile dashboard
    that never re-sorts history.

    Same generation/replay machinery as :func:`maintain_agg_state`
    with the fixed-bin histogram algebra
    (``quantile_state``/``merge_quantile_states``) — per-batch cost
    is one partial-agg shuffle emitting ``nbins`` longs per group;
    decode any time with ``finalize_quantiles(read_agg_state(...))``.
    The folded state is bit-identical to a one-shot build over all
    history (elementwise integer adds — the test contract).
    """
    _, path = _state_fs(path, stream.sparkSession)

    def fold(batch: DataFrame, epoch_id: int) -> None:
        fold_batch(
            batch, epoch_id, path, metrics=(), group_by=group_by,
            keep_generations=keep_generations,
            state_fn=lambda b: quantile_state(
                b, metric, lo, hi, nbins, group_by
            ),
            merge_fn=lambda frames: merge_quantile_states(
                frames, group_by
            ),
        )

    writer = stream.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_agg_state(spark: SparkSession, path: str) -> DataFrame:
    """Newest complete state generation (raise if none exists yet)."""
    fs, path = _state_fs(path, spark)
    gens = _generations(fs, path)
    if not gens:
        raise FileNotFoundError(f"no state generations under {path}")
    return spark.read.parquet(
        fs.spark_path(os.path.join(path, f"epoch={gens[-1]}"))
    )
