"""Stream-maintained aggregate state: parity with batch, replay safety.

Contract: after the stream drains, the finalized state equals the
one-shot batch aggregate over all data — and replaying any epoch
(the failure-recovery path) changes nothing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from semantic_olap_spark.functions.incremental import agg_state, finalize_agg
from semantic_olap_spark.streaming.materialized import (
    fold_batch,
    maintain_agg_state,
    read_agg_state,
)

METRICS = ["value"]


def _events_dir(spark, tables, tmp_path, n_files=3):
    # split events across n files so the file stream yields n epochs
    src = str(tmp_path / "ev_src")
    (
        tables["events"]
        .select("event_id", "user_id", "event_type", "value")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src)
    )
    return src


def _norm(df) -> pd.DataFrame:
    pdf = df.toPandas().sort_values("event_type").reset_index(drop=True)
    return pdf.reindex(sorted(pdf.columns), axis=1)


def test_stream_state_equals_batch_aggregate(spark, tables, tmp_path):
    src = _events_dir(spark, tables, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state_path = str(tmp_path / "state")
    q = maintain_agg_state(
        stream,
        state_path,
        METRICS,
        group_by="event_type",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = _norm(finalize_agg(read_agg_state(spark, state_path), METRICS))
    want = _norm(
        finalize_agg(
            agg_state(
                spark.read.parquet(src), METRICS, group_by="event_type"
            ),
            METRICS,
        )
    )
    assert got.equals(want), f"\n{got}\nvs\n{want}"


def test_epoch_replay_is_idempotent(spark, tables, tmp_path):
    src = _events_dir(spark, tables, tmp_path, n_files=1)
    batch = spark.read.parquet(src)
    state_path = str(tmp_path / "state2")
    half = batch.filter(F.col("event_id") % 2 == 0)
    rest = batch.filter(F.col("event_id") % 2 == 1)
    fold_batch(half, 0, state_path, METRICS, "event_type")
    fold_batch(rest, 1, state_path, METRICS, "event_type")
    once = _norm(finalize_agg(read_agg_state(spark, state_path), METRICS))
    # replay epoch 1 (failure recovery): must rebuild, not add again
    fold_batch(rest, 1, state_path, METRICS, "event_type")
    twice = _norm(finalize_agg(read_agg_state(spark, state_path), METRICS))
    assert once.equals(twice)
    # and the totals match the unsplit aggregate
    n_total = batch.count()
    assert int(twice["n"].sum()) == n_total


def test_generation_pruning(spark, tables, tmp_path):
    import os

    src = _events_dir(spark, tables, tmp_path, n_files=1)
    batch = spark.read.parquet(src).limit(50)
    state_path = str(tmp_path / "state3")
    for e in range(5):
        fold_batch(batch, e, state_path, METRICS, "event_type", keep_generations=2)
    gens = sorted(
        int(d.split("=")[1])
        for d in os.listdir(state_path)
        if d.startswith("epoch=")
    )
    # newest + 2 older kept
    assert gens == [2, 3, 4]


def test_reused_state_dir_with_fresh_checkpoint_refused(spark, tables, tmp_path):
    import pytest

    src = _events_dir(spark, tables, tmp_path, n_files=1)
    batch = spark.read.parquet(src).limit(20)
    state_path = str(tmp_path / "state4")
    fold_batch(batch, 0, state_path, METRICS, "event_type")
    fold_batch(batch, 1, state_path, METRICS, "event_type")
    fold_batch(batch, 2, state_path, METRICS, "event_type")
    # a NEW stream run against the same path restarts epochs at 0:
    # must refuse, not silently serve the old epoch=2 state
    with pytest.raises(ValueError, match="different stream run"):
        fold_batch(batch, 0, state_path, METRICS, "event_type")


def test_keep_generations_zero_refused(spark, tables, tmp_path):
    import pytest

    src = _events_dir(spark, tables, tmp_path, n_files=1)
    batch = spark.read.parquet(src).limit(5)
    with pytest.raises(ValueError, match="keep_generations"):
        fold_batch(
            batch, 0, str(tmp_path / "s5"), METRICS, "event_type",
            keep_generations=0,
        )


def test_stream_quantile_state_equals_batch(spark, tables, tmp_path):
    # the pluggable state algebra: quantile histograms folded through
    # the same generation machinery are bit-identical to a one-shot
    # build over all history
    from semantic_olap_spark.functions.incremental import (
        finalize_quantiles,
        quantile_state,
    )
    from semantic_olap_spark.streaming.materialized import (
        maintain_quantile_state,
    )

    src = _events_dir(spark, tables, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state_path = str(tmp_path / "qstate")
    q = maintain_quantile_state(
        stream, state_path, "value", 0.0, 1000.0, nbins=32,
        group_by="event_type", checkpoint=str(tmp_path / "qckpt"),
    )
    q.awaitTermination(120)
    got_state = read_agg_state(spark, state_path)
    want_state = quantile_state(
        spark.read.parquet(src), "value", 0.0, 1000.0, 32,
        group_by="event_type",
    )
    key = lambda r: r["event_type"]  # noqa: E731
    assert sorted(got_state.collect(), key=key) == sorted(
        want_state.collect(), key=key
    )  # bit-exact state, counts array included
    got = _norm(finalize_quantiles(got_state, 0.0, 1000.0, [0.5, 0.9]))
    want = _norm(finalize_quantiles(want_state, 0.0, 1000.0, [0.5, 0.9]))
    assert got.equals(want), f"\n{got}\nvs\n{want}"
