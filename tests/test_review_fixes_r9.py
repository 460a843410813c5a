"""Regression pins for the r9 self-review findings.

One test per finding, so a regression is attributable: null-text
token accounting, shuffle_rows key-uniqueness/null-encoding,
md5+tokens_col separator injectivity, reliable-checkpoint dir reuse,
taxonomy persistence exports.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_null_text_rows_pass_through_with_zero_counts(spark):
    # F.size(null) = -1 previously leaked orig_tokens = -1
    from semantic_olap_spark.functions.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "a b c d e")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, k=5).collect()}
    assert out[2].text is None
    assert out[2].orig_tokens == 0 and out[2].removed_tokens == 0
    assert out[1].removed_tokens == 5  # the dup pair still detected


def test_null_tokens_col_rows_pass_through(spark):
    from semantic_olap_spark.functions.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, None), (3, [1, 2, 3])],
        "doc_id long, ids array<int>",
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(df, k=3, tokens_col="ids").collect()
    }
    assert out[2].ids is None
    assert out[2].orig_tokens == 0 and out[2].removed_tokens == 0
    assert out[1].ids == [] and out[1].removed_tokens == 3


def test_shuffle_rows_rejects_duplicate_keys(spark):
    from semantic_olap_spark.functions.sampling import shuffle_rows

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["doc_id", "source"]
    )
    with pytest.raises(ValueError, match="unique key_cols"):
        shuffle_rows(df, ["source"]).collect()
    # unique key passes; validate_unique=False skips the check
    assert shuffle_rows(df, ["doc_id"]).count() == 3
    assert (
        shuffle_rows(df, ["source"], validate_unique=False).count() == 3
    )


def test_shuffle_rows_null_key_parts_do_not_collide(spark):
    # concat_ws silently drops nulls: ("a", null) and (null, "a")
    # would previously share one md5 key
    from semantic_olap_spark.functions.sampling import shuffle_rows

    df = spark.createDataFrame(
        [("a", None), (None, "a")], "k1 string, k2 string"
    )
    out = shuffle_rows(df, ["k1", "k2"]).collect()
    assert len(out) == 2  # validation sees 2 DISTINCT keys — no raise


def test_md5_tokens_col_space_tokens_do_not_collide(spark):
    # ["new york","city"] vs ["new","york city"]: same space-joined
    # string, different windows — must NOT be reported as duplicates
    from semantic_olap_spark.functions.dedup import duplicate_spans

    df = spark.createDataFrame(
        [
            (1, ["new york", "city", "hall", "x"]),
            (2, ["new", "york city", "hall", "y"]),
        ],
        "doc_id long, chunks array<string>",
    )
    for mode in ("md5", "xxhash64"):
        assert (
            duplicate_spans(
                df, k=3, tokens_col="chunks", fingerprint=mode
            ).count()
            == 0
        ), mode


def test_lineage_cut_sets_checkpoint_dir_once_per_path(spark, tmp_path):
    from semantic_olap_spark.caching import lineage_cut

    ckdir = str(tmp_path / "ck")
    df = spark.range(10)
    a = lineage_cut(df, ckdir)
    b = lineage_cut(a.withColumn("x", F.col("id") + 1), ckdir)
    assert b.count() == 10
    # setCheckpointDir mkdirs a UUID subdir per CALL; reusing the
    # same path must reuse the first one
    subdirs = [d for d in os.listdir(ckdir)]
    assert len(subdirs) == 1, subdirs


def test_taxonomy_persistence_exported_with_fit_apply(tmp_path):
    from semantic_olap_spark.operators import (  # noqa: F401
        fit_cluster_taxonomy,
        load_taxonomy,
        save_taxonomy,
        sem_group_cluster_apply,
    )

    p = str(tmp_path / "tax.json")
    save_taxonomy(p, ["w1", "w2"], [[0.0, 1.0]], ["t"])
    vocab, cent, tags = load_taxonomy(p)
    assert vocab == ["w1", "w2"] and cent == [[0.0, 1.0]] and tags == ["t"]
