"""BPE contracts: hand-computed merges, roundtrip, determinism.

No SQL oracle can express the iterative merge LEARNING loop; these
contracts are its evidence.  The encode under the frozen
PINNED_MERGES table is SQL-expressible, so the bpe_tokenize_docs
driver row carries a full recursive-CTE hash oracle; the provenance
test here ties the frozen table back to the learner.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.bpe import (
    END,
    bpe_encode,
    bpe_token_count,
    learn_bpe,
    word_counts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic BPE teaching corpus (Sennrich et al. fig. 1 shape)
    rows = [
        ("low low low low low",),
        ("lower lower",),
        ("newest newest newest newest newest newest",),
        ("widest widest widest",),
    ]
    return spark.createDataFrame(rows, ["text"])


def test_word_counts_deterministic_top(corpus):
    wc = word_counts(corpus, "text", max_vocab=10)
    assert wc[0] == ("newest", 6)
    assert wc[1] == ("low", 5)
    assert dict(wc)["widest"] == 3 and dict(wc)["lower"] == 2


def test_learned_merges_match_hand_computation(corpus):
    merges = learn_bpe(corpus, "text", num_merges=4)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t','</w>') 9 …
    # tie at 9 → lexicographically smallest pair ('e','s') merges
    # first, then ('es','t') 9, then ('est','</w>') 9, then
    # ('l','o') 7
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
    ]


def test_encode_follows_training_and_roundtrips(corpus):
    merges = learn_bpe(corpus, "text", num_merges=10)
    out = bpe_encode(corpus, merges, "text").collect()
    by_text = {r["text"].split()[0]: r["bpe_tokens"] for r in out}
    # with enough merges the most frequent word collapses to ONE
    # token — the vocabulary actually absorbed the corpus
    assert by_text["newest"][0] == "newest" + END
    # roundtrip: concatenating tokens and splitting on </w> restores
    # the original words, for every row
    for r in out:
        words = (
            "".join(r["bpe_tokens"]).replace(END, " ").strip().split()
        )
        assert words == r["text"].lower().split()


def test_unseen_word_falls_back_to_chars(spark, corpus):
    merges = learn_bpe(corpus, "text", num_merges=10)
    other = spark.createDataFrame([("zzq",)], ["text"])
    toks = bpe_encode(other, merges, "text").collect()[0]["bpe_tokens"]
    assert toks == ["z", "z", "q", END]


def test_deterministic_under_repartition(corpus):
    a = learn_bpe(corpus, "text", num_merges=8)
    b = learn_bpe(corpus.repartition(7), "text", num_merges=8)
    assert a == b


def test_token_count_monotone_in_merges(tables):
    docs = tables["documents"].limit(200)
    m_few = learn_bpe(docs, "text", num_merges=5, max_vocab=2000)
    m_many = learn_bpe(docs, "text", num_merges=100, max_vocab=2000)
    few = bpe_token_count(docs, m_few, "text").agg(
        F.sum("bpe_n_tokens")
    ).collect()[0][0]
    many = bpe_token_count(docs, m_many, "text").agg(
        F.sum("bpe_n_tokens")
    ).collect()[0][0]
    # more merges can only shorten encodings (greedy merge is
    # monotone in vocabulary growth for a prefix merge list)
    assert many <= few
    # and both bounded below by the word count (every word >= 1 token)
    n_words = docs.select(
        F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+")))
    ).collect()[0][0]
    assert many >= n_words


def test_plan_language_step(corpus):
    from semantic_olap_spark.plans.executor import PlanExecutor

    merges = [list(m) for m in learn_bpe(corpus, "text", num_merges=4)]
    ex = PlanExecutor()
    out = ex.execute(
        corpus,
        [
            {
                "operator_name": "bpe_token_count",
                "parameters": {"merges": merges, "text_col": "text"},
            }
        ],
    )
    rows = {r["text"].split()[0]: r["bpe_n_tokens"] for r in out.collect()}
    # 'newest' = n e w est</w> → 4 tokens × 6 occurrences = 24
    assert rows["newest"] == 24


def test_empty_and_null_text(spark):
    merges = [("a", "b")]
    df = spark.createDataFrame([("",), (None,)], ["text"])
    rows = bpe_encode(df, merges, "text").collect()
    assert [r["bpe_tokens"] for r in rows] == [[], []]


def test_pinned_merges_provenance(spark):
    # PINNED_MERGES is the frozen tokenizer the bpe_tokenize_docs
    # driver row (and its recursive-CTE DuckDB oracle) encode with.
    # Its documented provenance — learn_bpe on the sf0.01 documents
    # corpus with (num_merges=100, max_vocab=20_000) — must stay
    # byte-identical, or the constant and its docstring have drifted.
    from tests.conftest import SF_T2

    from semantic_olap_spark.functions.bpe import PINNED_MERGES

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    relearned = learn_bpe(docs, "text", num_merges=100, max_vocab=20_000)
    assert relearned == PINNED_MERGES
