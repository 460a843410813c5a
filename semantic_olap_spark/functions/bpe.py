"""Distributed BPE: learn a subword vocabulary from a corpus, encode with it.

A training-data pipeline needs token counts under the *actual*
tokenizer it will train with — the whitespace and regex counters in
functions/text.py are calibration proxies.  This module implements
byte-pair encoding the way tokenizer trainers do it at corpus scale:

1. ``word_counts`` — the only pass over the data: tokenize, explode,
   ``groupBy(word).count``, keep the ``max_vocab`` most frequent
   words.  At 100 TB this is one map-side-combined shuffle whose
   output is bounded by the word vocabulary (Heaps' law: millions,
   not trillions), then a bounded driver collect.
2. ``learn_bpe`` — classic merge learning (Sennrich et al. 2016,
   "Neural Machine Translation of Rare Words with Subword Units" —
   public algorithm) over the *word-frequency table*, not the
   corpus: every BPE implementation's training loop is equivalent to
   operating on (word, count) pairs, so once counts are aggregated
   the corpus size is out of the picture.  Driver-side by design —
   each merge depends on the previous one (inherently sequential),
   and the state is a bounded table.
3. ``bpe_encode`` — distributed apply: Arrow-batched pandas UDF,
   merge ranks broadcast read-only to every executor, greedy
   lowest-rank-first merging per word (the standard encode).  A
   per-batch word cache exploits Zipf: each distinct word in a batch
   is encoded once.

Determinism: ties in pair frequency break lexicographically, so the
learned merge list is a pure function of the aggregated counts —
re-runs and resharded corpora learn the identical vocabulary.

No SQL oracle can express the iterative merge *learning* loop;
its correctness evidence is the pytest contract suite
(hand-computed merges on a known corpus, encode/decode roundtrip,
determinism under repartitioning) plus the provenance test that
re-learns ``PINNED_MERGES`` from the sf0.01 corpus.  The *encode*
with a frozen merge table IS SQL-expressible (greedy
lowest-rank-first merging as a recursive CTE), which is how the
``bpe_tokenize_docs`` driver row gets a full hash-match oracle.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

# Must match word_counts' Java-regex ``\s+`` split (ASCII whitespace
# only) — training and encoding have to tokenize identically, and
# Python's bare str.split() would also split on Unicode whitespace.
_WS = re.compile(r"\s+", re.ASCII)

END = "</w>"  # end-of-word marker: lets merges distinguish suffixes

# A pinned tokenizer vocabulary: the merge table ``learn_bpe`` learns
# from /root/testdata/sf0.01/documents.parquet with
# (num_merges=100, max_vocab=20_000) — regenerated and asserted
# byte-identical by tests/test_bpe.py::test_pinned_merges_provenance.
# Real pipelines tokenize with a *frozen* pretrained vocabulary (the
# tokenizer ships with the model, it isn't relearned per query), so
# the driver-contract row encodes with this constant; that also makes
# the row a pure deterministic function of the input rows, which is
# what lets the DuckDB oracle replicate it bit-for-bit (the merge
# table embeds as SQL literals, the greedy lowest-rank-first encode
# as a recursive CTE — the lsh_topk literal-hyperplane trick).
PINNED_MERGES: list[tuple[str, str]] = [
    ('e', 'r'), ('e', '</w>'), ('n', '</w>'), ('er', '</w>'),
    ('o', 'w'), ('ow', '</w>'), ('o', 'r'), ('s', 't'),
    ('h', '</w>'), ('a', 't'), ('l', 'u'), ('i', 'n'),
    ('a', '</w>'), ('g', '</w>'), ('y', '</w>'), ('a', 'r'),
    ('p', 'ar'), ('t', '</w>'), ('i', 'n</w>'), ('j', 'o'),
    ('jo', 'in</w>'), ('a', 's'), ('as', 'h</w>'), ('h', 'ash</w>'),
    ('r', 'ow</w>'), ('at', 'c'), ('atc', 'h</w>'), ('b', 'atch</w>'),
    ('a', 'n</w>'), ('c', 'an</w>'), ('s', 'can</w>'), ('c', 'o'),
    ('c', 'u'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n</w>'),
    ('cu', 'st'), ('cust', 'o'), ('custo', 'm'), ('custom', 'er</w>'),
    ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er</w>'),
    ('a', 'l'), ('al', 'l'), ('all', '</w>'), ('m', 'all</w>'),
    ('s', 'mall</w>'), ('er', 'g'), ('erg', 'e</w>'), ('l', 'ow</w>'),
    ('m', 'erge</w>'), ('s', 'low</w>'), ('c', 't'), ('ct', 'or'),
    ('ctor', '</w>'), ('d', 'er</w>'), ('e', 'ctor</w>'), ('or', 'der</w>'),
    ('v', 'ector</w>'), ('in', 'e</w>'), ('l', 'ine</w>'), ('a', 'b'),
    ('ab', 'l'), ('abl', 'e</w>'), ('at', 'a</w>'), ('d', 'ata</w>'),
    ('t', 'able</w>'), ('p', '</w>'), ('u', 'p</w>'), ('a', 'g'),
    ('ag', 'g</w>'), ('a', 'lu'), ('alu', 'e</w>'), ('v', 'alue</w>'),
    ('e', 'y</w>'), ('k', 'ey</w>'), ('a', 'm'), ('am', '</w>'),
    ('e', 'am</w>'), ('r', 'eam</w>'), ('st', 'ream</w>'), ('d', 'ow</w>'),
    ('in', 'dow</w>'), ('w', 'indow</w>'), ('k', '</w>'), ('par', 'k</w>'),
    ('s', 'park</w>'), ('g', 'r'), ('gr', 'o'), ('gro', 'up</w>'),
    ('par', 't</w>'), ('b', 'i'), ('bi', 'g</w>'), ('or', 't</w>'),
    ('s', 'ort</w>'), ('er', 'y</w>'), ('q', 'u'), ('qu', 'ery</w>'),
]


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 100_000,
    lowercase: bool = True,
) -> list[tuple[str, int]]:
    """Corpus word frequencies: the single distributed pass of BPE.

    Returns the ``max_vocab`` most frequent words (count desc, word
    asc — deterministic) as driver-side pairs.  The groupBy is
    map-side combined; only distinct words cross the shuffle.
    """
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    words = df.select(
        F.explode(
            F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
        ).alias("_w")
    )
    top = (
        words.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_w").asc())
        .limit(int(max_vocab))
        .collect()
    )
    return [(r["_w"], r["_n"]) for r in top]


def _pair_counts(
    vocab: dict[tuple[str, ...], int],
) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_vocab: int = 100_000,
    min_pair_count: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Words start as character sequences with a trailing ``</w>``
    marker; each round merges the most frequent adjacent symbol pair
    (ties: lexicographic — deterministic).  Stops early when no pair
    reaches ``min_pair_count``.
    """
    counts = word_counts(df, text_col, max_vocab, lowercase)
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in counts:
        syms = tuple(list(w) + [END])
        vocab[syms] = vocab.get(syms, 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(s, pair): n for s, n in vocab.items()}
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (distributed).

    Greedy lowest-rank-first merging per word — the standard BPE
    encode, guaranteed consistent with training order.  The merge
    ranks ride to executors once (closure broadcast, read-only);
    per-batch word caching collapses Zipf-heavy batches to one
    encode per distinct word.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(t: str) -> list[str]:
            if t is None:
                return []
            if lowercase:
                t = t.lower()
            out: list[str] = []
            for w in _WS.split(t):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = _encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        return texts.map(run)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_n_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Per-row token count under the learned vocabulary."""
    tmp = f"_{out_col}_arr"
    out = bpe_encode(df, merges, text_col, tmp, lowercase)
    return out.withColumn(
        out_col, F.size(F.col(tmp)).cast(IntegerType())
    ).drop(tmp)
