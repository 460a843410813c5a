"""Fixed-seed fuzz for ExactSubstr span dedup vs a brute-force oracle.

The targeted tests in test_span_dedup.py cover planted shapes and the
DuckDB parity; this module samples random small-vocabulary corpora
(tiny vocab → natural k-gram collisions, the adversarial regime for
the island merge) and checks the distributed pipeline against an
exhaustive in-Python reference: mark every token covered by ANY
duplicated window, then read maximal marked runs.  Marked-token runs
are provably identical to the operator's merge rule (windows merge
when the next start <= previous end + 1), so any divergence is a real
bug.  Seeds fixed: failures reproduce.
"""

from __future__ import annotations

import random

from tests.conftest import fuzz_budget
import re
from collections import Counter


def _ref_spans(texts: dict[int, str], k: int, min_count: int):
    toks = {
        d: [t for t in re.split(r"\s+", s) if t] for d, s in texts.items()
    }
    cnt: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            cnt[" ".join(ts[i : i + k])] += 1
    spans = []
    removed = {}
    for d, ts in sorted(toks.items()):
        marked = [False] * len(ts)
        for i in range(len(ts) - k + 1):
            if cnt[" ".join(ts[i : i + k])] >= min_count:
                for j in range(i, i + k):
                    marked[j] = True
        i = 0
        while i < len(ts):
            if marked[i]:
                j = i
                while j + 1 < len(ts) and marked[j + 1]:
                    j += 1
                spans.append((d, i + 1, j + 1, j - i + 1))
                i = j + 1
            else:
                i += 1
        removed[d] = (
            " ".join(t for t, m in zip(ts, marked) if not m),
            sum(marked),
            len(ts),
        )
    return spans, removed


def _rand_corpus(rng: random.Random, n_docs: int, vocab: int):
    # small vocab + short docs → dense k-gram collisions; a few docs
    # get literal copy-paste from an earlier doc (the realistic case)
    texts = {}
    words = [f"w{i}" for i in range(vocab)]
    for d in range(n_docs):
        n = rng.randint(0, 30)
        ts = [rng.choice(words) for _ in range(n)]
        if d > 0 and rng.random() < 0.4 and texts[d - 1]:
            prev = texts[d - 1].split()
            if prev:
                a = rng.randrange(len(prev))
                b = rng.randrange(a, min(len(prev), a + 12) + 1)
                pos = rng.randint(0, len(ts))
                ts[pos:pos] = prev[a:b]
        texts[d] = " ".join(ts)
    return texts


def test_span_dedup_fuzz_vs_bruteforce(spark):
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    rng = random.Random(20260816)
    for trial in range(fuzz_budget(6, 3)):
        k = rng.choice([2, 3, 5])
        min_count = rng.choice([2, 2, 3])
        texts = _rand_corpus(
            rng, n_docs=rng.randint(3, 14), vocab=rng.choice([3, 5, 8])
        )
        df = spark.createDataFrame(
            list(texts.items()), ["doc_id", "text"]
        )
        want_spans, want_removed = _ref_spans(texts, k, min_count)
        got_spans = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in duplicate_spans(
                df, k=k, min_count=min_count
            ).collect()
        )
        assert got_spans == sorted(want_spans), (
            f"trial {trial} k={k} min_count={min_count}: "
            f"{got_spans} != {sorted(want_spans)}\n{texts}"
        )
        got_removed = {
            r.doc_id: (r.text, r.removed_tokens, r.orig_tokens)
            for r in remove_duplicate_spans(
                df, k=k, min_count=min_count
            ).collect()
        }
        assert got_removed == want_removed, (
            f"trial {trial} k={k} min_count={min_count}\n{texts}"
        )


def _ref_spans_against(batch: dict[int, str], seen: dict[int, str], k: int):
    """Brute-force incremental reference: batch windows whose exact
    content occurs anywhere in the seen corpus."""
    seen_grams = set()
    for s in seen.values():
        ts = [t for t in re.split(r"\s+", s) if t]
        for i in range(len(ts) - k + 1):
            seen_grams.add(" ".join(ts[i : i + k]))
    spans = []
    for d, s in sorted(batch.items()):
        ts = [t for t in re.split(r"\s+", s) if t]
        marked = [False] * len(ts)
        for i in range(len(ts) - k + 1):
            if " ".join(ts[i : i + k]) in seen_grams:
                for j in range(i, i + k):
                    marked[j] = True
        i = 0
        while i < len(ts):
            if marked[i]:
                j = i
                while j + 1 < len(ts) and marked[j + 1]:
                    j += 1
                spans.append((d, i + 1, j + 1, j - i + 1))
                i = j + 1
            else:
                i += 1
    return spans


def test_span_against_fuzz_vs_bruteforce(spark):
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        span_index,
    )

    rng = random.Random(20260817)
    for trial in range(fuzz_budget(5, 2)):
        k = rng.choice([2, 3, 4])
        seen = _rand_corpus(rng, n_docs=rng.randint(2, 8), vocab=4)
        batch = _rand_corpus(rng, n_docs=rng.randint(2, 8), vocab=4)
        sdf = spark.createDataFrame(list(seen.items()), ["doc_id", "text"])
        bdf = spark.createDataFrame(list(batch.items()), ["doc_id", "text"])
        idx = span_index(sdf, k=k)
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in duplicate_spans_against(bdf, idx, k=k).collect()
        )
        want = sorted(_ref_spans_against(batch, seen, k))
        assert got == want, (
            f"trial {trial} k={k}: {got} != {want}\n{seen}\n{batch}"
        )


def test_tokens_col_fuzz_matches_text_mode(spark):
    # the same corpus presented as text vs pre-split token arrays
    # must yield identical spans — tokens_col is a representation
    # change, not a semantics change
    from semantic_olap_spark.functions.dedup import duplicate_spans

    rng = random.Random(20260818)
    for trial in range(fuzz_budget(4, 2)):
        k = rng.choice([2, 3, 5])
        texts = _rand_corpus(rng, n_docs=rng.randint(3, 10), vocab=5)
        tdf = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        adf = spark.createDataFrame(
            [(d, [t for t in s.split() if t]) for d, s in texts.items()],
            ["doc_id", "toks"],
        )
        a = sorted(map(tuple, duplicate_spans(tdf, k=k).collect()))
        b = sorted(
            map(tuple, duplicate_spans(adf, k=k, tokens_col="toks").collect())
        )
        assert a == b, f"trial {trial} k={k}"


def _ref_stream(batches: list[dict[int, str]], k: int):
    """Brute-force reference for the streaming fold: a window of doc
    in batch i is duplicated iff its k-gram occurred ANYWHERE in a
    batch j < i; marked runs merge exactly like the island rule."""
    seen: set[str] = set()
    removed = {}
    for batch in batches:
        toks = {
            d: [t for t in re.split(r"\s+", s) if t]
            for d, s in batch.items()
        }
        for d, ts in sorted(toks.items()):
            marked = [False] * len(ts)
            for i in range(len(ts) - k + 1):
                if " ".join(ts[i : i + k]) in seen:
                    for j in range(i, i + k):
                        marked[j] = True
            removed[d] = (
                " ".join(t for t, m in zip(ts, marked) if not m),
                sum(marked),
                len(ts),
            )
        # fold this batch's grams in AFTER cleaning it
        for ts in toks.values():
            for i in range(len(ts) - k + 1):
                seen.add(" ".join(ts[i : i + k]))
    return removed


def test_streaming_fold_fuzz_vs_bruteforce(spark, tmp_path):
    """fold_span_batch applied epoch-by-epoch must equal the
    brute-force seen-before reference on random small-vocab corpora
    split into random batches — the cross-epoch analogue of the
    corpus-wide fuzz above."""
    from semantic_olap_spark.streaming.spans import (
        fold_span_batch,
        read_clean_output,
    )

    rng = random.Random(20260817)
    for trial in range(fuzz_budget(4, 2)):
        k = rng.choice([2, 3, 4])
        texts = _rand_corpus(
            rng, n_docs=rng.randint(4, 12), vocab=rng.choice([3, 5])
        )
        n_batches = rng.randint(2, 4)
        batches: list[dict[int, str]] = [{} for _ in range(n_batches)]
        for d, s in texts.items():
            batches[rng.randrange(n_batches)][d] = s
        batches = [b for b in batches if b]
        want = _ref_stream(batches, k)

        idx = str(tmp_path / f"idx{trial}")
        out = str(tmp_path / f"out{trial}")
        for epoch, b in enumerate(batches):
            df = spark.createDataFrame(
                list(b.items()), ["doc_id", "text"]
            )
            fold_span_batch(df, epoch, idx, out, k=k)
        got = {
            r["doc_id"]: (r["text"], r["removed_tokens"], r["orig_tokens"])
            for r in read_clean_output(spark, out).collect()
        }
        assert got == want, f"trial {trial} k={k} batches={batches}"
