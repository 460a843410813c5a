"""Exact-substring span dedup (ExactSubstr, Lee et al. 2022).

Hand-checked plants + full DuckDB oracle parity for
``duplicate_spans`` / ``remove_duplicate_spans``.  The reference
engine has no span-level dedup (row-level only); this family is
beyond-reference (SURVEY.md §7.1 M7).
"""

from __future__ import annotations

import pytest

from semantic_olap_spark.functions.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)

from tests.conftest import assert_matches


def _spans_sql(k: int, min_count: int = 2) -> str:
    return rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                 AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, u.i AS start,
             md5(array_to_string(toks[u.i : u.i + {k} - 1], ' ')) AS h
      FROM t, unnest(CASE WHEN len(toks) >= {k}
                          THEN range(1, len(toks) - {k} + 2)
                          ELSE range(1, 1) END) AS u(i)
    ),
    dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= {min_count}),
    hit AS (
      SELECT g.doc_id, g.start, g.start + {k} - 1 AS e
      FROM g JOIN dup USING (h)
    ),
    pe AS (
      SELECT doc_id, start, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_end
      FROM hit
    ),
    isl AS (
      SELECT doc_id, start, e,
             sum(CASE WHEN prev_end IS NULL OR start > prev_end + 1
                      THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY start
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS island
      FROM pe
    )
    SELECT doc_id,
           min(start)::BIGINT AS span_start,
           max(e)::BIGINT     AS span_end,
           (max(e) - min(start) + 1)::BIGINT AS span_tokens
    FROM isl GROUP BY doc_id, island
    """


def _remove_sql(k: int, min_count: int = 2) -> str:
    return rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                 AS toks
      FROM documents
    ),
    spans AS (SELECT doc_id, span_start AS s, span_end AS e2
              FROM ({_spans_sql(k, min_count)})),
    tok AS (
      SELECT doc_id, toks[u.i] AS tok, u.i AS pos
      FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok FROM tok tp
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = tp.doc_id
          AND tp.pos BETWEEN s.s AND s.e2)
    ),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
             count(*) AS kept_n
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, coalesce(a.text, '') AS text,
           (len(t.toks) - coalesce(a.kept_n, 0))::BIGINT
               AS removed_tokens,
           len(t.toks)::BIGINT AS orig_tokens
    FROM t LEFT JOIN agg a USING (doc_id)
    """


def test_duplicate_spans_oracle(tables, duck):
    assert_matches(
        duplicate_spans(tables["documents"], k=20).select(
            "doc_id", "span_start", "span_end", "span_tokens"
        ),
        duck,
        _spans_sql(20),
    )


def test_remove_duplicate_spans_oracle(tables, duck):
    assert_matches(
        remove_duplicate_spans(tables["documents"], k=20).select(
            "doc_id", "text", "removed_tokens", "orig_tokens"
        ),
        duck,
        _remove_sql(20),
    )


def test_planted_cross_doc_span(spark):
    # docs 1 and 2 share the 6-token run "a b c d e f"; with k=5 the
    # two overlapping dup windows merge into ONE maximal 6-token span
    # in each doc, at the right offsets.
    df = spark.createDataFrame(
        [
            (1, "x y a b c d e f q r s t u v"),
            (2, "a b c d e f m n o p w z"),
            (3, "entirely unrelated words only here nothing shared"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(df, k=5).collect()
    }
    assert got == {(1, 3, 8, 6), (2, 1, 6, 6)}


def test_planted_within_doc_repetition(spark):
    # one doc repeating the same 5 tokens twice: both occurrences are
    # duplicated (corpus-wide count includes within-doc repeats), and
    # since they are adjacent they merge into one 10-token span.
    df = spark.createDataFrame(
        [(1, "p q r s t p q r s t"), (2, "unrelated filler words here")],
        ["doc_id", "text"],
    )
    spans = duplicate_spans(df, k=5).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [
        (1, 1, 10)
    ]


def test_docs_shorter_than_k_produce_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    # identical docs, but shorter than k → zero windows → no spans
    assert duplicate_spans(df, k=5).count() == 0
    out = remove_duplicate_spans(df, k=5).orderBy("doc_id").collect()
    assert [r.text for r in out] == ["a b c", "a b c"]
    assert [r.removed_tokens for r in out] == [0, 0]


def test_non_adjacent_spans_stay_separate(spark):
    # two shared 5-token runs separated by a unique gap in each doc →
    # two distinct spans per doc, not one.
    df = spark.createDataFrame(
        [
            (1, "a b c d e GAPONE v w x y z"),
            (2, "a b c d e GAPTWO v w x y z"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, k=5).collect()
    )
    assert got == [(1, 1, 5), (1, 7, 11), (2, 1, 5), (2, 7, 11)]


def test_remove_rebuilds_text_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "x y a b c d e f q r"),
            (2, "a b c d e f m n o p"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(df, k=5).collect()
    }
    assert out[1].text == "x y q r"
    assert out[1].removed_tokens == 6 and out[1].orig_tokens == 10
    assert out[2].text == "m n o p"
    assert out[2].removed_tokens == 6 and out[2].orig_tokens == 10


def test_remove_accepts_precomputed_spans(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g")], ["doc_id", "text"]
    )
    spans = duplicate_spans(df, k=5)
    out = remove_duplicate_spans(df, k=5, spans=spans).collect()
    assert all(r.text == "" and r.removed_tokens == 7 for r in out)


def test_min_count_threshold(spark):
    # span shared by two docs survives min_count=2 but not min_count=3
    df = spark.createDataFrame(
        [
            (1, "a b c d e one two"),
            (2, "a b c d e three four"),
        ],
        ["doc_id", "text"],
    )
    assert duplicate_spans(df, k=5, min_count=2).count() == 2
    assert duplicate_spans(df, k=5, min_count=3).count() == 0


def test_invalid_k_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicate_spans(df, k=0)


def test_plans_stay_jvm_side(tables):
    # the whole family is pure Catalyst: no row-at-a-time Python in
    # either plan (the audit_plans.py contract).
    for frame in (
        duplicate_spans(tables["documents"], k=20),
        remove_duplicate_spans(tables["documents"], k=20),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


def test_fingerprint_modes_agree(tables):
    # production xxhash64 array-slice fingerprints vs the md5 oracle
    # mode: identical spans on a real corpus (64-bit collisions are a
    # ~7e-7-at-25T-windows budget, zero here)
    a = duplicate_spans(tables["documents"], k=20, fingerprint="md5")
    b = duplicate_spans(
        tables["documents"], k=20, fingerprint="xxhash64"
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_unknown_fingerprint_rejected(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicate_spans(df, k=2, fingerprint="sha1")


def test_span_index_and_against_planted(spark):
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        remove_spans_against,
        span_index,
    )

    seen = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # tokens 3..7 copy a 5-token corpus run
            (1, "alpha beta quick brown fox jumps over gamma delta"),
            # no corpus overlap, but repeats itself (must NOT match:
            # within-batch dups are duplicate_spans' job)
            (2, "p q r s t p q r s t"),
        ],
        ["doc_id", "text"],
    )
    idx = span_index(seen, k=5)
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans_against(batch, idx, k=5).collect()
    )
    assert got == [(1, 3, 7)]
    out = {
        r.doc_id: r for r in remove_spans_against(batch, idx, k=5).collect()
    }
    assert out[1].text == "alpha beta gamma delta"
    assert out[1].removed_tokens == 5
    assert out[2].text == "p q r s t p q r s t"
    assert out[2].removed_tokens == 0


def test_span_index_mergeable_and_batch_probe_matches_full(tables, spark):
    # folding a batch into the index (union+distinct) then probing a
    # second batch == probing an index built over the union corpus
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        span_index,
    )

    docs = tables["documents"]
    seen = docs.filter("doc_id % 3 = 0")
    mid = docs.filter("doc_id % 3 = 1")
    batch = docs.filter("doc_id % 3 = 2")
    folded = span_index(seen, k=10).union(span_index(mid, k=10)).distinct()
    full = span_index(seen.union(mid), k=10)
    a = sorted(map(tuple, duplicate_spans_against(batch, folded, k=10).collect()))
    b = sorted(map(tuple, duplicate_spans_against(batch, full, k=10).collect()))
    assert a == b
    assert len(a) > 0  # non-vacuous: replicated docs span the splits


def test_span_index_parquet_round_trip(tables, spark, tmp_path):
    # the index is a persistable artifact: write parquet, reload in a
    # fresh frame, probe — identical spans to probing the in-memory
    # index (the minhash_index artifact pattern)
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        span_index,
    )

    docs = tables["documents"]
    seen = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    idx = span_index(seen, k=10)
    path = str(tmp_path / "span_index")
    idx.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = sorted(map(tuple, duplicate_spans_against(batch, idx, k=10).collect()))
    b = sorted(
        map(tuple, duplicate_spans_against(batch, reloaded, k=10).collect())
    )
    assert a == b and len(a) > 0


def test_streaming_ingest_span_strip_foreachbatch(
    spark, tables, sf_dir, tmp_path
):
    # ingest-time span strip on a STREAM: the island merge uses a
    # window function (unsupported in a streaming plan), so the
    # documented wiring is foreachBatch — each micro-batch is a batch
    # frame probed against the static span_index.  Parity contract:
    # availableNow stream == batch remove_spans_against on the same
    # parquet.
    from semantic_olap_spark.functions.dedup import (
        remove_spans_against,
        span_index,
    )
    from semantic_olap_spark.streaming import read_documents_stream

    docs = tables["documents"]
    idx = span_index(docs.filter("doc_id % 2 = 0"), k=10)
    want = sorted(
        (r.doc_id, r.text, r.removed_tokens)
        for r in remove_spans_against(
            docs.filter("doc_id % 2 = 1"), idx, k=10
        ).collect()
    )
    assert any(r[2] > 0 for r in want)  # non-vacuous

    got = []

    def _sink(batch_df, _bid):
        got.extend(
            (r.doc_id, r.text, r.removed_tokens)
            for r in remove_spans_against(
                batch_df.filter("doc_id % 2 = 1"), idx, k=10
            ).collect()
        )

    stream = read_documents_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path / "span_stream_ckpt")
        )
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == want


def test_tokens_col_mode_int_arrays(spark):
    # pre-tokenized int arrays (the BPE-ids shape): detection and
    # removal run over the array column; text_col untouched, the
    # array itself is rewritten
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, [9, 9, 1, 2, 3, 4, 5, 7, 8]),
            (2, [1, 2, 3, 4, 5, 6, 6, 6, 6]),
        ],
        ["doc_id", "ids"],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, k=5, tokens_col="ids").collect()
    )
    assert got == [(1, 3, 7), (2, 1, 5)]
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(
            df, k=5, tokens_col="ids"
        ).collect()
    }
    assert out[1].ids == [9, 9, 7, 8] and out[1].removed_tokens == 5
    assert out[2].ids == [6, 6, 6, 6] and out[2].removed_tokens == 5


def test_tokens_col_md5_mode_matches_xxhash(spark):
    from semantic_olap_spark.functions.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 1, 2, 3, 4]), (2, [5, 1, 2, 3, 4, 9])],
        ["doc_id", "ids"],
    )
    a = sorted(map(tuple, duplicate_spans(
        df, k=4, tokens_col="ids", fingerprint="md5").collect()))
    b = sorted(map(tuple, duplicate_spans(
        df, k=4, tokens_col="ids", fingerprint="xxhash64").collect()))
    assert a == b and len(a) > 0


def test_span_dedup_composes_with_bpe(tables, spark):
    # the composition the tokens_col mode exists for: distributed BPE
    # encode -> span dedup over the BPE id stream; verify against
    # whitespace-mode spans on the same docs (BPE splits words into
    # subwords, so BPE spans must cover at least the whitespace-mode
    # duplicated docs)
    from semantic_olap_spark.functions.bpe import bpe_encode, learn_bpe
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    docs = tables["documents"].limit(200)
    merges = learn_bpe(docs, num_merges=50)
    enc = bpe_encode(docs, merges)
    spans = remove_duplicate_spans(
        enc, k=20, tokens_col="bpe_tokens"
    )
    hit = spans.filter("removed_tokens > 0")
    assert hit.count() > 0
    # surviving arrays really shrank by removed_tokens
    row = hit.first()
    assert len(row.bpe_tokens) == row.orig_tokens - row.removed_tokens


def test_strided_index_guarantee(spark):
    # stride=s: any shared run >= k + s - 1 tokens is still detected
    # (it must contain an indexed window); shorter runs at the worst
    # alignment are missed — both directions pinned at k=4, s=3:
    # guarantee length 6.
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        span_index,
    )

    # corpus positions: run placed so it starts at position 2 (not
    # ≡ 1 mod 3) — the worst alignment for the sampler
    seen = spark.createDataFrame(
        [(100, "z a b c d e f z z z z z")], ["doc_id", "text"]
    )
    idx = span_index(seen, k=4, stride=3)
    # 6-token copy (= k + s - 1): guaranteed detected
    batch6 = spark.createDataFrame(
        [(1, "x x a b c d e f y y")], ["doc_id", "text"]
    )
    got6 = duplicate_spans_against(batch6, idx, k=4).collect()
    assert len(got6) == 1
    # 4-token copy (< k + s - 1) whose only corpus window is
    # unsampled: missed — the documented trade
    batch4 = spark.createDataFrame(
        [(2, "x x a b c d y y y y")], ["doc_id", "text"]
    )
    # corpus window "a b c d" starts at position 2; stride 3 indexes
    # positions 1, 4, 7 — so it is absent from the index
    assert duplicate_spans_against(batch4, idx, k=4).count() == 0
    # stride=1 exact mode catches it
    idx1 = span_index(seen, k=4, stride=1)
    assert duplicate_spans_against(batch4, idx1, k=4).count() == 1


def test_strided_index_size_reduction(tables):
    from semantic_olap_spark.functions.dedup import span_index

    docs = tables["documents"]
    full = span_index(docs, k=10).count()
    s4 = span_index(docs, k=10, stride=4).count()
    # distinct-hash counts: strided must be well under the full index
    # (not exactly /4 because of dedup, but far less than full)
    assert s4 < full * 0.5, (s4, full)


def test_invalid_stride_raises(spark):
    from semantic_olap_spark.functions.dedup import span_index

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        span_index(df, k=2, stride=0)


def test_against_tolerates_duplicate_index_rows(spark):
    # a user-built index with duplicate hashes (e.g. unions without
    # distinct) must not change results: duplicate hit intervals
    # collapse in the island merge — and the probe deliberately does
    # NOT re-distinct (that would shuffle the corpus-sized index per
    # batch)
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        span_index,
    )

    seen = spark.createDataFrame(
        [(100, "a b c d e f g h")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(1, "z a b c d e f z")], ["doc_id", "text"]
    )
    idx = span_index(seen, k=4)
    dup_idx = idx.union(idx).union(idx)
    a = sorted(map(tuple, duplicate_spans_against(batch, idx, k=4).collect()))
    b = sorted(
        map(tuple, duplicate_spans_against(batch, dup_idx, k=4).collect())
    )
    assert a == b and len(a) == 1


def test_max_doc_tokens_guard_raises_with_remedy(spark):
    # one multi-GB doc would serialize its own island-merge task —
    # the planted oversized doc must raise in-plan with the
    # chunk_documents remedy, identifying the offending document
    from semantic_olap_spark.functions.dedup import duplicate_spans

    big = " ".join(f"t{i}" for i in range(300)) + " a b c d"
    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, big)], ["doc_id", "text"]
    )
    with pytest.raises(Exception, match="chunk_documents") as exc:
        duplicate_spans(df, k=4, max_doc_tokens=200).collect()
    assert "document 2" in str(exc.value)
    assert "max_doc_tokens=200" in str(exc.value)


def test_max_doc_tokens_guard_off_and_boundary(spark):
    from semantic_olap_spark.functions.dedup import duplicate_spans

    big = " ".join(f"t{i}" for i in range(300)) + " a b c d e a b c d e"
    df = spark.createDataFrame([(2, big)], ["doc_id", "text"])
    # None disables the guard entirely (the two "a b c d e" runs are
    # adjacent after the island merge -> one maximal span)
    spans = duplicate_spans(df, k=4, max_doc_tokens=None).collect()
    assert len(spans) == 1
    # a doc exactly AT the bound passes (<=, not <)
    n = len(big.split())
    spans = duplicate_spans(df, k=4, max_doc_tokens=n).collect()
    assert len(spans) == 1


def test_max_doc_tokens_guard_on_all_entry_points(spark):
    from semantic_olap_spark.functions.dedup import (
        duplicate_spans_against,
        remove_duplicate_spans,
        remove_spans_against,
        span_index,
    )

    big = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, big)], ["doc_id", "text"])
    ok = spark.createDataFrame([(9, "a b c d e")], ["doc_id", "text"])
    idx = span_index(ok, k=4)
    for call in (
        lambda: span_index(df, k=4, max_doc_tokens=50).collect(),
        lambda: remove_duplicate_spans(df, k=4, max_doc_tokens=50).collect(),
        lambda: duplicate_spans_against(
            df, idx, k=4, max_doc_tokens=50
        ).collect(),
        lambda: remove_spans_against(
            df, idx, k=4, max_doc_tokens=50
        ).collect(),
    ):
        with pytest.raises(Exception, match="chunk_documents"):
            call()


def test_max_doc_tokens_invalid_value(spark):
    from semantic_olap_spark.functions.dedup import duplicate_spans

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_doc_tokens"):
        duplicate_spans(df, k=2, max_doc_tokens=0)


def test_max_doc_tokens_guard_passes_null_rows(spark):
    """Regression for the ANSI size(NULL)=NULL guard bug: null
    text/tokens rows must flow to the documented 0/0 pass-through
    under the DEFAULT guard, while a genuine oversize in the SAME
    frame still raises (and a null id is coalesced in the message,
    not a second null-raise)."""
    from semantic_olap_spark.functions.dedup import (
        remove_duplicate_spans,
        span_index,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, None)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, k=4).collect()}
    assert out[2]["text"] is None
    assert out[2]["orig_tokens"] == 0 and out[2]["removed_tokens"] == 0
    # the index path tolerates nulls under the default guard too
    assert span_index(df, k=4).count() > 0

    big = spark.createDataFrame(
        [(3, " ".join(f"t{i}" for i in range(300)))], ["doc_id", "text"]
    )
    with pytest.raises(Exception, match="chunk_documents"):
        remove_duplicate_spans(
            df.unionByName(big), k=4, max_doc_tokens=100
        ).collect()
    # null id on the oversized row: message coalesces, still raises.
    # Checked via span_index (single gram branch, deterministic):
    # in remove_duplicate_spans the join-back infers
    # isnotnull(doc_id) and prunes the null-id doc from one branch,
    # so under AQE empty-propagation the raise in the other branch
    # races with stage cancellation — benign (the pruned doc never
    # reaches the island merge), but not a deterministic pin.
    big_null_id = spark.createDataFrame(
        [(None, " ".join(f"t{i}" for i in range(300)))],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="<null id>"):
        span_index(big_null_id, k=4, max_doc_tokens=100).collect()
