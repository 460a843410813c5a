"""Chunking, hybrid-retrieval fusion, and curation-quota operators.

Properties asserted: chunk windows cover every token exactly with the
declared stride/clamping (vs a Python reference), RRF fusion equals
the textbook formula and is insensitive to input-list order,
normalization is idempotent, and per-group caps keep exactly the
best-k rows.  Each op also has a DuckDB oracle match at smoke scale —
the same shape the driver contract checks at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.cleaning import (
    cap_per_group,
    normalize_text,
)
from semantic_olap_spark.functions.packing import chunk_documents
from semantic_olap_spark.functions.retrieval import rrf_fuse
from tests.conftest import assert_matches


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


# ---------------------------------------------------------------- chunking

def _py_chunks(text: str, size: int, overlap: int) -> list[str]:
    toks = text.strip().split()
    if not toks:
        return []
    stride = size - overlap
    n = len(toks)
    if n <= size:
        c = 1
    else:
        c = (n - size + stride - 1) // stride + 1
    return [" ".join(toks[i * stride : i * stride + size]) for i in range(c)]


@pytest.mark.parametrize(
    ("size", "overlap"), [(8, 0), (8, 2), (5, 4), (1, 0)]
)
def test_chunk_documents_matches_python_reference(spark, size, overlap):
    rows = [
        (0, " ".join(f"t{i}" for i in range(13))),
        (1, "single"),
        (2, " ".join(f"w{i}" for i in range(size))),  # exactly one window
        (3, ""),  # blank: no chunks
        (4, None),  # NULL: no chunks
        (5, "  a   b\tc \n d  "),  # ragged whitespace
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_chunk_tokens"])
        for r in chunk_documents(df, size, overlap).collect()
    }
    want = {}
    for doc_id, text in rows:
        if text is None:
            continue
        for ci, ch in enumerate(_py_chunks(text, size, overlap)):
            want[(doc_id, ci)] = (ch, len(ch.split()))
    assert got == want


def test_chunk_documents_tokens_covered_and_strided(docs):
    size, overlap = 32, 8
    out = chunk_documents(docs, size, overlap)
    agg = (
        out.groupBy("doc_id")
        .agg(
            F.count("*").alias("c"),
            F.sum("n_chunk_tokens").alias("tok_sum"),
            F.max("chunk_id").alias("last"),
        )
        .collect()
    )
    from semantic_olap_spark.functions.text import token_count

    n_by_id = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    stride = size - overlap
    for r in agg:
        n = n_by_id[r["doc_id"]]
        c = 1 if n <= size else -(-(n - size) // stride) + 1
        assert r["c"] == c and r["last"] == c - 1
        # windows overlap by exactly `overlap` except the clamped last
        full = sum(min(size, n - i * stride) for i in range(c))
        assert r["tok_sum"] == full


def test_chunk_documents_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, 4)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, -1)


def test_chunk_documents_oracle(docs, duck):
    size, overlap, stride = 32, 8, 24
    out = chunk_documents(docs, size, overlap).select(
        "doc_id", "chunk_id", "chunk", "n_chunk_tokens"
    )
    assert_matches(
        out,
        duck,
        f"""
        WITH t AS (
          SELECT doc_id,
                 str_split_regex(trim(text), '\\s+') AS toks,
                 len(str_split_regex(trim(text), '\\s+')) AS n
          FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), c AS (
          SELECT doc_id, toks, n,
                 CASE WHEN n <= {size} THEN 1
                      ELSE (n - {size} + {stride} - 1) // {stride} + 1
                 END AS nc
          FROM t
        )
        SELECT doc_id,
               i - 1 AS chunk_id,
               array_to_string(
                 toks[(i - 1) * {stride} + 1 :
                      (i - 1) * {stride} + {size}], ' ') AS chunk,
               least({size}, n - (i - 1) * {stride})::INT
                   AS n_chunk_tokens
        FROM c, unnest(generate_series(1, nc)) AS g(i)
        """,
    )


def test_chunk_plan_has_no_shuffle(docs):
    plan = chunk_documents(docs, 32, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- RRF

def test_rrf_fuse_textbook_formula(spark):
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], ["doc_id", "s"]
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.7)], ["doc_id", "s"]
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()
    }
    want = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 62,
    }
    assert set(got) == set(want)
    for d, v in want.items():
        assert got[d] == pytest.approx(v, abs=1e-6)


def test_rrf_fuse_input_order_invariant_and_k(spark):
    a = spark.createDataFrame([(i, float(10 - i)) for i in range(8)], ["doc_id", "s"])
    b = spark.createDataFrame([(i, float(i)) for i in range(4, 12)], ["doc_id", "s"])
    ab = rrf_fuse([a, b], k=5).collect()
    ba = rrf_fuse([b, a], k=5).collect()
    assert [tuple(r) for r in ab] == [tuple(r) for r in ba]
    assert len(ab) == 5


def test_rrf_fuse_validates(spark):
    a = spark.createDataFrame([(1, 1.0)], ["doc_id", "s"])
    with pytest.raises(ValueError):
        rrf_fuse([a])
    bad = spark.createDataFrame([(1, 1.0, 2.0)], ["doc_id", "s", "t"])
    with pytest.raises(ValueError):
        rrf_fuse([a, bad])


# ---------------------------------------------------------------- normalize

def test_normalize_text_canonicalizes_and_is_idempotent(spark):
    rows = [
        (0, "  Hello\t\tWORLD \n\n x  "),
        (1, "a\x00b\x1fc\u200bd"),
        (5, "x\u0085y\u009bz"),  # C1 controls (NEL, CSI)
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = normalize_text(df)
    got = {r["doc_id"]: r["text"] for r in once.collect()}
    assert got == {0: "hello world x", 1: "abcd", 2: "", 3: None,
                   5: "xyz"}
    twice = {
        r["doc_id"]: r["text"] for r in normalize_text(once).collect()
    }
    assert twice == got


def test_normalize_text_oracle(docs, duck):
    out = normalize_text(docs, out_col="norm").select("doc_id", "norm")
    assert_matches(
        out,
        duck,
        r"""
        SELECT doc_id,
               lower(trim(regexp_replace(
                 regexp_replace(text,
                   '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F'
                   || '\x{0080}-\x{009F}'
                   || '\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
                 '[\s\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+', ' ', 'g'))) AS norm
        FROM documents
        """,
    )


# ---------------------------------------------------------------- caps

def test_cap_per_group_keeps_best_k(docs):
    out = cap_per_group(docs, "source", 5, order_col="n_chars")
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # kept rows are exactly the top-5 by (n_chars desc, doc_id asc)
    kept = {
        (r["source"], r["doc_id"]) for r in out.select("source", "doc_id").collect()
    }
    rows = docs.select("source", "doc_id", "n_chars").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    want = set()
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (-r["n_chars"], r["doc_id"]))
        want |= {(src, r["doc_id"]) for r in rs[:5]}
    assert kept == want


def test_cap_per_group_oracle(docs, duck):
    out = cap_per_group(docs, "source", 3, order_col="n_chars").select(
        "doc_id", "source", "n_chars"
    )
    assert_matches(
        out,
        duck,
        """
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM documents
        ) WHERE rn <= 3
        """,
    )
