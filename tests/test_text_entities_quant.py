"""M7 text analysis (sentiment, pattern NER), doc assembly, int8 quant.

Properties: sentiment equals the hand-computed lexicon ratio and is 0
on blank text; entity extraction returns exactly the spans the regex
family defines (mentions kept, order-insensitive); assemble_docs is
the inverse of chunking a concatenation; quantization is bit-exact
vs the floor(+0.5) definition, bounded to ±127, and reconstruction
error is within scale/2 per element.  DuckDB oracle matches at smoke
scale mirror the driver's contract shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.packing import assemble_docs, chunk_documents
from semantic_olap_spark.functions.similarity import (
    dequantize_embeddings,
    quantize_embeddings,
)
from semantic_olap_spark.functions.text import (
    ENTITY_PATTERNS,
    SENTIMENT_NEG,
    SENTIMENT_POS,
    extract_entities,
    sentiment_score,
)
from tests.conftest import assert_matches


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"]


# ---------------------------------------------------------------- sentiment

def test_sentiment_score_hand_values(spark):
    rows = [
        (0, "good good bad x"),        # (2-1)/4
        (1, "GREAT and Fast"),         # lowercased: (2-0)/3
        (2, "error crash leak"),       # (0-3)/3 = -1
        (3, ""),                       # blank -> 0
        (4, "neutral words only here"),
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", sentiment_score(F.col("text")).alias("s")
        ).collect()
    }
    assert got == {0: 0.25, 1: round(2 / 3, 6), 2: -1.0, 3: 0.0, 4: 0.0}


def test_sentiment_oracle(docs, duck):
    out = docs.select(
        "doc_id", sentiment_score(F.col("text")).alias("sentiment")
    )
    pos = ", ".join(f"'{w}'" for w in SENTIMENT_POS)
    neg = ", ".join(f"'{w}'" for w in SENTIMENT_NEG)
    assert_matches(
        out,
        duck,
        rf"""
        SELECT doc_id,
               round(CASE WHEN trim(coalesce(text, '')) = '' THEN 0.0 ELSE
                 (len(list_filter(str_split_regex(lower(trim(text)), '\s+'),
                      t -> t IN ({pos})))
                  - len(list_filter(str_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ({neg}))))::DOUBLE
                 / len(str_split_regex(trim(text), '\s+'))
               END, 6) AS sentiment
        FROM documents
        """,
    )


# ---------------------------------------------------------------- NER

def test_extract_entities_hand_values(spark):
    df = spark.createDataFrame(
        [
            (0, "Meeting on 2024-01-15 with Alice Smith costs $12.50"),
            (1, "see https://example.com/x and Bob Jones Again"),
            (2, "no entities here"),
            (3, "$5 $5"),  # duplicate mentions kept
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r["doc_id"], r["entity_type"], r["entity"])
        for r in extract_entities(df).collect()
    )
    assert got == sorted(
        [
            (0, "date", "2024-01-15"),
            (0, "proper", "Alice Smith"),
            (0, "money", "$12.50"),
            (1, "url", "https://example.com/x"),
            (1, "proper", "Bob Jones Again"),
            (3, "money", "$5"),
            (3, "money", "$5"),
        ]
    )


def test_extract_entities_type_filter_and_validation(spark):
    df = spark.createDataFrame([(0, "$5 on 2024-01-15")], ["doc_id", "text"])
    only_money = extract_entities(df, types=("money",)).collect()
    assert [(r["entity_type"], r["entity"]) for r in only_money] == [
        ("money", "$5")
    ]
    with pytest.raises(ValueError):
        extract_entities(df, types=("nonsense",))


def test_extract_entities_no_shuffle(docs):
    plan = (
        extract_entities(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------- assembly

def test_assemble_docs_roundtrips_chunks(spark):
    text = " ".join(f"tok{i}" for i in range(100))
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    chunks = chunk_documents(df, size=16, overlap=0).select(
        F.lit(7).alias("parent"),
        F.col("chunk_id"),
        F.col("chunk"),
    )
    back = assemble_docs(
        chunks, "parent", order_col="chunk_id", text_col="chunk", sep=" "
    ).collect()[0]
    assert back["text"] == text
    assert back["n_fragments"] == 7  # ceil(100/16)


def test_assemble_docs_orders_within_group(spark):
    df = spark.createDataFrame(
        [("a", 2, "C"), ("a", 0, "A"), ("a", 1, "B"), ("b", 0, "X")],
        ["src", "ord", "text"],
    )
    got = {
        r["src"]: (r["text"], r["n_fragments"])
        for r in assemble_docs(df, "src", order_col="ord", sep="|").collect()
    }
    assert got == {"a": ("A|B|C", 3), "b": ("X", 1)}


def test_assemble_docs_oracle(docs, duck):
    out = assemble_docs(docs, "source", sep="\n\n")
    assert_matches(
        out,
        duck,
        """
        SELECT source,
               string_agg(text, e'\\n\\n' ORDER BY doc_id) AS text,
               count(*)::INT AS n_fragments
        FROM documents GROUP BY source
        """,
    )


# ---------------------------------------------------------------- quant

def test_quantize_bounds_and_reconstruction(emb):
    q = quantize_embeddings(emb)
    flat = q.select(
        "vec_id", "qscale", F.explode("qvec").alias("qi")
    )
    mn, mx = flat.agg(F.min("qi"), F.max("qi")).collect()[0]
    assert -127 <= mn and mx <= 127
    # at least one element per vector hits ±127 (max-abs scaling)
    hits = (
        flat.filter(F.abs(F.col("qi")) == 127)
        .select("vec_id").distinct().count()
    )
    assert hits == emb.count()
    # reconstruction error ≤ scale/2 + ulp per element
    rec = dequantize_embeddings(q, out_col="recon")
    err = rec.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.col("recon"),
                    lambda a, b: F.abs(a - b) / F.col("qscale"),
                ),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            )
        )
    ).collect()[0][0]
    assert err <= 0.5 + 1e-9


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        ["vec_id", "embedding"],
    )
    got = {
        r["vec_id"]: (r["qscale"], r["qvec"])
        for r in quantize_embeddings(df).collect()
    }
    assert got[0] == (0.0, [0, 0, 0])
    s = 2.0 / 127.0
    import math
    want = [math.floor(1.0 / s + 0.5), math.floor(-2.0 / s + 0.5),
            math.floor(0.5 / s + 0.5)]
    assert got[1][1] == want


def test_quantize_oracle(emb, duck):
    # flattened to scalar rows: the pandas-side compare cannot sort
    # array cells
    out = quantize_embeddings(emb).select(
        "vec_id", "qscale", F.posexplode("qvec").alias("pos", "qi")
    )
    assert_matches(
        out,
        duck,
        """
        WITH x AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 list_max(list_transform(embedding::DOUBLE[],
                                         v -> abs(v))) / 127.0 AS qscale
          FROM embeddings
        ), q AS (
          SELECT vec_id, qscale,
                 CASE WHEN qscale > 0 THEN
                   list_transform(e, v -> greatest(-127, least(127,
                     floor(v / qscale + 0.5)::INT)))
                 ELSE list_transform(e, v -> 0) END AS qvec
          FROM x
        )
        SELECT vec_id, qscale, g.i - 1 AS pos, qvec[g.i] AS qi
        FROM q, unnest(generate_series(1, len(qvec))) AS g(i)
        """,
    )


# ---------------------------------------------------------------- 2-tier ANN

def test_quantized_topk_matches_exact_topk(emb, spark):
    from semantic_olap_spark.functions.similarity import (
        cosine_topk,
        quantized_topk,
    )

    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    two_tier = [r["vec_id"] for r in quantized_topk(emb, q, k=10).collect()]
    # int8 on unit vectors: relative error ~1/254, rerank=4 margin —
    # demand high recall, and identical top-1
    overlap = len(set(exact) & set(two_tier))
    assert overlap >= 9, (exact, two_tier)
    assert exact[0] == two_tier[0]


def test_quantized_topk_validates(emb):
    from semantic_olap_spark.functions.similarity import quantized_topk

    with pytest.raises(ValueError):
        quantized_topk(emb, [1.0, 0.0], k=0)
    with pytest.raises(ValueError):
        quantized_topk(emb, [1.0, 0.0], k=5, rerank=0)


# ------------------------------------------------------- incremental dedup

def test_dedup_against_embeddings_drops_near_corpus_rows(spark):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    # corpus: 3 orthogonal-ish vectors; batch: one near-dup of seen#0
    # (same direction scaled), one genuinely new direction
    seen = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    batch = spark.createDataFrame(
        [(10, [2.0, 0.01, 0.0, 0.0]),   # cosine ~1 vs seen 0 -> dropped
         (11, [0.0, 0.0, 0.0, 5.0])],   # orthogonal to all -> kept
        ["vec_id", "embedding"],
    )
    out = dedup_against_embeddings(
        batch, seen, threshold=0.9, nbits=4, multiprobe=2
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [11]


def test_dedup_against_embeddings_strategy_equivalence(tables):
    # matmul (broadcast-seen numpy scoring, r7) ≡ expr (bucket
    # equi-join + Catalyst dots); auto must pick one of them, with
    # identical survivors either way
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = tables["embeddings"]
    seen = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    outs = {
        s: sorted(
            r["vec_id"]
            for r in dedup_against_embeddings(
                batch, seen, threshold=0.3, nbits=4, multiprobe=1,
                strategy=s,
            ).collect()
        )
        for s in ("expr", "matmul", "auto")
    }
    assert outs["expr"] == outs["matmul"] == outs["auto"]
    # the threshold actually bites: some batch rows were dropped
    assert 0 < len(outs["expr"]) < batch.count()


def test_dedup_against_embeddings_auto_falls_back_to_expr(tables):
    # auto with a zero broadcast budget must route to the bucket
    # equi-join (never raise) and still produce identical survivors —
    # the over-budget corpus case at scale
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = tables["embeddings"]
    seen = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    kw = {"threshold": 0.3, "nbits": 4, "multiprobe": 1}
    fallback = sorted(
        r["vec_id"]
        for r in dedup_against_embeddings(
            batch, seen, strategy="auto", max_broadcast_mb=0, **kw
        ).collect()
    )
    expr = sorted(
        r["vec_id"]
        for r in dedup_against_embeddings(
            batch, seen, strategy="expr", **kw
        ).collect()
    )
    assert fallback == expr and 0 < len(expr) < batch.count()


def test_dedup_against_embeddings_multiprobe_recall(tables):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = tables["embeddings"]
    seen = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    survivors = {
        mp: dedup_against_embeddings(
            batch, seen, threshold=0.42, nbits=4, multiprobe=mp
        ).count()
        for mp in (0, 1, 4)
    }
    # more probes -> more candidates found -> fewer survivors;
    # mp = nbits is exhaustive (every bucket probed)
    assert survivors[0] >= survivors[1] >= survivors[4]
    # exhaustive probing equals the brute-force semi-join answer
    from semantic_olap_spark.functions.similarity import cosine_pairs

    both = seen.select("vec_id", "embedding").unionByName(
        batch.select("vec_id", "embedding")
    )
    all_pairs = cosine_pairs(both, threshold=0.42, allow_unblocked=True)
    seen_ids = {r["vec_id"] for r in seen.select("vec_id").collect()}
    dropped = set()
    for r in all_pairs.collect():
        a, b = r["id_a"], r["id_b"]
        if a in seen_ids and b not in seen_ids:
            dropped.add(b)
        if b in seen_ids and a not in seen_ids:
            dropped.add(a)
    want = batch.count() - len(dropped)
    assert survivors[4] == want


def test_dedup_against_embeddings_validates(tables):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = tables["embeddings"]
    with pytest.raises(ValueError):
        dedup_against_embeddings(emb, emb, nbits=4, multiprobe=5)


# ------------------------------------------------------------- hash_embed

def _py_hash_embed(text, dim=8, normalize=True):
    import hashlib
    import math

    v = [0.0] * dim
    toks = text.strip().lower().split()
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        pos = int(h[:8], 16) % dim
        sgn = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
        v[pos] += sgn
    if normalize:
        n = math.sqrt(sum(x * x for x in v))
        if n > 0:
            v = [round(x / n, 6) for x in v]
    return v


def test_hash_embed_matches_python_reference(spark):
    from semantic_olap_spark.functions.text import hash_embed

    rows = [
        (0, "spark join scan spark"),
        (1, "one"),
        (2, ""),          # zero vector
        (3, None),        # zero vector
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["embedding"]
        for r in hash_embed(df, dim=8).collect()
    }
    for doc_id, text in rows:
        want = _py_hash_embed(text or "", dim=8)
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_hash_embed_partition_invariant_and_normalized(docs):
    from semantic_olap_spark.functions.text import hash_embed

    a = {r["doc_id"]: tuple(r["embedding"])
         for r in hash_embed(docs, dim=16).collect()}
    b = {r["doc_id"]: tuple(r["embedding"])
         for r in hash_embed(docs.repartition(13), dim=16).collect()}
    assert a == b
    for vec in a.values():
        n = sum(x * x for x in vec)
        assert n == 0 or abs(n - 1.0) < 1e-4


def test_hash_embed_feeds_embedding_ops(docs):
    # the bridge works: raw text -> vectors -> cosine top-k
    from semantic_olap_spark.functions.similarity import cosine_topk
    from semantic_olap_spark.functions.text import hash_embed

    vecs = hash_embed(docs, dim=32).select("doc_id", "embedding")
    q = vecs.filter(F.col("doc_id") == 0).collect()[0]["embedding"]
    top = cosine_topk(vecs, q, k=5, id_col="doc_id").collect()
    assert top[0]["doc_id"] == 0 and top[0]["cosine"] == 1.0


def test_hash_embed_oracle(docs, duck):
    from semantic_olap_spark.functions.text import hash_embed

    out = hash_embed(docs, dim=16).select(
        "doc_id", F.posexplode("embedding").alias("pos", "v")
    )
    assert_matches(
        out,
        duck,
        r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(str_split_regex(lower(trim(text)), '\s+')) AS t
          FROM documents WHERE trim(coalesce(text, '')) <> ''
        ),
        h AS (
          SELECT doc_id,
                 ('0x' || substr(md5(t), 1, 8))::BIGINT % 16 AS pos,
                 CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0
                      THEN 1.0 ELSE -1.0 END AS sgn
          FROM tok
        ),
        agg AS (
          SELECT doc_id, pos, sum(sgn)::DOUBLE AS v
          FROM h GROUP BY doc_id, pos
        ),
        nrm AS (
          SELECT doc_id, sqrt(sum(v * v)) AS n FROM agg GROUP BY doc_id
        ),
        dense AS (
          SELECT d.doc_id, g.i - 1 AS pos,
                 coalesce(
                   (SELECT CASE WHEN nrm.n > 0
                           THEN round(a.v / nrm.n, 6) ELSE 0.0 END
                    FROM agg a, nrm
                    WHERE a.doc_id = d.doc_id AND nrm.doc_id = d.doc_id
                      AND a.pos = g.i - 1),
                   0.0) AS v
          FROM documents d, unnest(generate_series(1, 16)) AS g(i)
        )
        SELECT doc_id, pos, v FROM dense
        """,
    )


def test_quantized_topk_indexed_matches_inline(emb):
    from semantic_olap_spark.functions.similarity import (
        quantize_index,
        quantized_topk,
    )

    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    inline = [tuple(r) for r in quantized_topk(emb, q, k=10).collect()]
    idx = quantize_index(emb)
    indexed = [
        tuple(r)
        for r in quantized_topk(emb, q, k=10, index_df=idx).collect()
    ]
    assert inline == indexed
    with pytest.raises(ValueError):
        quantized_topk(emb, q, index_df=emb)  # lacks _qv/_qs


def test_review_fix_validations(spark, emb):
    # partial-typo entity types raise instead of silently dropping
    from semantic_olap_spark.functions.similarity import quantized_topk
    from semantic_olap_spark.functions.text import extract_entities

    df = spark.createDataFrame([(0, "$5")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unknown entity types"):
        extract_entities(df, types=("money", "urls"))
    # zero query vector fails fast with a clear message
    with pytest.raises(ValueError, match="positive norm"):
        quantized_topk(emb, [0.0, 0.0, 0.0])
