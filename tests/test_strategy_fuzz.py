"""Randomized (fixed-seed) equivalence fuzz for the r7 size-adaptive
physical strategies.

The targeted equivalence tests cover the bench corpora; this module
stress-samples WIDER input distributions where boundary behavior
could diverge:

- cosine: small-grid integer coordinates (quantized directions make
  near-threshold and exactly-equal cosines far likelier than
  continuous gaussians), zero vectors, duplicate vectors;
- jaccard: short docs, empty docs, high-overlap families (prefix
  length 1 territory), singleton tokens;
- components/pagerank: random multigraphs with self-contained
  cliques, chains, and isolated pairs.

Every assertion is strategy-A == strategy-B on the SAME input — any
divergence (e.g. a rounding-boundary flip between numpy raw scores
and Catalyst decimal rounding) fails loudly here before a driver
round can see it.  Seeds are fixed: failures reproduce.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _key(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def test_cosine_pairs_fuzz_grid_corpus(spark):
    from semantic_olap_spark.functions.similarity import (
        cosine_pairs,
        lsh_assign,
    )

    rng = random.Random(20260815)
    rows = []
    for i in range(300):
        vec = [float(rng.randint(-2, 2)) for _ in range(8)]
        rows.append((i, vec))
    rows.append((300, [0.0] * 8))          # zero vector
    rows.append((301, rows[0][1][:]))      # exact duplicate of id 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for threshold in (0.0, 0.25, 0.5, 0.75, 1.0):
        mm = _key(
            cosine_pairs(
                df, threshold=threshold, allow_unblocked=True,
                strategy="matmul",
            )
        )
        ex = _key(
            cosine_pairs(
                df, threshold=threshold, allow_unblocked=True,
                strategy="expr",
            )
        )
        assert mm == ex, f"threshold={threshold}: {len(mm)} vs {len(ex)}"
    # blocked form on LSH buckets, both strategies
    bk = lsh_assign(df, nbits=3, seed=9, bucket_col="_bkt")
    mm = _key(cosine_pairs(bk, threshold=0.4, block_col="_bkt",
                           strategy="matmul"))
    ex = _key(cosine_pairs(bk, threshold=0.4, block_col="_bkt",
                           strategy="expr"))
    assert mm == ex and len(mm) > 0


def test_jaccard_pairs_fuzz_degenerate_docs(spark):
    from semantic_olap_spark.functions.dedup import jaccard_pairs

    rng = random.Random(77)
    vocab = [f"w{k}" for k in range(25)]
    rows = []
    for i in range(120):
        n = rng.randint(0, 6)
        rows.append((i, "blk%d" % (i % 3), " ".join(rng.choices(vocab, k=n))))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for kw in (
        {"threshold": 0.3, "block_col": "source"},
        {"threshold": 0.5, "allow_unblocked": True},
        {"threshold": 0.5, "block_col": "source", "round_to": 1},
        {"threshold": 1.0, "block_col": "source"},
    ):
        pf = _key(jaccard_pairs(df, strategy="prefix", **kw))
        ap = _key(jaccard_pairs(df, strategy="allpairs", **kw))
        au = _key(jaccard_pairs(df, **kw))
        assert pf == ap == au, kw


def test_components_fuzz_random_multigraph(spark):
    from semantic_olap_spark.functions.dedup import dedup_clusters

    rng = random.Random(4242)
    edges = [
        (rng.randint(0, 60), rng.randint(0, 60)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(100, 101), (101, 100), (100, 101)]  # dup/multi edges
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    drv = _key(dedup_clusters(pairs))
    dist = _key(dedup_clusters(pairs, driver_threshold=0))
    assert drv == dist and len(drv) > 0


def test_pagerank_fuzz_random_graph(spark):
    from semantic_olap_spark.functions.graph import pagerank

    rng = random.Random(1234)
    edges = [
        (rng.randint(0, 40), rng.randint(0, 40)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for iters in (1, 4):
        drv = _key(pagerank(df, iterations=iters))
        dist = _key(pagerank(df, iterations=iters, driver_threshold=0))
        assert drv == dist and len(drv) > 0


def test_dedup_against_embeddings_fuzz(spark):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    rng = random.Random(99)
    mk = lambda n0: [  # noqa: E731
        (i + n0, [float(rng.randint(-2, 2)) for _ in range(8)])
        for i in range(150)
    ]
    seen = spark.createDataFrame(
        mk(0), "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        mk(1000) + [(2000, [0.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    for mp in (0, 2):
        ex = _key(
            dedup_against_embeddings(
                batch, seen, threshold=0.5, nbits=3, multiprobe=mp,
                strategy="expr",
            )
        )
        mm = _key(
            dedup_against_embeddings(
                batch, seen, threshold=0.5, nbits=3, multiprobe=mp,
                strategy="matmul",
            )
        )
        assert ex == mm, f"multiprobe={mp}"


def test_cosine_pairs_exact_decimal_boundary(spark):
    """A cosine that IS an exact representable decimal boundary case.

    Unit vectors along axes give cosines of exactly 0.0, 0.5
    (60-degree pairs via [1,1,0..]/[1,0,1..] style grids), and 1.0 —
    values where `raw >= threshold` and `round(raw) >= threshold`
    can disagree between paths if the slack protocol is wrong.
    """
    from semantic_olap_spark.functions.similarity import cosine_pairs

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # cos(0,1) = 1.0 exactly
        (2, [0.0, 1.0, 0.0]),   # cos(0,2) = 0.0 exactly
        (3, [1.0, 1.0, 0.0]),   # cos(0,3) = 1/sqrt(2)
        (4, [1.0, 1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for threshold in (0.0, 0.5, 0.707107, 1.0):
        mm = _key(cosine_pairs(df, threshold=threshold,
                               allow_unblocked=True, strategy="matmul"))
        ex = _key(cosine_pairs(df, threshold=threshold,
                               allow_unblocked=True, strategy="expr"))
        assert mm == ex, threshold
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs(
            df, threshold=1.0, allow_unblocked=True
        ).collect()
    }
    assert got == {(0, 1): 1.0}


@pytest.mark.parametrize("strategy", ["matmul", "expr"])
def test_cosine_pairs_null_vector_rows_dropped(spark, strategy):
    # null embeddings produce no pairs on either path
    rows = [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = _key(
        __import__(
            "semantic_olap_spark.functions.similarity",
            fromlist=["cosine_pairs"],
        ).cosine_pairs(
            df, threshold=0.5, allow_unblocked=True, strategy=strategy
        )
    )
    assert got == [("0", "2", "1.0")]
