"""Round-8 review fixes (ADVICE r7), each pinned by a regression test.

1. The matmul strategies (cosine_pairs, dedup_against_embeddings)
   size the driver collect BEFORE performing it — a cheap count×dim
   probe trips the ``max_broadcast_mb`` guard instead of the driver
   first absorbing an unbounded ``toPandas()``.
2. dedup_against_embeddings' auto sizing probes dim over NON-NULL
   vectors with a single aggregate; a null-vector first row no
   longer makes an arbitrarily large seen corpus look like it fits.
3. cosine_pairs(broadcast=False) routes to the expr shuffle-join
   path: matmul inherently collects+broadcasts the right side, so
   honoring an explicit broadcast opt-out means not taking it.
4. jaccard_pairs(strategy="auto") computes its pair estimate as ONE
   server-side scalar aggregate — pick cost no longer scales with
   block-column cardinality, and the pick itself is unchanged.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _emb(spark, n=24, dim=8):
    rows = [
        (i, i % 3, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


# ---- 1. pre-collect size guards ----------------------------------------


def test_cosine_pairs_matmul_guard_trips_before_collect(spark):
    from semantic_olap_spark.functions.similarity import cosine_pairs

    with pytest.raises(ValueError, match="pre-collect"):
        cosine_pairs(
            _emb(spark), threshold=0.5, block_col="label",
            strategy="matmul", max_broadcast_mb=0,
        )


def test_dedup_against_embeddings_matmul_guard_trips_before_collect(spark):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = _emb(spark)
    with pytest.raises(ValueError, match="pre-collect"):
        dedup_against_embeddings(
            emb.filter("vec_id % 2 = 1"), emb.filter("vec_id % 2 = 0"),
            threshold=0.4, nbits=4, strategy="matmul", max_broadcast_mb=0,
        )


# ---- 2. null-safe auto sizing ------------------------------------------


def test_dedup_against_auto_null_vectors_pick_safe(spark):
    """A seen frame with null vectors must not fool the auto sizer.

    With max_broadcast_mb=0 and non-null rows present, fits must be
    False (auto → expr).  If the old ``head(1)`` dim probe hit a
    null row, ``max(dim, 0) = 0`` made the estimate 0 bytes and
    auto picked matmul — whose guard now raises pre-collect, so a
    wrong pick here would surface as ValueError, not silence.
    """
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = _emb(spark)
    seen = spark.createDataFrame(
        [(1000, 0, None)], "vec_id long, label int, embedding array<double>"
    ).unionByName(emb.filter("vec_id % 2 = 0"))
    batch = emb.filter("vec_id % 2 = 1")
    out = dedup_against_embeddings(
        batch, seen, threshold=0.4, nbits=4, strategy="auto",
        max_broadcast_mb=0,
    )
    expected = dedup_against_embeddings(
        batch, emb.filter("vec_id % 2 = 0"), threshold=0.4, nbits=4,
        strategy="expr",
    )
    assert sorted(r["vec_id"] for r in out.collect()) == sorted(
        r["vec_id"] for r in expected.collect()
    )


def test_dedup_against_auto_empty_seen_is_noop(spark):
    from semantic_olap_spark.functions.dedup import dedup_against_embeddings

    emb = _emb(spark)
    out = dedup_against_embeddings(
        emb, emb.filter("vec_id < 0"), threshold=0.4, nbits=4,
        strategy="auto",
    )
    assert out.count() == emb.count()


# ---- 3. broadcast=False honors the opt-out -----------------------------


def test_cosine_pairs_broadcast_false_routes_to_expr(spark):
    """broadcast=False must not collect the corpus to the driver.

    Pin via the guard: with max_broadcast_mb=0 the matmul path
    raises, so completing successfully proves the expr path ran —
    and its output must equal the matmul default's.
    """
    from semantic_olap_spark.functions.similarity import cosine_pairs

    emb = _emb(spark)
    via_flag = cosine_pairs(
        emb, threshold=0.5, block_col="label",
        broadcast=False, max_broadcast_mb=0,
    )
    default = cosine_pairs(emb, threshold=0.5, block_col="label")
    got = sorted(map(tuple, via_flag.collect()))
    want = sorted(map(tuple, default.collect()))
    assert got == want and len(got) > 0


# ---- 4. scalar jaccard auto estimate, pick unchanged --------------------


def test_jaccard_auto_pick_unchanged(spark):
    from semantic_olap_spark.functions.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [
            (i, f"s{i % 4}", f"common tokens here plus doc {i % 5} tail")
            for i in range(40)
        ],
        "doc_id long, source string, text string",
    )
    auto_small = jaccard_pairs(
        docs, threshold=0.6, block_col="source", strategy="auto"
    )
    forced_all = jaccard_pairs(
        docs, threshold=0.6, block_col="source", strategy="allpairs"
    )
    auto_over = jaccard_pairs(
        docs, threshold=0.6, block_col="source", strategy="auto",
        allpairs_budget=0,
    )
    forced_prefix = jaccard_pairs(
        docs, threshold=0.6, block_col="source", strategy="prefix"
    )
    rows = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert rows(auto_small) == rows(forced_all)
    assert rows(auto_over) == rows(forced_prefix)
    assert len(rows(auto_small)) > 0


def test_jaccard_auto_unblocked_estimate(spark):
    from semantic_olap_spark.functions.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "same text every row") for i in range(10)],
        "doc_id long, text string",
    )
    out = jaccard_pairs(
        docs, threshold=0.9, allow_unblocked=True, strategy="auto"
    )
    assert out.count() == 45
