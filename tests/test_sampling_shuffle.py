"""Deterministic global shuffle (training order)."""

from __future__ import annotations

from tests.conftest import assert_matches

from semantic_olap_spark.functions.sampling import shuffle_rows


def test_shuffle_rows_oracle(tables, duck):
    assert_matches(
        shuffle_rows(tables["documents"], ["doc_id"], seed=42).select(
            "doc_id", "shuffle_rank"
        ),
        duck,
        r"""
        SELECT doc_id,
               (row_number() OVER (
                    ORDER BY md5('42' || chr(31) || doc_id::VARCHAR))
                - 1)::BIGINT AS shuffle_rank
        FROM documents
        """,
    )


def test_shuffle_rows_reproducible_and_seed_sensitive(tables):
    docs = tables["documents"]
    a = shuffle_rows(docs, ["doc_id"], seed=7)
    b = shuffle_rows(docs, ["doc_id"], seed=7)
    c = shuffle_rows(docs, ["doc_id"], seed=8)
    ka = sorted((r.doc_id, r.shuffle_rank) for r in a.collect())
    kb = sorted((r.doc_id, r.shuffle_rank) for r in b.collect())
    kc = sorted((r.doc_id, r.shuffle_rank) for r in c.collect())
    assert ka == kb
    assert ka != kc
    # ranks are a dense 0..n-1 permutation
    n = docs.count()
    assert sorted(r for _, r in ka) == list(range(n))


def test_shuffle_rows_decorrelates_ingest_order(tables):
    # the whole point: rank order must not follow doc_id order
    docs = tables["documents"]
    rows = shuffle_rows(docs, ["doc_id"], seed=42).collect()
    by_rank = [r.doc_id for r in sorted(rows, key=lambda r: r.shuffle_rank)]
    asc = sum(1 for x, y in zip(by_rank, by_rank[1:]) if y > x)
    frac = asc / (len(by_rank) - 1)
    assert 0.3 < frac < 0.7, frac


def test_shuffle_rows_no_unpartitioned_window(tables):
    plan = (
        shuffle_rows(tables["documents"], ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the parallel dense-ranks construction: every Window partitions
    # by the range-partition id — no global (unpartitioned) Window
    import re
    for m in re.finditer(r"Window \[[^\]]*\]", plan):
        assert "partition" in m.group(0) or "_dr_pid" in m.group(0), plan[:2000]
