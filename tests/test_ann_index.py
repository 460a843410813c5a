"""Persisted ANN index: assign-once / probe-many for LSH and IVF.

The scale contract (VERDICT r2 item 2): a repeated-query workload
must not re-scan + re-UDF the whole corpus per query.  ``lsh_assign``
/ ``ivf_assign`` materialize the bucket column once;
``write_ann_index`` partitions the corpus by it so each probe is a
partition-pruned scan with no Python UDF in the plan.
"""

from pyspark.sql import functions as F

from semantic_olap_spark.functions.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
    lsh_assign,
    lsh_topk,
    train_ivf_centroids,
    write_ann_index,
)


def _qvec(tables, vec_id=0):
    return (
        tables["embeddings"]
        .filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )


def test_lsh_indexed_matches_unindexed(tables):
    emb = tables["embeddings"]
    q = _qvec(tables)
    base = lsh_topk(emb, q, k=10, nbits=4)
    index = lsh_assign(emb, nbits=4)
    idx = lsh_topk(emb, q, k=10, nbits=4, index_df=index)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, idx.collect()))


def test_lsh_assign_deterministic(tables):
    emb = tables["embeddings"]
    a = {r["vec_id"]: r["_bkt"] for r in lsh_assign(emb, nbits=4).collect()}
    b = {r["vec_id"]: r["_bkt"] for r in lsh_assign(emb, nbits=4).collect()}
    assert a == b
    assert all(0 <= v < 16 for v in a.values())


def test_ivf_indexed_matches_unindexed(tables):
    emb = tables["embeddings"]
    q = _qvec(tables)
    cent = train_ivf_centroids(emb, n_centroids=8)
    base = ivf_topk(emb, q, k=10, centroids=cent, nprobe=3)
    index = ivf_assign(emb, cent)
    idx = ivf_topk(
        emb, q, k=10, centroids=cent, nprobe=3, index_df=index
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, idx.collect()))


def test_ivf_index_without_centroids_rejected(tables):
    emb = tables["embeddings"]
    q = _qvec(tables)
    try:
        ivf_topk(emb, q, index_df=emb)
    except ValueError as e:
        assert "centroids" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_written_index_probe_is_partition_pruned(tables, tmp_path):
    emb = tables["embeddings"]
    q = _qvec(tables)
    index = write_ann_index(
        lsh_assign(emb, nbits=4), str(tmp_path / "lsh_idx"), "_bkt"
    )
    probe = lsh_topk(emb, q, k=10, nbits=4, index_df=index)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the probe prunes parquet partitions on the bucket column...
    assert "PartitionFilters" in plan and "_bkt" in plan.split(
        "PartitionFilters"
    )[1][:200]
    # ...and runs NO Python UDF (the assignment never recomputes)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # and still returns the same rows as the unindexed path
    base = lsh_topk(emb, q, k=10, nbits=4)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, probe.collect())
    )


def test_written_ivf_index_recall_floor(tables, tmp_path):
    emb = tables["embeddings"]
    cent = train_ivf_centroids(emb, n_centroids=8)
    index = write_ann_index(
        ivf_assign(emb, cent), str(tmp_path / "ivf_idx"), "_ivf"
    )
    hits = 0
    for vid in (0, 1, 2):
        q = _qvec(tables, vid)
        exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in ivf_topk(
                emb, q, k=10, centroids=cent, nprobe=3, index_df=index
            ).collect()
        }
        hits += len(exact & approx) / len(exact)
    assert hits / 3 >= 0.5  # same floor as the unindexed pytest contract
