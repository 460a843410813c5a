"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative subset of the driver-contract queries
(`__spark_entry__.queries()`) spanning every operator family —
deterministic filters/aggs, Arrow-batched semantic ops, logic-tree
staged execution, text profiling, dedup (exact + MinHash LSH), and
similarity search — at the benchmark scale factor (default sf0.1:
600k lineitem / 5k documents / 2k embeddings).

Each query is forced with a noop-sink write (full distributed
compute, no driver-side collect cost).  Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # deterministic core over the 600k-row lineitem / 150k orders
    "num_filter_and",
    "num_reduce_sum_by_flag",
    "count_by_status_distinct",
    "num_topk_desc",
    "keyword_filter_or",
    # semantic ops (Arrow pandas UDFs + stub LLM) over documents
    "sem_filter",
    "sem_map_topic",
    "sem_group_workload",
    "sem_reduce_by_region",
    "filter_pattern",
    # staged logic-tree execution
    "filter_group_tree",
    "plan_cascade",
    # relational breadth: broadcast-join star query + window dedup
    "join_revenue_by_nation",
    "window_top_order_per_cust",
    # streaming (batch-parity forms) over 100k events
    "windowed_agg",
    "session_agg",
    # pipeline: text analysis / dedup / similarity (jaccard before
    # the signature-based queries — their persisted frames otherwise
    # add memory pressure to the biggest pair join)
    "text_profile",
    "dedup_exact",
    "jaccard_pairs",
    "cosine_topk",
    "ivf_topk",
    # assign-once / probe-many ANN: index built in warmup (the
    # amortized cost), probe timed — contrast with ivf_topk above,
    # which re-assigns the corpus per query
    "ivf_probe_indexed",
    "lsh_probe_indexed",
    "minhash_lsh_pairs",
    "simhash_pairs",
]


def _force(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from semantic_olap_spark.session import get_spark

    spark = get_spark("semantic-olap-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warmup: touch every table once (parquet footers, file listing,
    # codegen/JVM JIT, Python worker pool) so timings measure query
    # execution, not first-touch session costs
    from semantic_olap_spark.sources.loaders import load_tables

    tables = load_tables(spark, sf_dir)
    for df in tables.values():
        df.count()
    # warm the Python UDF worker pool (first Arrow UDF pays ~2s of
    # worker spawn regardless of data size)
    from semantic_olap_spark.operators.semantic import sem_filter

    sem_filter(tables["documents"].limit(8), ["text"], "warmup").count()
    # the contract's simhash query runs in exact mode (its oracle
    # compares all pairs); the bench measures the production posture
    # with the default skew cap
    from semantic_olap_spark.functions.dedup import simhash_pairs

    qs = dict(qs)
    qs["simhash_pairs"] = lambda spark_, sf_: simhash_pairs(
        tables["documents"], max_distance=3
    )
    # persisted ANN indexes (warmup = the one-time assign+write cost;
    # the timed rows below measure the repeated-query probe path)
    import tempfile

    from pyspark.sql import functions as F
    from semantic_olap_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
        lsh_assign,
        lsh_topk,
        train_ivf_centroids,
        write_ann_index,
    )

    emb = tables["embeddings"]
    qvec = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )
    idx_dir = tempfile.mkdtemp(prefix="annidx_")
    cent = train_ivf_centroids(emb, n_centroids=8)
    ivf_idx = write_ann_index(ivf_assign(emb, cent), f"{idx_dir}/ivf", "_ivf")
    lsh_idx = write_ann_index(lsh_assign(emb, nbits=4), f"{idx_dir}/lsh", "_bkt")
    qs["ivf_probe_indexed"] = lambda spark_, sf_: ivf_topk(
        emb, qvec, k=10, centroids=cent, nprobe=3, index_df=ivf_idx
    )
    qs["lsh_probe_indexed"] = lambda spark_, sf_: lsh_topk(
        emb, qvec, k=10, nbits=4, index_df=lsh_idx
    )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
