"""Cross-JVM PERFORMANCE on the heaviest bench rows.

tools/multijvm_replay.py proved cross-JVM *correctness* (167/167
hash-identical on a 2-worker standalone cluster, wheel-shipped).
This tool prices cross-JVM *performance*: the residual risk in the
"within 2× at scale" claim is real broadcast pickling and
shuffle-over-wire, which local[32] (one JVM, in-process shuffle)
never pays.

Method: the 10 most expensive bench rows run on BOTH masters in ONE
process run — local[32] first, then `local-cluster[2,16,4096]` (2
worker JVMs × 16 cores = the same 32 cores) — so the pair shares
machine-load conditions instead of comparing against a
different-day BENCH_LOCAL capture.  Same noop-force / median-of-3
protocol as bench.py, same production-posture overrides (xxhash64
signatures for the minhash/simhash/span rows).  The cluster session
ships the package as the wheel (tools/build_wheel.py), the proven
deployment artifact.

Usage:
    python tools/multijvm_bench.py [row ...]      # default: all 10

Prints per-row lines and ONE final JSON summary with per-row
{local_sec, cluster_sec, ratio}.  Rows with ratio > 2.0 land in
`flagged` for root-causing.  Run from a fresh process.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ROWS = [
    "training_pipeline",
    "minhash_lsh_pairs",
    "remove_dup_spans_docs",
    "embedding_dedup_lsh",
    "simhash_pairs",
    "decontaminate_bench",
    "pagerank_suppliers",
    "join_revenue_by_nation",
    "ivf_topk",
    "bm25_rerank_cascade",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _build_queries(spark, sf_dir: str) -> dict:
    """Registry rows + the same production-posture overrides bench.py
    applies (contract rows run md5 oracle mode; the bench measures
    xxhash64)."""
    import __spark_entry__ as entrymod
    from semantic_olap_spark.functions.dedup import (
        minhash_lsh_pairs,
        remove_duplicate_spans,
        simhash_pairs,
    )
    from semantic_olap_spark.sources.loaders import load_tables

    tables = load_tables(spark, sf_dir)
    for df in tables.values():
        df.count()
    # warm the Python UDF worker pool on THIS master
    from semantic_olap_spark.operators.semantic import sem_filter

    sem_filter(tables["documents"].limit(8), ["text"], "warmup").count()

    qs = dict(entrymod.queries())
    docs = tables["documents"]
    qs["minhash_lsh_pairs"] = lambda sp, sf: minhash_lsh_pairs(
        docs, shingle_n=3, threshold=0.5
    )
    qs["simhash_pairs"] = lambda sp, sf: simhash_pairs(docs, max_distance=3)
    qs["remove_dup_spans_docs"] = lambda sp, sf: remove_duplicate_spans(
        docs, k=20
    )
    return qs


def _run_rows(spark, sf_dir: str, rows: list[str], n: int = 3) -> dict:
    qs = _build_queries(spark, sf_dir)
    out = {}
    for name in rows:
        fn = qs[name]
        samples = []
        for _ in range(n):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            samples.append(time.time() - t0)
        out[name] = round(statistics.median(samples), 3)
        print(f"  {name}: {out[name]}s  {[round(s, 2) for s in samples]}")
    return out


def main() -> None:
    rows = sys.argv[1:] or ROWS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cluster_master = os.environ.get(
        "MULTIJVM_BENCH_MASTER", "local-cluster[2,16,4096]"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from tools.build_wheel import (
        build_spark_shippable,
        scrub_repo_from_pythonpath,
    )

    wheel = build_spark_shippable(os.path.join(repo, "dist"))
    scrub_repo_from_pythonpath(repo)

    from semantic_olap_spark.session import get_spark

    results = {}
    for label, master, conf in [
        ("local", "local[32]", {}),
        (
            "cluster",
            cluster_master,
            {
                "spark.scheduler.minRegisteredResourcesRatio": "1.0",
                "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
            },
        ),
    ]:
        print(f"== {label}: {master}")
        spark = get_spark(
            app_name=f"multijvm-bench-{label}",
            master=master,
            extra_conf={"spark.pyspark.python": sys.executable, **conf},
        )
        spark.sparkContext.setLogLevel("ERROR")
        if label == "cluster":
            spark.sparkContext.addPyFile(wheel)
        n_jvms = len(
            set(
                spark.sparkContext.parallelize(range(64), 64)
                .map(lambda _: __import__("os").getppid())
                .collect()
            )
        )
        results[label + "_jvms"] = n_jvms
        results[label] = _run_rows(spark, sf_dir, rows)
        spark.stop()
        # a stopped standalone cluster needs a beat before a new
        # context binds its ports
        time.sleep(3)

    table = {
        name: {
            "local_sec": results["local"][name],
            "cluster_sec": results["cluster"][name],
            "ratio": round(
                results["cluster"][name] / max(results["local"][name], 1e-9),
                2,
            ),
        }
        for name in rows
    }
    flagged = [n for n, r in table.items() if r["ratio"] > 2.0]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cluster_master": cluster_master,
                "local_jvms": results["local_jvms"],
                "cluster_jvms": results["cluster_jvms"],
                "loadavg": os.getloadavg()[0],
                "rows": table,
                "flagged": flagged,
            }
        )
    )
    sys.exit(0)


if __name__ == "__main__":
    main()
