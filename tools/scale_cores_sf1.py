"""Core-scaling study at sf1 (VERDICT r13 item 4).

The sf0.1 bench cannot see scale behavior: per-query work is so small
that 8-core and 32-core totals coincide (fixed job/stage/Python
overhead dominates).  This one-shot tool times the headline registry
rows at sf1 (the bench's 10x replica dir) in TWO fresh sessions —
local[32] and local[8], same shuffle-partition rule as the bench
(SPARK_GRAFT_CPUS) — and reports the per-row ratio
``t(8 cores) / t(32 cores)``.  A row whose ratio stays ~1 at sf1 has
a real serialization bottleneck; ~4 is perfect scaling.

Usage:
    python tools/scale_cores_sf1.py [sf1_dir] [query ...]
Writes plans/r14/scale_cores_sf1.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# headline rows minus LLM-stub rows (their latency is simulated and
# core-count independent) — the compute-bound spine of the bench
DEFAULT_ROWS = [
    "pricing_summary", "local_supplier_volume", "cube_shipping",
    "join_revenue_by_nation", "large_volume_orders", "market_share",
    "window_top_order_per_cust", "cdc_upsert_customers",
    "filter_group_tree", "text_profile", "bm25_topk", "hash_embed",
    "training_pipeline", "dedup_exact", "minhash_lsh_pairs",
    "embedding_dedup_lsh", "pagerank_suppliers", "anomaly_events",
    "windowed_agg", "quantile_state_orders",
]


def worker(sf_dir: str, names: list[str]) -> None:
    """Child mode: time the rows in THIS session, print one JSON line."""
    from semantic_olap_spark.session import get_spark

    spark = get_spark("scale-cores-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # warmup: spawn the Arrow worker pool + JIT before any timed row
    from semantic_olap_spark.sources.loaders import load_table
    from semantic_olap_spark.operators.semantic import sem_filter

    docs = load_table(spark, sf_dir, "documents")
    sem_filter(docs.limit(8), ["text"], "warmup").count()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sf1-scale {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = sorted(samples)
        print(f"# {name}: {sorted(samples)}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        worker(sys.argv[2], sys.argv[3:])
        return
    sf1_dir = (
        sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else "/tmp/spark_graft_sf1"
    )
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)] or DEFAULT_ROWS
    results = {}
    for cpus in ("32", "8"):
        env = dict(
            os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=sf1_dir
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             sf1_dir, *names],
            env=env, capture_output=True, text=True,
        )
        sys.stderr.write(p.stderr)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    report = {
        "sf1_dir": sf1_dir,
        "method": "fresh session per core count, warmup row, "
                  "median of 3 noop-sink runs, clearCache per attempt",
        "per_query": {
            n: {
                "c32_med": results["32"][n][1],
                "c8_med": results["8"][n][1],
                "ratio_8_over_32": round(
                    results["8"][n][1] / max(results["32"][n][1], 1e-9), 2
                ),
                "c32_band": results["32"][n],
                "c8_band": results["8"][n],
            }
            for n in names
        },
    }
    out_path = os.path.join(REPO, "plans", "r14", "scale_cores_sf1.json")
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({
        n: report["per_query"][n]["ratio_8_over_32"] for n in names
    }, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
