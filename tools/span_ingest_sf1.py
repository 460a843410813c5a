"""One-shot sf1 pricing of the streaming span-dedup ingest.

VERDICT r12 ask #4: the bucketed index overhead was priced only at
sf0.1 (4-epoch ingest, 18.8s).  This runs the same protocol at sf1
(10×: ~50k docs) and then prices the regime the bucket layout exists
for — a TRICKLE batch probing a corpus-sized compacted index — with
the fold's own stats (probe_bytes / index_bytes / pruned_dirs).

Output: one JSON line (consumed into SCALE.md).

Usage:  python tools/span_ingest_sf1.py [sf_dir] [n_buckets]
        (default /tmp/spark_graft_sf1, 1024 — the sizing rule for
        trickle batches of ~100 docs ≈ 5k grams at 20% target read
        amplification is N ≳ 5k/0.2·prune ≈ 1k-4k; 1024 matches the
        r12 sizing-rule measurement.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from semantic_olap_spark.session import get_spark
    from semantic_olap_spark.sources.loaders import load_tables
    from semantic_olap_spark.streaming.spans import (
        compact_span_index,
        fold_span_batch,
        maintain_span_dedup,
        read_clean_output,
        replace_index_with_compacted,
    )

    spark = get_spark("span-ingest-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    base = tempfile.mkdtemp(prefix="span_sf1_")
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs,
                 "n_buckets": n_buckets}
    try:
        # -- 4-wave bulk ingest (same shape as the sf0.1 study) ----
        src = os.path.join(base, "src")
        os.makedirs(src)
        for i in range(4):
            staging = os.path.join(base, f"stage_{i}")
            docs.filter(f"doc_id % 4 = {i}").coalesce(1).write.mode(
                "overwrite"
            ).parquet(staging)
            part = next(
                f for f in os.listdir(staging) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"b{i}.parquet")
            shutil.copyfile(os.path.join(staging, part), dst)
            os.utime(dst, (1_000 * (i + 1), 1_000 * (i + 1)))

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        idx = os.path.join(base, "idx")
        outp = os.path.join(base, "out")
        ck = os.path.join(base, "ckpt")
        t0 = time.perf_counter()
        q = maintain_span_dedup(
            stream, idx, outp, ck, k=20, fingerprint="xxhash64",
            n_buckets=n_buckets, trigger_once=True,
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError("sf1 ingest did not drain in 1800s")
        out["ingest_4epoch_sec"] = round(time.perf_counter() - t0, 2)

        cleaned = read_clean_output(spark, outp)
        agg = cleaned.selectExpr(
            "count(*) c", "sum(removed_tokens) rm", "sum(orig_tokens) ot"
        ).collect()[0]
        out["docs_out"] = agg["c"]
        out["removed_tokens"] = int(agg["rm"] or 0)
        out["orig_tokens"] = int(agg["ot"] or 0)

        # -- compact (offline maintenance cost at this scale) ------
        comp = os.path.join(base, "compacted")
        t0 = time.perf_counter()
        compact_span_index(spark, idx, comp, n_buckets=n_buckets)
        replace_index_with_compacted(idx, comp, checkpoint=ck)
        out["compact_sec"] = round(time.perf_counter() - t0, 2)

        # -- trickle regime: a ~100-doc late batch vs the full index
        trickle = docs.filter("doc_id % 499 = 0").limit(128)
        stats: dict = {}
        t0 = time.perf_counter()
        fold_span_batch(
            trickle, 4, idx, outp, k=20, fingerprint="xxhash64",
            n_buckets=n_buckets, stats=stats,
        )
        out["trickle_fold_sec"] = round(time.perf_counter() - t0, 2)
        out["trickle_docs"] = trickle.count()
        out["trickle_buckets_probed"] = len(stats["buckets_probed"])
        out["trickle_probe_paths"] = len(stats["probe_paths"])
        out["probe_bytes"] = stats["probe_bytes"]
        out["index_bytes"] = stats["index_bytes"]
        out["probe_fraction"] = round(
            stats["probe_bytes"] / max(stats["index_bytes"], 1), 4
        )
        out["pruned_dirs"] = stats["pruned_dirs"]

        # -- control: same trickle against the index WITHOUT pruning
        # (force the full scan by probing at a mismatched N view is
        # lossy to compare; instead read the whole index size — the
        # flat layout's unavoidable per-batch read)
        out["full_scan_bytes"] = stats["index_bytes"]
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
