"""7-sample fresh-session adjudication of driver-flagged rows (r14).

VERDICT r13 item 1: cube_shipping (0.58x) and embedding_dedup_lsh
(0.75x) regressed in the driver's r13 bench on byte-identical code.
Protocol (same as the r13 clearing of cdc_upsert_customers /
minhash_lsh_pairs): ONE fresh session on an idle host, 7 samples per
row via the bench's own methodology (clearCache before every attempt,
noop sink), report the sorted band.  A real regression shifts the
whole band; contention widens it.

Usage: python tools/adjudicate_r14.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["cube_shipping", "embedding_dedup_lsh"]
    n = int(os.environ.get("SPARK_GRAFT_ADJ_SAMPLES", "7"))

    from semantic_olap_spark.session import get_spark

    spark = get_spark("adjudicate-r14")
    import __spark_entry__ as entry

    qs = entry.queries()
    # bench-parity warmup: the driver's numbers come from a session
    # ~80 queries deep (JIT/codegen caches hot, Python worker pool
    # spawned); a cold session's first samples measure warmup, not
    # the query.  Warm each row once untimed before its samples.
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"adjudicate warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for k in range(n):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"adjudicate {name} #{k}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "samples_in_order": samples,
            "sorted_samples": sorted(samples),
            "median": sorted(samples)[len(samples) // 2],
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps({"adjudication": out, "sf_dir": sf_dir, "n": n}))
    spark.stop()


if __name__ == "__main__":
    main()
