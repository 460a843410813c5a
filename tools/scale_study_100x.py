"""Second decade of scale: sf0.1 → sf10 (100× data, fixed cores) on
the five heaviest linear-expectation rows.

The per-round bench prices one decade (sf0.1→sf1, 33 rows).  The
100 TB grade extrapolates two-plus decades; this one-shot tool adds
the second on the rows whose plans are the engine's scale spine:

- ``pricing_summary``        — full-fact scan + 8-way agg
- ``training_pipeline``      — gate → span dedup → decontaminate →
                               split as ONE lazy plan
- ``remove_dup_spans_docs``  — corpus-wide fingerprint shuffle +
                               island merge
- ``minhash_lsh_pairs``      — banded signature equi-join
                               (production xxhash64 posture)
- ``late_supplier_blame``    — Q21-shape semi+anti fact self-join

Near-linear contract: each row's 100× ratio must be ≤ 1.5 × (its own
10× ratio)² — if a decade costs r, two decades of a linear plan cost
≈ r², and the 1.5 slack absorbs fixed-overhead amortization shifting
between decades.  Rows breaching it are flagged for root-causing.

Usage:  python tools/scale_study_100x.py [out.json]
Data:   replica-scaled copies built by bench._ensure_scaled_dir into
        SPARK_GRAFT_SF1_DIR (/tmp/spark_graft_sf1) and
        SPARK_GRAFT_SF10_DIR (/tmp/spark_graft_sf10, ~1.7 GB) —
        built in warmup, NEVER inside a timed window (round-4
        lesson).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ROWS = [
    "pricing_summary",
    "training_pipeline",
    "remove_dup_spans_docs",
    "minhash_lsh_pairs",
    "late_supplier_blame",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")

    import __spark_entry__ as entry
    from bench import _ensure_scaled_dir, _force
    from semantic_olap_spark.functions.dedup import (
        minhash_lsh_pairs as _mh,
        remove_duplicate_spans as _rds,
    )
    from semantic_olap_spark.session import get_spark
    from semantic_olap_spark.sources.loaders import load_table

    spark = get_spark("scale-study-100x", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # same production-posture overrides as bench.py's scale study so
    # the ratio compares identical code at every sf
    qs = dict(entry.queries())
    qs["minhash_lsh_pairs"] = lambda s, d: _mh(
        load_table(s, d, "documents"), shingle_n=3, threshold=0.5
    )
    qs["remove_dup_spans_docs"] = lambda s, d: _rds(
        load_table(s, d, "documents"), k=20
    )

    # -- warmup: materialize both scaled dirs BEFORE any timing ------
    t0 = time.perf_counter()
    _ensure_scaled_dir(spark, sf01, sf1, factor=10)
    _ensure_scaled_dir(spark, sf01, sf10, factor=100)
    gen_sec = round(time.perf_counter() - t0, 1)
    print(f"scaled dirs ready in {gen_sec}s", flush=True)

    def timed(name: str, sf_dir: str, samples: int) -> float:
        best = float("inf")
        for _ in range(samples):
            spark.catalog.clearCache()
            t = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t)
        return round(best, 3)

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in ROWS:
        small = timed(name, sf01, samples=2)
        mid = timed(name, sf1, samples=1)
        big = timed(name, sf10, samples=1)
        r10 = round(mid / small, 2)
        r100 = round(big / small, 2)
        second = round(big / mid, 2)
        bound = round(1.5 * r10 * r10, 2)
        row = {
            "sf0.1_sec": small,
            "sf1_sec": mid,
            "sf10_sec": big,
            "ratio_10x": r10,
            "ratio_100x": r100,
            "second_decade_ratio": second,
            "bound_1p5_r10sq": bound,
            "flag": r100 > bound,
        }
        if row["flag"]:
            flagged.append(name)
        results[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    summary = {
        "metric": "scale_study_100x",
        "sf_small": 0.1,
        "sf_big": 10,
        "factor": 100,
        "gen_sec": gen_sec,
        "queries": results,
        "flagged": flagged,
    }
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
