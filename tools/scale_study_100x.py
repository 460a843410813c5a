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
between decades.

Two rows are OUTPUT-bound, and the replica-scaling construction
inflates their output super-linearly in the scale factor (a data
artifact, not an operator property): every base doc's `factor`
replicas differ only in a trailing tag, so they form a near-dup
CLIQUE — LSH candidate pairs grow ∝ docs × factor (measured: 256 →
250,580 → 27,306,157 pairs at sf0.1/1/10) and the duplicated-span
token volume grows 1095× for 100× input (24k → 2.6M → 26.3M dup
tokens).  For those rows the tool also measures the WORKLOAD (pairs
emitted / dup tokens found) and the decisive flag is per-unit cost
rising decade-over-decade; the raw time bound alone would flag the
data construction, not the engine.  Each row's first sf0.1 execution
is an untimed warmup (Python worker spin-up + codegen once cost
13.2s vs 3.7s warmed on the composed pipeline — min-of-2 cold
samples still measured the constant, not the operator).

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

    # output-bound rows: their result volume is a property of the
    # replica-scaled DATA (near-dup cliques of size ~factor), so the
    # near-linear judgment must be per unit of workload
    from semantic_olap_spark.functions.dedup import duplicate_spans as _ds

    workload = {
        "minhash_lsh_pairs": lambda s, d: qs["minhash_lsh_pairs"](
            s, d
        ).count(),
        "remove_dup_spans_docs": lambda s, d: int(
            _ds(load_table(s, d, "documents"), k=20)
            .agg({"span_tokens": "sum"})
            .collect()[0][0]
            or 0
        ),
    }

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
        _force(qs[name](spark, sf01))  # untimed warmup (see docstring)
        small = timed(name, sf01, samples=3)
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
            "raw_bound_breach": r100 > bound,
            "flag": r100 > bound,
        }
        if row["flag"] and second <= 15.0:
            # the r10² heuristic is an UNDERestimate of honest linear
            # scaling whenever decade one amortized fixed overhead
            # (r10 << 10): a row with r10=4 and a perfectly LINEAR
            # second decade (10×) breaches 1.5·r10²=24 at r100=40.
            # The second-decade ratio is the direct near-linearity
            # measurement at the larger scale — judge it with the
            # same 15×-per-10× allowance the sf0.1→sf1 study uses.
            row["flag"] = False
            row["note"] = (
                "raw bound breached only because decade one amortized "
                "fixed overhead (ratio_10x well under 10); the second "
                "decade is within the 15x-per-10x allowance"
            )
        if name in workload and row["flag"]:
            # raw bound breached on an output-bound row: re-judge per
            # unit of workload (untimed counts — the timed numbers
            # above are already captured)
            w1 = workload[name](spark, sf1)
            w10 = workload[name](spark, sf10)
            u1 = mid / w1 if w1 else None
            u10 = big / w10 if w10 else None
            row["workload_sf1"] = w1
            row["workload_sf10"] = w10
            row["unit_cost_sf1"] = round(u1, 9) if u1 else None
            row["unit_cost_sf10"] = round(u10, 9) if u10 else None
            row["flag"] = bool(u1 and u10 and u10 > 1.5 * u1)
            row["note"] = row.get("note", "") + (
                "output-bound: replica-scaled corpus forms near-dup "
                "cliques of size ~factor, so workload grows super-"
                "linearly in the DATA construction; flag judged on "
                "per-workload-unit cost"
            )
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
