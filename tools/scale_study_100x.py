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

r12 additions (VERDICT r11 ask #5 — make the extrapolation
two-sided on three more plan families):

- ``pagerank_suppliers``     — ITERATIVE: 3 fixed-point iterations,
                               one fact-sized join per iteration
- ``embedding_dedup_lsh``    — LSH-bucketed cosine pairs + keep-best;
                               the replica-scaled corpus copies each
                               embedding VERBATIM (vec_id shifts,
                               vector doesn't), so every base vector
                               becomes an identical clique of size
                               ``factor`` inside one bucket — pair
                               output grows ∝ n·factor² by DATA
                               construction (C(100,2)=4950 self-pairs
                               per base vec at 100×), the strongest
                               output-bound row in the study; judged
                               per candidate pair.  Also exercises
                               the matmul broadcast guard: 200k×64
                               f64 ≈ 98 MiB, inside the 256 MiB cap.
- ``bm25_topk``              — stats-pass + scoring two-pass, fixed
                               k=10 output

``training_pipeline`` additionally gets a PER-STAGE split at sf1 and
sf10 (VERDICT r11 ask #6): cumulative-prefix timings of gate →
+exact-dedup → +decontaminate → full pipeline, so the second-decade
growth is attributed to a stage, not guessed.

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
    # r12 additions
    "pagerank_suppliers",
    "embedding_dedup_lsh",
    "bm25_topk",
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

    def _lsh_pair_count(s, d) -> int:
        from semantic_olap_spark.functions.similarity import (
            cosine_pairs,
            lsh_assign,
        )

        return cosine_pairs(
            lsh_assign(
                load_table(s, d, "embeddings"),
                nbits=4, seed=42, bucket_col="_bkt",
            ),
            threshold=0.42, block_col="_bkt",
        ).count()

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
        # candidate pairs ARE the workload: identical-replica cliques
        # make them grow ∝ n·factor² in the scaled data
        "embedding_dedup_lsh": _lsh_pair_count,
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

    # -- training_pipeline per-stage attribution (r12, ask #6) -------
    # cumulative-prefix timings of the registry row's own lazy chain:
    # gate → +exact dedup (& src0 drop) → +decontaminate → full.
    # The per-stage cost is the delta between consecutive prefixes —
    # same plan the timed row executes, just truncated, so the split
    # attributes the row's second-decade growth to a stage.
    from pyspark.sql import functions as F
    from semantic_olap_spark.functions.cleaning import (
        decontaminate,
        heuristic_filter,
    )
    from semantic_olap_spark.functions.dedup import dedup_exact
    from semantic_olap_spark.functions.sampling import train_test_split

    def tp_prefixes(sf_dir: str):
        docs = load_table(spark, sf_dir, "documents")
        bench_set = docs.filter(F.col("source") == "src0")
        gate = heuristic_filter(
            docs, min_tokens=20,
            max_top_token_frac=0.12, max_dup_2gram_frac=0.05,
        )
        kept = dedup_exact(gate).filter(F.col("source") != "src0")
        clean = decontaminate(kept, bench_set, n=4)
        full = train_test_split(
            clean, {"train": 0.9, "test": 0.1}, "doc_id"
        ).select("doc_id", "split")
        return [
            ("gate", gate), ("dedup", kept),
            ("decontaminate", clean), ("full", full),
        ]

    tp_stages: dict[str, dict] = {}
    for label, sf_dir in (("sf0.1", sf01), ("sf1", sf1), ("sf10", sf10)):
        prefixes = tp_prefixes(sf_dir)
        _force(prefixes[-1][1])  # untimed warmup of the whole chain
        cum: dict[str, float] = {}
        for stage, df in prefixes:
            spark.catalog.clearCache()
            t = time.perf_counter()
            _force(df)
            cum[stage] = round(time.perf_counter() - t, 3)
        names = [s for s, _ in prefixes]
        split = {
            names[0]: cum[names[0]], **{
                b: round(max(cum[b] - cum[a], 0.0), 3)
                for a, b in zip(names, names[1:])
            }
        }
        tp_stages[label] = {"cumulative": cum, "stage_delta": split}
        print(f"training_pipeline stages {label}: {json.dumps(tp_stages[label])}",
              flush=True)

    summary = {
        "metric": "scale_study_100x",
        "sf_small": 0.1,
        "sf_big": 10,
        "factor": 100,
        "gen_sec": gen_sec,
        "queries": results,
        "training_pipeline_stages": tp_stages,
        "flagged": flagged,
    }
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
