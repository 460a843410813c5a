"""Driver APPLICATION for the literal spark-submit full-registry
replay — the file a cluster actually runs.

Launched by ``tools/multijvm_replay.py`` with ``REPLAY_LAUNCHER=
submit`` as::

    spark-submit --master local-cluster[2,2,2048] \
        --conf spark.pyspark.python=<python> \
        --py-files dist/<pkg>.whl.zip,__spark_entry__.py,tools/replay_contract.py \
        tools/replay_contract_main.py <sf_dir> <golden.json> <master> [only...]

Nothing here imports from the repo tree: the package, the entry
module, and the hashing protocol all arrive via ``--py-files``
(spark-submit prepends them to the driver's sys.path and ships them
to every executor's Python workers), exactly as a cluster user would
deploy.  The golden-hash JSON is passed as a PATH argument — reading
a data file is not a package import.

Prints the same per-query pass/FAIL lines as the programmatic replay
and one final ``SUBMIT_REPLAY_SUMMARY {json}`` line.
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import os

    sf_dir = sys.argv[1]
    golden_path = sys.argv[2]
    master = sys.argv[3] if len(sys.argv) > 3 else None
    only = set(sys.argv[4:])

    # all three arrive via --py-files: the wheel (the package), the
    # contract registry, and the hash protocol — single-sourced with
    # the local replay, no reimplementation to drift
    import __spark_entry__ as entry
    from replay_contract import _frame_rows, _hash_rows
    from semantic_olap_spark.session import get_spark

    # same divergent-session sweep knobs as the programmatic replay
    # (env survives through the spark-submit launcher), so the
    # literal-launcher cell of the matrix compounds with them too
    sp = os.environ.get("REPLAY_SHUFFLE_PARTITIONS")
    tz = os.environ.get("REPLAY_SESSION_TZ")
    spark = get_spark(
        app_name="submit-replay",
        master=master,
        shuffle_partitions=int(sp) if sp else 8,
        extra_conf={
            **({"spark.sql.session.timeZone": tz} if tz else {}),
            # wait for BOTH executors so every query really spans two
            # JVMs (same rationale as tools/multijvm_probe.py)
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    execs = set(
        spark.sparkContext.parallelize(range(16), 16)
        .map(lambda _: __import__("os").getppid())
        .collect()
    )

    with open(golden_path) as fh:
        golden = json.load(fh)

    ok, bad, errs = [], [], []
    t0 = time.time()
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            h = _hash_rows(_frame_rows(fn(spark, sf_dir).toPandas()))
        except Exception as e:  # noqa: BLE001 — report, don't die
            errs.append((name, f"{type(e).__name__}: {e}"))
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        want = golden.get(name)
        if want is None:
            errs.append((name, "no golden hash recorded"))
            print(f"ERR  {name}: no golden hash recorded")
        elif h == want:
            ok.append(name)
            print(f"pass {name}: {h[:12]}")
        else:
            bad.append((name, want[:12], h[:12]))
            print(f"FAIL {name}: golden {want[:12]} != submit {h[:12]}")
    summary = {
        "launcher": "spark-submit",
        "executor_jvms": len(execs),
        "sf_dir": sf_dir,
        "pass": len(ok),
        "fail": [list(b) for b in bad],
        "errors": [list(e) for e in errs],
        "wall_sec": round(time.time() - t0, 1),
    }
    print("SUBMIT_REPLAY_SUMMARY " + json.dumps(summary))
    spark.stop()
    sys.exit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
