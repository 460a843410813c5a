"""Executor-loss durability probe for the iterative loops' lineage
cuts (caching.lineage_cut, r9 `checkpoint_dir=` opt-in).

The claim under test is the exact difference between the two cut
modes, demonstrated rather than asserted from documentation:

- ``localCheckpoint`` truncates lineage and stores the blocks in
  EXECUTOR storage — an executor loss makes the frame
  unrecomputable (there is no lineage left to replay), so acting on
  it after the loss must FAIL;
- reliable ``checkpoint(dir)`` writes the blocks to a fault-tolerant
  store — the restarted executor reads them back and the SAME
  action succeeds with IDENTICAL results (pagerank's fixed-point
  integer ranks leave no tolerance window).

Method: run the distributed pagerank loop (driver_threshold=0) on a
``local-cluster[2,1,1024]`` — two real worker JVMs — collect the
ranks once (pre-loss truth), SIGKILL every executor JVM (found via
each Python worker's ppid), wait for the standalone workers to
respawn executors, then collect the SAME frame again.

Usage:  python tools/executor_loss_probe.py local|reliable [ckpt_dir]
Prints ONE JSON line: {"mode", "executors_killed", "survived",
"identical" | "error"}.  Run from a fresh process (a pytest-owned
local[32] session and a local-cluster master cannot share one JVM);
tests/test_executor_loss.py asserts local → not survived,
reliable → survived + identical.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    mode = sys.argv[1]
    ckdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/exec_loss_ck"
    assert mode in ("local", "reliable"), mode

    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.graph import pagerank
    from semantic_olap_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name=f"executor-loss-{mode}",
        master="local-cluster[2,1,1024]",
        shuffle_partitions=4,
        extra_conf={
            "spark.pyspark.python": sys.executable,
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
            "spark.executorEnv.PYTHONPATH": repo,
            # fail fast once the block is provably gone — the default
            # 4 task retries only delay the inevitable SparkException
            "spark.task.maxFailures": "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7 + 1) % 500).alias("dst"),
    )
    ranks = pagerank(
        edges, iterations=4, checkpoint_every=1, driver_threshold=0,
        checkpoint_dir=(ckdir if mode == "reliable" else None),
    )
    expected = sorted(map(tuple, ranks.collect()))  # pre-loss truth

    # find the executor JVMs of THIS app by cmdline (a Python
    # worker's ppid is only the pyspark DAEMON — killing daemons
    # proved nothing: the JVM respawns them with its blocks intact)
    import glob

    app_id = spark.sparkContext.applicationId
    jvm_pids = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as fh:
                cmd = fh.read().decode(errors="replace")
        except OSError:
            continue
        if "CoarseGrainedExecutorBackend" in cmd and app_id in cmd:
            jvm_pids.append(int(p.split("/")[2]))
    assert len(jvm_pids) == 2, jvm_pids
    for pid in jvm_pids:  # kill EVERY executor JVM — no luck involved
        try:
            os.kill(pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    time.sleep(5)  # let the loss register + workers respawn executors

    out = {"mode": mode, "executors_killed": len(jvm_pids)}
    try:
        got = sorted(map(tuple, ranks.collect()))
        out["survived"] = True
        out["identical"] = got == expected
    except Exception as e:  # noqa: BLE001 — the failure IS the result
        out["survived"] = False
        out["error"] = type(e).__name__
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
