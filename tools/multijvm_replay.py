"""Full-registry cross-JVM replay: every __spark_entry__ query on a
REAL 2-worker standalone cluster, hashed against the local-JVM
golden record.

``local[32]`` is one JVM: closures never cross a process boundary,
broadcasts never pickle numpy state over a wire, and Python workers
all inherit one daemon tree.  ``local-cluster[2,2,2048]`` spawns two
separate worker JVMs with their own Python worker pools — the
cheapest honest rehearsal of a 1000-executor deployment.  This tool
replays the WHOLE contract registry there and compares each query's
pandas-protocol hash (tools/replay_contract.py's exact protocol, the
driver's evident compare) against tools/golden_hashes.json, which is
recorded from the local[32] session.  159/159 identical = no query's
result depends on single-JVM accidents (closure capture, broadcast
pickling, task-order float accumulation the plans were built to
avoid).

Usage:
    python tools/multijvm_replay.py [only_query ...]

Env knobs:
    MULTIJVM_MASTER   default local-cluster[2,2,2048]
    REPLAY_SF_DIR     default /root/testdata/sf0.01 (the sf the
                      golden hashes are recorded at)
    REPLAY_LAUNCHER — "programmatic" (default): this process builds
                      the session and ships the wheel via
                      ``sc.addPyFile``.  "submit": exec the LITERAL
                      ``spark-submit --py-files`` launcher on the
                      driver application tools/replay_contract_main.py
                      with PYTHONPATH scrubbed — the package, the
                      entry registry, and the hash protocol reach the
                      driver and executors ONLY through --py-files,
                      exactly what a cluster runs.  Implies
                      REPLAY_PACKAGE_SOURCE=wheel.
    REPLAY_SHUFFLE_PARTITIONS / REPLAY_SESSION_TZ — same divergent-
                      session sweep knobs as tools/replay_contract.py
                      (cross-JVM × divergent-conf compounds the two
                      strongest determinism probes)
    REPLAY_PACKAGE_SOURCE — how executor Python gets the package:
        "wheel" (default): build the real deployment artifact with
            tools/build_wheel.py and ship it via ``sc.addPyFile`` —
            the programmatic equivalent of ``spark-submit
            --py-files *.whl.zip`` (``spark.submit.pyFiles`` as a
            conf key is ONLY parsed by the spark-submit launcher;
            a programmatic SparkContext ignores it).  The tool
            scrubs the repo from the inherited PYTHONPATH first,
            so the wheel is provably the ONLY package source
            executors have.
        "pythonpath": the r9 same-host analogue
            (``spark.executorEnv.PYTHONPATH`` pointing at the repo).

Prints per-query pass/FAIL lines and ONE final JSON summary line.
Run from a fresh process — a pytest-owned local[32] session and a
local-cluster master cannot share one JVM.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.replay_contract import GOLDEN_PATH, _frame_rows, _hash_rows


def _submit_mode(
    repo: str, sf_dir: str, master: str, only: set[str]
) -> None:
    """Re-launch the replay through the REAL spark-submit binary.

    The child process sees a PYTHONPATH with the repo scrubbed; its
    only package sources are the ``--py-files`` arguments.  Output
    streams through; this process exits with the child's code."""
    import subprocess

    from tools.build_wheel import (
        build_spark_shippable,
        scrub_repo_from_pythonpath,
    )

    spark_submit = os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        raise SystemExit(f"spark-submit not found at {spark_submit}")
    shippable = build_spark_shippable(os.path.join(repo, "dist"))
    # the helper scrubs os.environ in place; snapshot AFTER so the
    # child inherits a PYTHONPATH with the repo provably absent
    scrub_repo_from_pythonpath(repo)
    env = dict(os.environ)
    cmd = [
        spark_submit,
        "--master", master,
        "--conf", f"spark.pyspark.python={sys.executable}",
        "--py-files", ",".join([
            shippable,
            os.path.join(repo, "__spark_entry__.py"),
            os.path.join(repo, "tools", "replay_contract.py"),
        ]),
        os.path.join(repo, "tools", "replay_contract_main.py"),
        sf_dir,
        GOLDEN_PATH,
        master,
        *sorted(only),
    ]
    print("exec:", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, env=env)
    sys.exit(proc.returncode)


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("REPLAY_SF_DIR", "/root/testdata/sf0.01")
    master = os.environ.get("MULTIJVM_MASTER", "local-cluster[2,2,2048]")
    pkg_source = os.environ.get("REPLAY_PACKAGE_SOURCE", "wheel")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("REPLAY_LAUNCHER", "programmatic") == "submit":
        _submit_mode(repo, sf_dir, master, only)
        return

    # the first full replay found exactly what this harness exists to
    # find: worker JVMs spawn their own Python workers, which do NOT
    # inherit the driver's sys.path — 29 semantic/LLM rows died with
    # ModuleNotFoundError while all 129 pure-Catalyst rows passed
    # (zero executor Python).  Shipping the package is the deployment
    # requirement; the default mode now does it the way a real
    # cluster submission does: build the wheel and put it on
    # ``spark.submit.pyFiles`` (= ``spark-submit --py-files *.whl``).
    if pkg_source not in ("wheel", "pythonpath"):
        raise SystemExit(
            f"REPLAY_PACKAGE_SOURCE must be 'wheel' or 'pythonpath', "
            f"got {pkg_source!r} — refusing to silently fall back to "
            f"the weaker mode"
        )
    pkg_conf: dict[str, str] = {}
    if pkg_source == "wheel":
        from tools.build_wheel import (
            build_spark_shippable,
            scrub_repo_from_pythonpath,
        )

        wheel = build_spark_shippable(os.path.join(repo, "dist"))
        # local-cluster worker JVMs inherit THIS process's env — scrub
        # the repo out of PYTHONPATH so the wheel is provably the only
        # way executor Python can import the package
        scrub_repo_from_pythonpath(repo)
        pkg_source = f"wheel:{os.path.basename(wheel)}"
    else:
        # r9's same-host analogue of an installed package
        pkg_conf["spark.executorEnv.PYTHONPATH"] = repo
        pkg_source = "executorEnv.PYTHONPATH"

    import __spark_entry__ as entry
    from semantic_olap_spark.session import get_spark

    sp = os.environ.get("REPLAY_SHUFFLE_PARTITIONS")
    tz = os.environ.get("REPLAY_SESSION_TZ")
    spark = get_spark(
        app_name="multijvm-replay",
        master=master,
        shuffle_partitions=int(sp) if sp else 8,
        extra_conf={
            **(
                {"spark.sql.session.timeZone": tz} if tz else {}
            ),
            **pkg_conf,
            "spark.pyspark.python": sys.executable,
            # wait for BOTH executors so every query really spans two
            # JVMs (same rationale as tools/multijvm_probe.py)
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if pkg_source.startswith("wheel:"):
        # the programmatic equivalent of ``spark-submit --py-files``:
        # the wheel is shipped to every executor and prepended to each
        # Python worker's sys.path (spark.submit.pyFiles as a conf key
        # is only parsed by the spark-submit launcher, not by a
        # programmatic SparkContext — verified empirically)
        spark.sparkContext.addPyFile(wheel)
    # sanity: the session really runs on two executor JVMs
    execs = set(
        spark.sparkContext.parallelize(range(16), 16)
        .map(lambda _: __import__("os").getppid())
        .collect()
    )
    n_jvms = len(execs)

    with open(GOLDEN_PATH) as fh:
        golden = json.load(fh)

    qs = entry.queries()
    ok, bad, errs = [], [], []
    t0 = time.time()
    for name, fn in qs.items():
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
            print(f"FAIL {name}: golden {want[:12]} != cluster {h[:12]}")
    summary = {
        "master": master,
        "executor_jvms": n_jvms,
        "package_source": pkg_source,
        "sf_dir": sf_dir,
        "pass": len(ok),
        "fail": [list(b) for b in bad],
        "errors": [list(e) for e in errs],
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    spark.stop()
    sys.exit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
