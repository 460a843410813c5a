"""Executor-loss durability: the r9 `checkpoint_dir=` claim DEMONSTRATED.

tests/test_reliable_checkpoint.py pins that reliable cuts produce
identical results and write files; this test proves the part that
matters on a cluster — tools/executor_loss_probe.py runs the
distributed pagerank loop on local-cluster[2,1,1024], SIGKILLs BOTH
executor JVMs (found by cmdline, not the pyspark daemons — killing
daemons proved nothing, the JVM respawns them with its blocks
intact), and re-collects the same frame:

- localCheckpoint mode must FAIL (blocks died with the executors and
  the truncated lineage cannot recompute);
- reliable checkpoint mode must SURVIVE with bit-identical ranks
  (the respawned executors read the fault-tolerant store).

Subprocess-run like test_multijvm_backend.py: the pytest session
owns a local[32] SparkSession and two masters cannot share a JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe(mode: str, *args: str) -> dict:
    env = dict(os.environ, PYTHONPATH=_REPO)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "tools", "executor_loss_probe.py"),
            mode, *args,
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd="/tmp",
    )
    line = next(
        (ln for ln in proc.stdout.splitlines()
         if ln.startswith('{"mode"')),
        None,
    )
    assert line, (proc.stdout[-2000:], proc.stderr[-2000:])
    return json.loads(line)


@pytest.mark.slow
def test_local_checkpoint_dies_with_executors():
    got = _probe("local")
    assert got["executors_killed"] == 2
    assert got["survived"] is False, got


@pytest.mark.slow
def test_reliable_checkpoint_survives_executor_loss(tmp_path):
    got = _probe("reliable", str(tmp_path / "ck"))
    assert got["executors_killed"] == 2
    assert got["survived"] is True and got["identical"] is True, got
