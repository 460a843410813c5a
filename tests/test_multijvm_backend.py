"""Multi-JVM (local-cluster[2,2,1024]) proof for the LLM backend.

Everything else in the suite runs on local[32] — ONE JVM — so the
per-process claims of llm/http_client.py (picklable clients, token
buckets owned per worker process) and llm/client.py's BudgetLLM
(per-process call caps, hard local stop) were never exercised
across real process boundaries.  tools/multijvm_probe.py spins two
worker JVMs and measures; this test subprocess-runs it (the pytest
session already owns a local[32] SparkSession — two masters cannot
share a JVM) and asserts on its JSON observations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_backend_behaves_per_process_across_two_jvms():
    env = dict(os.environ, PYTHONPATH=_REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "multijvm_probe.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        (ln for ln in proc.stdout.splitlines()
         if ln.startswith("PROBE_RESULT ")),
        None,
    )
    assert line, proc.stdout[-3000:]
    got = json.loads(line[len("PROBE_RESULT "):])

    # two real executor JVMs ran tasks
    assert got["executor_trees"] == 2
    # sem_filter through HTTP == stub path, non-trivial selectivity
    assert got["http_equals_stub"] and 0 < got["http_rows"] < 500
    # requests arrived from >=2 worker processes spanning BOTH JVMs
    assert got["distinct_worker_clients"] >= 2
    assert got["client_jvms_spanned"] == 2
    assert got["all_answers_yes"]
    # token bucket state is per process (a shared bucket would have
    # drained by total-calls on some worker)
    assert got["bucket_is_local"]
    # BudgetLLM: per-process copies (no global accounting) with a
    # hard local stop at the cap
    assert got["budget_per_process_ok"]
    assert got["budget_hard_stop"]
    # r7 broadcast-matmul cosine scoring: sc.broadcast + mapInPandas
    # closure behave identically when worker JVMs are real processes
    assert got["matmul_equals_expr_across_jvms"]
    # r8: llm_rerank's size-guard slice recomputes deterministically
    # after its cached blocks are dropped mid-lifecycle (executor
    # loss / eviction) — legal calls bound the limit over the WHOLE
    # producer output, so slice identity survives recompute
    assert got["rerank_recompute_deterministic"]
