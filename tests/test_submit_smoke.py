"""End-to-end ``spark-submit --py-files <wheel>`` deployment proof.

The programmatic replay (tools/multijvm_replay.py) ships the wheel
via ``sc.addPyFile``; this test exercises the LITERAL launcher path
a cluster user runs — spark-submit, real 2-worker standalone
cluster, PYTHONPATH scrubbed, so the wheel is provably the only way
the package reaches the driver OR the executors.
"""

import os
import shutil
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(_SPARK_SUBMIT), reason="spark-submit not found"
)
def test_spark_submit_pyfiles_wheel(tmp_path):
    from tools.build_wheel import build_spark_shippable

    shippable = build_spark_shippable(str(tmp_path))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            _SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--conf", f"spark.pyspark.python={sys.executable}",
            "--py-files", shippable,
            os.path.join(_REPO, "tools", "submit_smoke.py"),
            "/root/testdata/sf0.01",
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [
        ln for ln in out.stdout.splitlines()
        if ln.startswith("SUBMIT_SMOKE_OK")
    ]
    assert line, out.stdout[-2000:]
    _, n1, n2 = line[0].split()
    # pure-Catalyst count (driver got the package) and Arrow-UDF
    # count (executor Python got it) both non-trivial
    assert int(n1) > 0 and int(n2) > 0
