"""tools/build_wheel.py: the deployment artifact must be a real wheel.

The cross-JVM replay proved executor Python dies without the package
(SCALE.md, r9) — the wheel is how a cluster submission ships it, so
its structural validity is contract, not packaging trivia.
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.build_wheel import build, build_spark_shippable  # noqa: E402


def test_wheel_structure_and_zipimport(tmp_path):
    whl = build(str(tmp_path))
    assert whl.endswith("py3-none-any.whl")
    with zipfile.ZipFile(whl) as zf:
        names = zf.namelist()
        distinfo = [n for n in names if n.endswith("/METADATA")]
        assert len(distinfo) == 1
        meta = zf.read(distinfo[0]).decode()
        assert "Name: semantic-olap-spark" in meta
        record = zf.read(
            distinfo[0].replace("METADATA", "RECORD")
        ).decode().strip().splitlines()
        # every shipped file is in RECORD with a sha256 (except RECORD)
        hashed = {r.split(",")[0] for r in record if ",sha256=" in r}
        pkg_files = [n for n in names if n.startswith("semantic_olap_spark/")]
        assert pkg_files and set(pkg_files) <= hashed
        assert "semantic_olap_spark/__init__.py" in names
        assert not any(n.endswith(".pyc") for n in names)
    # zipimport: the wheel alone must make the package importable
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import semantic_olap_spark as m; print(m.__file__)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, whl],
        capture_output=True, text=True, timeout=120,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert out.returncode == 0, out.stderr
    assert whl in out.stdout


def test_spark_shippable_zip_alias_is_byte_identical(tmp_path):
    shippable = build_spark_shippable(str(tmp_path))
    # PySpark PACKAGE_EXTENSIONS accepts .zip but not .whl — the
    # shippable alias must be .zip-suffixed and the same bytes
    assert shippable.endswith(".whl.zip")
    with open(shippable, "rb") as a, open(shippable[: -len(".zip")], "rb") as b:
        assert a.read() == b.read()


def test_wheel_build_is_deterministic(tmp_path):
    w1 = build(str(tmp_path / "a"))
    w2 = build(str(tmp_path / "b"))
    with open(w1, "rb") as f1, open(w2, "rb") as f2:
        assert f1.read() == f2.read()


def test_pip_accepts_the_wheel(tmp_path):
    whl = build(str(tmp_path))
    target = tmp_path / "site"
    out = subprocess.run(
        [
            sys.executable, "-m", "pip", "install", "--no-deps",
            "--no-index", "--quiet", "--target", str(target), whl,
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert (target / "semantic_olap_spark" / "__init__.py").exists()
    assert any(
        p.name == "RECORD"
        for p in target.glob("semantic_olap_spark-*.dist-info/*")
    )
