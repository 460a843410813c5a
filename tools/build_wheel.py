"""Build the semantic_olap_spark wheel with the stdlib only.

A real cluster submission ships the package as a wheel
(``spark-submit --py-files semantic_olap_spark-*.whl``); the
cross-JVM replay (tools/multijvm_replay.py) proved executor Python
dies without the package, so the wheel IS the deployment artifact.
This container has setuptools but neither the ``wheel`` nor the
``build`` package, so ``pip wheel`` / ``python -m build`` cannot run
— instead this tool assembles the PEP 427 wheel directly: the
package tree plus a ``*.dist-info/`` with METADATA / WHEEL / RECORD
(sha256 urlsafe-b64, per the spec).  The result is a normal wheel:
``pip install --no-deps <wheel>`` accepts it, and Spark's
``addPyFile`` / ``spark.submit.pyFiles`` puts it on every executor's
PYTHONPATH (zipimport loads the pure-Python tree straight from the
zip).

Usage:
    python tools/build_wheel.py [outdir]      # default: dist/

Prints the wheel path on the last line.
"""
from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "semantic_olap_spark"


def _record_line(arcname: str, data: bytes) -> str:
    digest = base64.urlsafe_b64encode(
        hashlib.sha256(data).digest()
    ).rstrip(b"=").decode("ascii")
    return f"{arcname},sha256={digest},{len(data)}"


def build(outdir: str) -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    name = proj["name"].replace("-", "_")
    version = proj["version"]
    tag = "py3-none-any"
    distinfo = f"{name}-{version}.dist-info"
    wheel_name = f"{name}-{version}-{tag}.whl"

    metadata = "\n".join(
        [
            "Metadata-Version: 2.1",
            f"Name: {proj['name']}",
            f"Version: {version}",
            f"Summary: {proj.get('description', '')}",
            f"Requires-Python: {proj.get('requires-python', '')}",
            *(f"Requires-Dist: {d}" for d in proj.get("dependencies", [])),
            "",
        ]
    ).encode()
    wheel_meta = "\n".join(
        [
            "Wheel-Version: 1.0",
            "Generator: semantic_olap_spark.tools.build_wheel",
            "Root-Is-Purelib: true",
            f"Tag: {tag}",
            "",
        ]
    ).encode()

    os.makedirs(outdir, exist_ok=True)
    out_path = os.path.join(outdir, wheel_name)
    record: list[str] = []
    # fixed timestamp: byte-identical wheels for identical trees
    zinfo_date = (2026, 1, 1, 0, 0, 0)

    def _add(zf: zipfile.ZipFile, arcname: str, data: bytes) -> None:
        zi = zipfile.ZipInfo(arcname, date_time=zinfo_date)
        zi.external_attr = 0o644 << 16
        zf.writestr(zi, data, compress_type=zipfile.ZIP_DEFLATED)
        record.append(_record_line(arcname, data))

    with zipfile.ZipFile(out_path, "w") as zf:
        pkg_root = os.path.join(REPO, PACKAGE)
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = sorted(
                d for d in dirnames if d != "__pycache__"
            )
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO).replace(os.sep, "/")
                with open(full, "rb") as fh:
                    _add(zf, arc, fh.read())
        _add(zf, f"{distinfo}/METADATA", metadata)
        _add(zf, f"{distinfo}/WHEEL", wheel_meta)
        record.append(f"{distinfo}/RECORD,,")
        zi = zipfile.ZipInfo(f"{distinfo}/RECORD", date_time=zinfo_date)
        zi.external_attr = 0o644 << 16
        zf.writestr(zi, "\n".join(record) + "\n")
    return out_path


def scrub_repo_from_pythonpath(repo: str) -> None:
    """Remove ``repo`` from ``os.environ['PYTHONPATH']`` in place.

    local-cluster worker JVMs inherit the launcher process's env, so
    a repo on PYTHONPATH would leak the package to executors and make
    any "the wheel is the only package source" claim vacuous.  Both
    cross-JVM tools (multijvm_replay, multijvm_bench) call this one
    helper so the scrub cannot drift between them.
    """
    pp = os.environ.get("PYTHONPATH")
    if not pp:
        return
    parts = [
        p for p in pp.split(os.pathsep)
        if os.path.abspath(p or ".") != repo
    ]
    if parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    else:
        del os.environ["PYTHONPATH"]


def build_spark_shippable(outdir: str) -> str:
    """Build the wheel plus a byte-identical ``.whl.zip`` alias.

    PySpark's ``addPyFile``/``--py-files`` include mechanism only
    sys.path's files whose extension is in
    ``SparkContext.PACKAGE_EXTENSIONS = (".zip", ".egg", ".jar")``
    (the check is literally ``filename[-4:]``) — a ``.whl`` is
    downloaded to the executor work dir but never made importable.
    The standard cluster workaround is shipping the wheel under a
    ``.zip`` name; a wheel IS a zip, so the alias is the same bytes.
    Returns the shippable path.
    """
    import shutil

    whl = build(outdir)
    shippable = whl + ".zip"
    shutil.copyfile(whl, shippable)
    return shippable


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist"))
    print(out)
