"""Filesystem seam for the streaming STATE layers.

The streaming state machinery (commit markers, crash recovery,
explicit-path pruning — ``spans.py`` and ``materialized.py``) needs
a tiny filesystem surface beyond what Spark's DataFrame I/O gives:
list a directory, read/write a small marker file, rename a tree,
delete a tree.  This module is the single place that surface is
defined, with two implementations:

- :class:`LocalStateFS` — os-level I/O for plain local paths (the
  default, zero JVM round-trips);
- :class:`HadoopStateFS` — the same surface through the Hadoop
  ``FileSystem`` API (``spark._jvm.org.apache.hadoop.fs``), used
  for any URI-form path (``file://``, ``hdfs://``, ``viewfs://``).
  A ``file://`` URI therefore exercises the exact code path an HDFS
  deployment runs, just against ``LocalFileSystem`` — which is how
  the tests pin the port without a namenode.

Object-store schemes (``s3a://``, ``gs://``, ``abfss://``, ...)
are still refused LOUDLY at the entry point: the crash-recovery
swap (``spans.replace_index_with_compacted``) relies on atomic
directory rename, which object stores do not provide — a manifest-
based commit protocol is the correct port there, and this module
does not claim it.  The refusal names that remedy.

Why the Spark-side path is always a URI: handing Spark a bare local
path on a session whose ``fs.defaultFS`` is non-local (e.g. HDFS)
would make Spark resolve it against the default filesystem while
the markers use os-level local I/O — two different trees.
``LocalStateFS.spark_path`` therefore re-prefixes ``file://`` onto
the absolute path, so the marker I/O and the parquet I/O can never
split across filesystems.
"""

from __future__ import annotations

import os
import re
import shutil

#: A path is URI-form only when the colon is followed by a slash
#: (``scheme:/...``).  Requiring the slash keeps legal local
#: relative paths whose first segment contains a colon (e.g.
#: ``run:2024/state``) out of the scheme branch — a bare
#: ``scheme:rest`` is never a filesystem URI in this layer.
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]+):/")

#: Hadoop filesystems whose ``rename`` is atomic (or at least a
#: real metadata move): the compaction swap and crash recovery are
#: safe on these.
_RENAME_ATOMIC_SCHEMES = {"file", "hdfs", "viewfs"}

#: Object stores: rename = copy+delete (non-atomic, O(data)), so the
#: swap/recovery protocol is unsound there without a manifest-based
#: commit.  Refused with that remedy named.
_OBJECT_STORE_SCHEMES = {
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
    "oss", "swift", "cos", "cosn",
}


class LocalStateFS:
    """os-level implementation for plain local paths."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def write_text(self, path: str, text: str = "") -> None:
        with open(path, "w") as f:
            f.write(text)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def remove(self, path: str) -> None:
        os.remove(path)

    def move(self, src: str, dst: str) -> None:
        shutil.move(src, dst)

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        shutil.rmtree(path, ignore_errors=ignore_errors)

    def tree_parquet_bytes(self, path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    def publish_exclusive(self, tmp: str, final: str) -> None:
        """Atomically publish ``tmp`` as ``final``, refusing (with
        ``FileExistsError``) if ``final`` already exists — link(2)
        is atomic and never overwrites.  ``tmp`` is left in place
        (caller removes it)."""
        os.link(tmp, final)

    def spark_path(self, path: str) -> str:
        # explicit file:// so Spark can never resolve the parquet
        # side against a non-local fs.defaultFS while the markers
        # use os-level I/O (the split-I/O failure mode)
        return "file://" + os.path.abspath(path)


class HadoopStateFS:
    """The same surface through ``org.apache.hadoop.fs.FileSystem``.

    Constructed from a live SparkSession (the JVM gateway) and the
    state URI; all paths passed to methods must be URIs of the same
    filesystem.  ``file://`` URIs resolve to ``LocalFileSystem`` —
    the exact HDFS code path, minus the namenode — which is how the
    tests exercise this class end to end.
    """

    def __init__(self, spark, uri: str):
        sc = spark.sparkContext
        self._jvm = sc._jvm
        jpath = self._jvm.org.apache.hadoop.fs.Path(uri)
        self._fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(
            self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()
        )

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        return [
            st.getPath().getName() for st in self._fs.listStatus(p)
        ]

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def write_text(self, path: str, text: str = "") -> None:
        out = self._fs.create(self._p(path), True)
        try:
            if text:
                out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def remove(self, path: str) -> None:
        if not self._fs.delete(self._p(path), False):
            raise OSError(f"delete failed: {path}")

    def move(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        try:
            self._fs.delete(self._p(path), True)
        except Exception:
            if not ignore_errors:
                raise

    def tree_parquet_bytes(self, path: str) -> int:
        p = self._p(path)
        if not self._fs.exists(p):
            return 0
        total = 0
        it = self._fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                total += int(st.getLen())
        return total

    def publish_exclusive(self, tmp: str, final: str) -> None:
        """Publish ``tmp`` as ``final``, refusing if ``final``
        exists.  On HDFS ``rename`` is atomic at the namenode and
        fails on an existing destination; on LocalFileSystem-via-URI
        the pre-check leaves a small window (Java renameTo may
        overwrite) — single-host file:// users who need hard
        exclusivity should use plain local paths (link(2) path)."""
        if self._fs.exists(self._p(final)):
            raise FileExistsError(final)
        if not self._fs.rename(self._p(tmp), self._p(final)):
            raise FileExistsError(final)

    def spark_path(self, path: str) -> str:
        return path  # already a URI on this filesystem


def resolve_state_fs(
    path: str,
    what: str = "path",
    layer: str = "streaming state layer",
    remedy: str = "",
    spark=None,
):
    """Resolve a state ``path`` to ``(fs, normalized_path)`` or
    refuse loudly.

    Plain paths → :class:`LocalStateFS` (os-level fast path).
    ``file:``/``hdfs:``/``viewfs:`` URIs → :class:`HadoopStateFS`
    when a SparkSession is available to reach the JVM; a ``file:``
    URI with no session degrades to :class:`LocalStateFS` on the
    stripped path (same filesystem, so nothing splits).
    Object-store schemes are refused with the manifest-commit remedy
    named; unknown schemes are refused because the swap protocol
    requires atomic rename and their semantics are unverified.

    ``layer`` names the subsystem in the error (so a span-index
    message never blames the aggregate-state layer or vice versa);
    ``remedy`` optionally appends a subsystem-specific alternative
    for object-store corpora.
    """
    m = _SCHEME_RE.match(path)
    if m is None:
        return LocalStateFS(), path
    scheme = m.group(1).lower()
    if scheme in _OBJECT_STORE_SCHEMES:
        raise ValueError(
            f"{what} {path!r}: the {layer} refuses object-store "
            f"scheme {scheme!r} — its crash-recovery swap relies on "
            f"atomic directory rename, which object stores do not "
            f"provide (a manifest-based commit protocol would be "
            f"required). Use a local, file://, or hdfs:// path."
            + (f" {remedy}" if remedy else "")
        )
    if scheme not in _RENAME_ATOMIC_SCHEMES:
        raise ValueError(
            f"{what} {path!r}: the {layer} does not recognize "
            f"scheme {scheme!r} as rename-atomic; supported schemes "
            f"are plain local paths, file://, hdfs://, viewfs://."
            + (f" {remedy}" if remedy else "")
        )
    if scheme == "file":
        # validate (and refuse a non-empty authority) regardless of
        # which implementation serves the URI
        stripped = _strip_file_uri(path, what)
        if spark is None:
            return LocalStateFS(), stripped
        return HadoopStateFS(spark, path), path
    if spark is None:
        raise ValueError(
            f"{what} {path!r}: a {scheme}:// state path needs a live "
            f"SparkSession to reach the Hadoop FileSystem API — pass "
            f"spark= to this entry point."
        )
    return HadoopStateFS(spark, path), path


def _strip_file_uri(path: str, what: str = "path") -> str:
    """``file:`` URI → plain local path (``file:/p``, ``file:///p``)."""
    rest = path[len("file:"):]
    if rest.startswith("//"):
        rest = rest[2:]  # file://<authority><path>
        if not rest.startswith("/"):
            raise ValueError(
                f"{what} {path!r}: file: URI with a non-empty "
                f"authority is not a local path"
            )
    return rest


def local_state_path(
    path: str,
    what: str = "path",
    layer: str = "streaming state layer",
    remedy: str = "",
) -> str:
    """Back-compat shim: normalize ``path`` to a plain local path or
    refuse loudly (the pre-Hadoop-port entry point; new call sites
    use :func:`resolve_state_fs`, which also serves URI-form paths
    through the Hadoop FileSystem API)."""
    fs, p = resolve_state_fs(path, what=what, layer=layer, remedy=remedy)
    if isinstance(fs, HadoopStateFS):  # pragma: no cover - needs spark
        raise ValueError(
            f"{what} {path!r}: local_state_path serves local paths "
            f"only; use resolve_state_fs for URI-form state."
        )
    return p
