"""Shared local-filesystem contract for the streaming STATE layers.

The streaming state machinery (commit markers, crash recovery,
explicit-path pruning — ``spans.py`` and ``materialized.py``) is
implemented with os-level I/O (``os.listdir``/``open``/
``shutil.move``), so state paths must live on the LOCAL filesystem.
This module is the single place that contract is enforced: plain
paths and ``file:`` URIs are accepted (the URI form is normalized to
a plain path so the os-level markers and the Spark reads agree); any
other scheme (``s3://``, ``hdfs://``, ...) is refused LOUDLY at the
entry point, not as an ENOENT after Spark happily wrote the parquet
side.  An object-store deployment needs a Hadoop-FileSystem port of
the marker/rename surface (and, for S3, a manifest design in place
of atomic renames) — neither state module claims that.
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]+):")


def local_state_path(
    path: str,
    what: str = "path",
    layer: str = "streaming state layer",
    remedy: str = "",
) -> str:
    """Normalize ``path`` to a plain local path or refuse loudly.

    ``layer`` names the subsystem in the error (so a span-index
    message never blames the aggregate-state layer or vice versa);
    ``remedy`` optionally appends a subsystem-specific alternative
    for object-store corpora."""
    m = _SCHEME_RE.match(path)
    if m is None:
        return path
    scheme = m.group(1)
    if scheme.lower() != "file":
        raise ValueError(
            f"{what} {path!r}: the {layer} is local-filesystem-only "
            f"(commit markers and crash recovery use os-level I/O); "
            f"got scheme {scheme!r}. Use a local or file:// path."
            + (f" {remedy}" if remedy else "")
        )
    rest = path[len(scheme) + 1:]
    if rest.startswith("//"):
        rest = rest[2:]  # file://<authority><path>
        if not rest.startswith("/"):
            raise ValueError(
                f"{what} {path!r}: file: URI with a non-empty "
                f"authority is not a local path"
            )
    return rest
