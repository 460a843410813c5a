"""Lattice inspector: the reference's cube page without the server.

The reference renders its cube interactively (pages/Cube.py:8-63 —
a pyvis DAG of the node lattice, a per-dimension DAG of granularity
views, and dataframe previews per view).  This module is the same
inspection surface as OFFLINE artifacts, dependency-free:

- :func:`lattice_text` — the lattice as an indented tree for
  terminals/logs (the CLI REPL's ``:cube`` command);
- :func:`lattice_html` — a single self-contained HTML file (inline
  SVG edges, no JS libraries, no network) with one card per node:
  query, plan operators, dimension → granularity catalog, and an
  optional bounded data preview per node and per granularity view.

Scale posture: rendering is driver-side METADATA only — O(nodes)
strings, no Spark jobs — unless ``preview_rows > 0``, in which case
each preview is one ``limit(n).collect()`` (bounded by construction)
and lazy/catalog-mode nodes that were never materialized are left
unloaded (the inspector must not be the thing that triggers a
thousand parquet scans on a reopened cube).
"""

from __future__ import annotations

import html as _html
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover - typing only
    from semantic_olap_spark.plans.memory import CubeMemory


def _layers(mem: "CubeMemory") -> list[list[int]]:
    """Topological layers (BFS depth from the root; a node sits at
    1 + max parent depth so every edge points strictly downward)."""
    depth: dict[int, int] = {mem.root_id: 0}
    changed = True
    while changed:  # lattice is a small driver-side DAG
        changed = False
        for nid, node in mem.nodes.items():
            parents = [p for p in node.parents if p in depth]
            if not parents:
                continue
            d = 1 + max(depth[p] for p in parents)
            if depth.get(nid) != d and depth.get(nid, -1) < d:
                depth[nid] = d
                changed = True
    for nid in mem.nodes:
        depth.setdefault(nid, 0)
    out: list[list[int]] = [[] for _ in range(max(depth.values()) + 1)]
    for nid in sorted(mem.nodes):
        out[depth[nid]].append(nid)
    return out


def lattice_text(mem: "CubeMemory") -> str:
    """The lattice as an indented tree (children under parents;
    a multi-parent node appears under each parent, marked ``^``
    after the first).  Metadata only — zero Spark jobs."""
    lines: list[str] = []
    seen: set[int] = set()

    def walk(nid: int, indent: int) -> None:
        node = mem.nodes[nid]
        again = nid in seen
        seen.add(nid)
        dims = {
            col: cv.names() for col, cv in node.col_views.items()
        }
        dim_s = (
            " dims{" + ", ".join(
                f"{c}:[{','.join(n)}]" for c, n in dims.items()
            ) + "}" if dims else ""
        )
        mark = " ^" if again else ""
        loaded = "" if node.is_loaded else " (unloaded)"
        lines.append(
            f"{'  ' * indent}[{nid}] {node.query!r} "
            f"plan:{len(node.plan)}{dim_s}{loaded}{mark}"
        )
        if again:
            return
        for c in node.children:
            walk(c, indent + 1)

    walk(mem.root_id, 0)
    return "\n".join(lines)


def _preview_table(df, n: int) -> str:
    rows = df.limit(n).collect()
    if not rows:
        return "<p class='empty'>(empty)</p>"
    cols = rows[0].__fields__
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(
            f"<td>{_html.escape(str(r[c]))[:80]}</td>" for c in cols
        ) + "</tr>"
        for r in rows
    )
    return (
        f"<table><thead><tr>{head}</tr></thead>"
        f"<tbody>{body}</tbody></table>"
    )


_CSS = """
body{font-family:sans-serif;margin:16px;background:#fafafa}
.card{border:1px solid #ccc;border-radius:6px;padding:8px 12px;
      margin:6px;background:#fff;display:inline-block;
      vertical-align:top;max-width:420px}
.card h3{margin:2px 0;font-size:14px}
.card .meta{color:#555;font-size:12px}
.layer{margin:4px 0}
table{border-collapse:collapse;font-size:11px;margin:4px 0}
td,th{border:1px solid #ddd;padding:2px 5px;text-align:left}
.gran{margin-left:10px;font-size:12px}
.empty{color:#999;font-size:12px}
svg{display:block}
.edges text{font-size:10px;fill:#888}
"""


def lattice_html(
    mem: "CubeMemory",
    path: str | None = None,
    preview_rows: int = 0,
    preview_unloaded: bool = False,
) -> str:
    """Render the lattice to one self-contained HTML string (and
    optionally write it to ``path``).

    ``preview_rows``: rows of each node frame / granularity label
    map to inline (0 = metadata only, no Spark jobs).  Lazy nodes
    that were never materialized are skipped unless
    ``preview_unloaded=True`` (which triggers their disk scan).
    """
    layers = _layers(mem)
    parts: list[str] = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>semantic-olap cube</title>",
        f"<style>{_CSS}</style></head><body>",
        f"<h2>Cube lattice — {len(mem.nodes)} nodes</h2>",
    ]
    # edge list as an SVG arrow diagram (pure text positions: node
    # order within its layer; good enough for lineage reading
    # without a JS layout engine)
    parts.append("<h4>Edges</h4><ul>")
    for nid in sorted(mem.nodes):
        for c in mem.nodes[nid].children:
            parts.append(
                f"<li>[{nid}] → [{c}] "
                f"({_html.escape(mem.nodes[c].query)[:60]})</li>"
            )
    parts.append("</ul>")
    for d, layer in enumerate(layers):
        parts.append(f"<div class='layer'><h4>depth {d}</h4>")
        for nid in layer:
            node = mem.nodes[nid]
            parts.append("<div class='card'>")
            parts.append(
                f"<h3>[{nid}] {_html.escape(node.query)}</h3>"
            )
            ops = ", ".join(
                str(
                    step.get("operator_name")
                    or step.get("operator", "?")
                )
                for step in node.plan
            ) or "(root)"
            parts.append(
                f"<div class='meta'>plan: {_html.escape(ops)}<br>"
                f"parents: {node.parents} children: {node.children}"
                f"</div>"
            )
            do_preview = preview_rows > 0 and (
                node.is_loaded or preview_unloaded
            )
            if do_preview:
                parts.append(_preview_table(node.df, preview_rows))
            elif preview_rows > 0:
                parts.append(
                    "<p class='empty'>(unloaded catalog node — "
                    "preview skipped)</p>"
                )
            for col, cv in node.col_views.items():
                for gname in cv.names():
                    gv = cv.get(gname)
                    parts.append(
                        f"<div class='gran'><b>{_html.escape(col)}"
                        f"</b> ▸ {_html.escape(gname)} — "
                        f"{_html.escape(gv.description or '')}"
                    )
                    gv_loaded = (
                        gv._df is not None or gv._loader is None
                    )
                    if preview_rows > 0 and (
                        gv_loaded or preview_unloaded
                    ):
                        parts.append(
                            _preview_table(gv.df, preview_rows)
                        )
                        if gv.view is not None:
                            parts.append(
                                _preview_table(gv.view, preview_rows)
                            )
                    parts.append("</div>")
            parts.append("</div>")
        parts.append("</div>")
    parts.append("</body></html>")
    doc = "\n".join(parts)
    if path is not None:
        with open(path, "w") as fh:
            fh.write(doc)
    return doc
