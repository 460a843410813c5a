"""Boolean plan-logic trees → Spark Column expressions.

The reference's filter plans are nested boolean trees over operation
ids, e.g. ``["AND", 1, ["OR", 2, 3]]`` (format defined in the planner
prompts, Semantic-OLAP/Agents/OLAP_Agent.py:58-81 and
Agents/Exection_Agent.py:33-46).  A bare list of ids means implicit
AND (Semantic-OLAP/Agents/Components/Operaters.py:180-204).

``normalize_logic`` reproduces Exection_Agent.py:213-238: unwrap
single-element lists and associativity-merge nested same-op nodes.
Catalyst's BooleanSimplification would redo this, but normalizing
first keeps lineage plans canonical.

Spark's native boolean operators already implement Kleene
three-valued logic (``true AND null = null``, ``false AND null =
false``), which is exactly the NA = "not yet evaluated" semantics of
the reference's ``_merge_logic`` (Exection_Agent.py:181-210) — the
staged executor in ``plans/executor.py`` leans on that directly.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

LogicTree = object  # int leaf | ["AND"|"OR", *LogicTree] | bare [int, ...]


def normalize_logic(tree: LogicTree) -> LogicTree:
    """Canonicalize a logic tree (reference: Exection_Agent.py:213-238).

    - bare int → itself
    - ``[x]`` → normalize(x)
    - bare list without AND/OR head → implicit AND
    - nested same-op children are merged (associativity flattening)
    """
    if isinstance(tree, int):
        return tree
    if not isinstance(tree, (list, tuple)):
        raise TypeError(f"bad logic node: {tree!r}")
    tree = list(tree)
    if len(tree) == 0:
        raise ValueError("empty logic node")
    head = tree[0]
    if isinstance(head, str) and head.upper() in ("AND", "OR"):
        op = head.upper()
        children = [normalize_logic(c) for c in tree[1:]]
    else:
        # bare id list ⇒ implicit AND (Operaters.py:180-204)
        op = "AND"
        children = [normalize_logic(c) for c in tree]
    if not children:
        # ["AND"] / ["OR"] — an op head with no operands; failing
        # here beats the opaque IndexError compile_logic would hit
        raise ValueError(f"logic node {head!r} has no children")
    merged: list[LogicTree] = []
    for c in children:
        if isinstance(c, list) and c and c[0] == op:
            merged.extend(c[1:])
        else:
            merged.append(c)
    if len(merged) == 1:
        return merged[0]
    return [op, *merged]


def logic_leaves(tree: LogicTree) -> list[int]:
    """All leaf operation ids, left-to-right."""
    if isinstance(tree, int):
        return [tree]
    out: list[int] = []
    for c in (tree[1:] if isinstance(tree[0], str) else tree):
        out.extend(logic_leaves(c))
    return out


def compile_logic(
    tree: LogicTree, leaf: Mapping[int, Column] | Callable[[int], Column]
) -> Column:
    """Compile a normalized tree to one Column expression.

    ``leaf`` maps an operation id to its boolean Column (may be a
    NULL literal for not-yet-evaluated ops — Kleene semantics then
    come for free from Spark's ``&``/``|``).
    """
    get = leaf.__getitem__ if isinstance(leaf, Mapping) else leaf
    tree = normalize_logic(tree)

    def go(node: LogicTree) -> Column:
        if isinstance(node, int):
            return get(node)
        op, *children = node
        cols = [go(c) for c in children]
        acc = cols[0]
        for c in cols[1:]:
            acc = (acc & c) if op == "AND" else (acc | c)
        return acc

    return go(tree)


def null_bool() -> Column:
    """A NULL boolean literal — the 'undecided' Kleene value."""
    return F.lit(None).cast("boolean")
