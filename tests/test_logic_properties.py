"""Property tests (hypothesis): logic-tree normalization invariants.

``normalize_logic`` must never change a tree's truth value — checked
against a reference evaluator over random trees and random leaf
assignments, including Kleene three-valued semantics (None = not yet
evaluated), which is exactly what the staged executor relies on.
No Spark needed: the compile target's semantics (Kleene and/or) are
mirrored in pure Python.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_olap_spark.operators.logic import (
    logic_leaves,
    normalize_logic,
)

N_LEAVES = 6


def trees(depth=3):
    leaf = st.integers(min_value=1, max_value=N_LEAVES)
    return st.recursive(
        leaf,
        lambda children: st.one_of(
            # explicit AND/OR nodes
            st.tuples(st.sampled_from(["AND", "OR"]),
                      st.lists(children, min_size=1, max_size=3)).map(
                lambda t: [t[0], *t[1]]
            ),
            # bare list = implicit AND
            st.lists(children, min_size=1, max_size=3),
        ),
        max_leaves=8,
    )


def kleene_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def kleene_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def evaluate(tree, assign):
    if isinstance(tree, int):
        return assign[tree]
    if isinstance(tree, list) and tree and tree[0] in ("AND", "OR"):
        op, children = tree[0], tree[1:]
    else:
        op, children = "AND", list(tree)
    vals = [evaluate(c, assign) for c in children]
    acc = vals[0]
    for v in vals[1:]:
        acc = kleene_and(acc, v) if op == "AND" else kleene_or(acc, v)
    return acc


@settings(max_examples=300, deadline=None)
@given(
    tree=trees(),
    values=st.lists(
        st.sampled_from([True, False, None]),
        min_size=N_LEAVES, max_size=N_LEAVES,
    ),
)
def test_normalize_preserves_kleene_semantics(tree, values):
    assign = {i + 1: v for i, v in enumerate(values)}
    norm = normalize_logic(tree)
    assert evaluate(tree, assign) == evaluate(norm, assign)


@settings(max_examples=200, deadline=None)
@given(tree=trees())
def test_normalize_is_idempotent_and_keeps_leaves(tree):
    norm = normalize_logic(tree)
    assert normalize_logic(norm) == norm
    assert sorted(set(logic_leaves(tree))) == sorted(set(logic_leaves(norm)))


@settings(max_examples=200, deadline=None)
@given(tree=trees())
def test_normalized_tree_has_no_nested_same_op(tree):
    def check(node):
        if isinstance(node, int):
            return
        op, children = node[0], node[1:]
        assert op in ("AND", "OR")
        for c in children:
            if isinstance(c, list):
                assert c[0] != op  # associativity fully flattened
                check(c)

    norm = normalize_logic(tree)
    if isinstance(norm, list):
        check(norm)
