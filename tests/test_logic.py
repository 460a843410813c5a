"""Logic-tree normalization and compilation (no Spark needed for most)."""

import pytest

from semantic_olap_spark.operators.logic import (
    logic_leaves,
    normalize_logic,
)


def test_normalize_bare_int():
    assert normalize_logic(1) == 1


def test_normalize_singleton_unwrap():
    assert normalize_logic([1]) == 1
    assert normalize_logic(["AND", 1]) == 1


def test_normalize_implicit_and():
    assert normalize_logic([1, 2, 3]) == ["AND", 1, 2, 3]


def test_normalize_merges_same_op():
    assert normalize_logic(["AND", 1, ["AND", 2, 3]]) == ["AND", 1, 2, 3]
    assert normalize_logic(["OR", ["OR", 1, 2], ["OR", 3]]) == ["OR", 1, 2, 3]


def test_normalize_keeps_mixed():
    assert normalize_logic(["AND", 1, ["OR", 2, 3]]) == ["AND", 1, ["OR", 2, 3]]


def test_leaves():
    assert logic_leaves(["AND", 1, ["OR", 2, 3]]) == [1, 2, 3]
    assert logic_leaves([4, 5]) == [4, 5]


def test_bad_nodes():
    with pytest.raises(ValueError):
        normalize_logic([])
    with pytest.raises(TypeError):
        normalize_logic("AND")


def test_compile_kleene_semantics(spark):
    """Spark's &/| are Kleene 3VL — the staged executor depends on it."""
    from pyspark.sql import functions as F

    from semantic_olap_spark.operators.logic import compile_logic, null_bool

    df = spark.range(1)
    tree = ["AND", 1, ["OR", 2, 3]]
    # 1=False, 2/3 pending(null) → False decides the AND
    col = compile_logic(tree, {1: F.lit(False), 2: null_bool(), 3: null_bool()})
    assert df.select(col.alias("x")).collect()[0]["x"] is False
    # 1=True, 2=True, 3 pending → OR already True → True
    col = compile_logic(tree, {1: F.lit(True), 2: F.lit(True), 3: null_bool()})
    assert df.select(col.alias("x")).collect()[0]["x"] is True
    # 1=True, 2=False, 3 pending → undecided (null)
    col = compile_logic(tree, {1: F.lit(True), 2: F.lit(False), 3: null_bool()})
    assert df.select(col.alias("x")).collect()[0]["x"] is None
