"""LLM JSON repair (reference Utils/jsonfy_result.py semantics)."""

from semantic_olap_spark.llm.repair import parse_llm_json


def test_plain_json():
    assert parse_llm_json('{"a": 1}') == {"a": 1}
    assert parse_llm_json("[1, 2]") == [1, 2]


def test_markdown_fence():
    assert parse_llm_json('```json\n{"a": 1}\n```') == {"a": 1}
    assert parse_llm_json('```\n["x"]\n```') == ["x"]


def test_prose_around_object():
    assert parse_llm_json('Sure! Here it is: {"a": 1}. Enjoy.') == {"a": 1}
    assert parse_llm_json("the list is [1, 2] ok") == [1, 2]


def test_comments_stripped():
    text = '{"a": 1, // inline\n "b": 2 /* block */}'
    assert parse_llm_json(text) == {"a": 1, "b": 2}


def test_python_literal_fallback():
    assert parse_llm_json("{'a': True, 'b': None}") == {"a": True, "b": None}


def test_default_on_garbage():
    assert parse_llm_json("no structure here", default={"x": 0}) == {"x": 0}
    assert parse_llm_json("", default=[]) == []


def test_nested_fence_with_prose_and_comment():
    text = 'Answer:\n```json\n{\n  "k": [1, 2], // ids\n  "t": "x"\n}\n```\ndone'
    assert parse_llm_json(text) == {"k": [1, 2], "t": "x"}
