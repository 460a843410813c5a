"""CLI entry point (python -m semantic_olap_spark).

In-process invocations of __main__.main(): one-shot query, plan-only
mode, and the order-by parsing that must not swallow the positional
query.  The CLI's own spark.stop() is neutralized so the shared test
session survives.
"""

import json

import pytest

from semantic_olap_spark.__main__ import main


@pytest.fixture()
def keep_session(spark, monkeypatch):
    # main() calls get_spark() -> getOrCreate() -> the SHARED test
    # session; its finally-stop must not tear that down
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    return spark


def test_one_shot_query(keep_session, capsys):
    rc = main([
        "--data", "/root/testdata/sf0.001", "--table", "documents",
        "--order-by", "doc_id", "--limit", "5",
        "mentions spark in text",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "doc_id" in out and "spark" in out  # rows rendered


def test_plan_only_emits_replayable_json(keep_session, capsys):
    rc = main([
        "--data", "/root/testdata/sf0.001", "--table", "documents",
        "--order-by", "doc_id", "--plan-only",
        "mentions spark in text",
    ])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["operations"] and plan["operations"][0]["operator_name"]


def test_order_by_does_not_swallow_query(keep_session, capsys):
    # comma-separated --order-by immediately before the positional
    # query — the argparse footgun this arg shape exists to avoid
    rc = main([
        "--data", "/root/testdata/sf0.001", "--table", "events",
        "--order-by", "event_id,ts", "--limit", "3",
        "value above 100",
    ])
    assert rc == 0


def test_missing_query_errors(keep_session):
    with pytest.raises(SystemExit):
        main(["--data", "/root/testdata/sf0.001"])
