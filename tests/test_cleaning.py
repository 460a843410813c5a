"""Unit tests for functions/cleaning.py (PII, repetition, decontam,
token-budget curation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_olap_spark.functions.cleaning import (
    decontaminate,
    heuristic_filter,
    redact_pii,
    repetition_profile,
    take_token_budget,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


class TestRedactPii:
    def test_each_kind_redacted_and_counted(self, spark):
        df = _docs(spark, [
            "mail bob.smith+x@corp.example.org now",
            "see https://a.example.com/path?q=1 there",
            "host 192.168.10.254 down",
            "call +1415-555 0199 today",
        ])
        out = {r["doc_id"]: r for r in redact_pii(df).collect()}
        assert out[0]["text"] == "mail <EMAIL> now"
        assert out[0]["n_email"] == 1 and out[0]["n_url"] == 0
        assert out[1]["text"] == "see <URL> there"
        assert out[1]["n_url"] == 1
        assert out[2]["text"] == "host <IP> down"
        assert out[2]["n_ip"] == 1
        assert out[3]["text"] == "call <PHONE> today"
        assert out[3]["n_phone"] == 1

    def test_ip_inside_url_counts_once_as_url(self, spark):
        df = _docs(spark, ["go http://10.0.0.1/admin now"])
        row = redact_pii(df).collect()[0]
        assert row["text"] == "go <URL> now"
        assert row["n_url"] == 1
        assert row["n_ip"] == 0

    def test_kinds_subset_and_out_col(self, spark):
        df = _docs(spark, ["a@b.io at 1.2.3.4"])
        out = redact_pii(df, out_col="clean", kinds=["email"]).collect()[0]
        assert out["clean"] == "<EMAIL> at 1.2.3.4"
        assert out["text"] == "a@b.io at 1.2.3.4"  # original kept
        assert "n_ip" not in out.asDict()

    def test_unknown_kind_raises(self, spark):
        with pytest.raises(ValueError, match="unknown PII"):
            redact_pii(_docs(spark, ["x"]), kinds=["ssn"])


class TestRepetitionProfile:
    def test_metrics_hand_computed(self, spark):
        # "a a a b": top=3/4, bigrams: 'a a','a a','a b' -> dup 1/3
        # mean len 1.0, no symbols
        row = repetition_profile(_docs(spark, ["a a a b"])).collect()[0]
        assert row["top_token_frac"] == 0.75
        assert row["dup_2gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert row["mean_token_len"] == 1.0
        assert row["symbol_ratio"] == 0.0

    def test_symbols_and_blank(self, spark):
        rows = {r["doc_id"]: r for r in repetition_profile(
            _docs(spark, ["ab, cd!", "   "])
        ).collect()}
        # "ab, cd!": 7 chars, 2 symbols
        assert rows[0]["symbol_ratio"] == pytest.approx(2 / 7, abs=1e-6)
        assert rows[1]["top_token_frac"] == 0.0
        assert rows[1]["mean_token_len"] == 0.0

    def test_single_token_no_bigrams(self, spark):
        row = repetition_profile(_docs(spark, ["hello"])).collect()[0]
        assert row["dup_2gram_frac"] == 0.0
        assert row["top_token_frac"] == 1.0


class TestHeuristicFilter:
    def test_gates(self, spark):
        good = "the quick brown fox jumps over the lazy dog again and again"
        repeat = " ".join(["spam"] * 30)
        short = "too short"
        symbols = "a b c d e f g h i j k l @@ ## $$ %% ^^ && ** (( )) !!"
        df = _docs(spark, [good, repeat, short, symbols])
        kept = {r["doc_id"] for r in heuristic_filter(
            df, min_tokens=10, max_symbol_ratio=0.1,
            max_top_token_frac=0.3,
        ).collect()}
        assert kept == {0}

    def test_schema_unchanged(self, spark):
        df = _docs(spark, ["the quick brown fox jumps over the dog " * 3])
        assert heuristic_filter(df).columns == df.columns


class TestDecontaminate:
    def test_planted_overlap_dropped(self, spark):
        bench = _docs(spark, ["alpha beta gamma delta epsilon"])
        corpus = spark.createDataFrame(
            [
                (10, "x y alpha beta gamma z w"),     # shares 3-gram
                (11, "totally unrelated words here"),
                (12, "alpha beta unrelated gamma"),   # only a 2-gram
            ],
            ["doc_id", "text"],
        )
        kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect()}
        assert kept == {11, 12}

    def test_short_doc_whole_text_gram(self, spark):
        bench = _docs(spark, ["tiny doc"])
        corpus = spark.createDataFrame(
            [(1, "tiny doc"), (2, "other thing")], ["doc_id", "text"]
        )
        kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect()}
        assert kept == {2}

    def test_no_overlap_identity(self, spark):
        bench = _docs(spark, ["p q r s t"])
        corpus = spark.createDataFrame(
            [(1, "a b c d e f")], ["doc_id", "text"]
        )
        assert decontaminate(corpus, bench, n=3).count() == 1


class TestTakeTokenBudget:
    def test_greedy_prefix(self, spark):
        # scores order docs 2,0,1; token counts 3,2,4
        df = spark.createDataFrame(
            [(0, "a b", 5), (1, "c d e f", 1), (2, "x y z", 9)],
            ["doc_id", "text", "score"],
        )
        kept = {r["doc_id"]: r["n_tokens"] for r in take_token_budget(
            df, budget=5, score_col="score"
        ).collect()}
        # doc2 (3 toks, cum 3) + doc0 (2 toks, cum 5) fit; doc1 would hit 9
        assert kept == {2: 3, 0: 2}

    def test_tiebreak_by_id(self, spark):
        df = spark.createDataFrame(
            [(3, "a b c", 1), (1, "d e f", 1), (2, "g h i", 1)],
            ["doc_id", "text", "score"],
        )
        kept = {r["doc_id"] for r in take_token_budget(
            df, budget=6, score_col="score"
        ).collect()}
        assert kept == {1, 2}

    def test_token_col_passthrough_and_errors(self, spark):
        df = spark.createDataFrame(
            [(0, "irrelevant", 2, 10)], ["doc_id", "text", "score", "nt"]
        )
        out = take_token_budget(df, budget=10, score_col="score",
                                token_col="nt").collect()
        assert out[0]["n_tokens"] == 10
        with pytest.raises(ValueError, match="budget"):
            take_token_budget(df, budget=0, score_col="score")

    def test_no_helper_columns_leak(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c", 1)], ["doc_id", "text", "score"]
        )
        out = take_token_budget(df, budget=100, score_col="score")
        assert set(out.columns) == {"doc_id", "text", "score", "n_tokens"}


class TestPlanSteps:
    def test_cleaning_ops_in_plan_language(self, spark):
        from semantic_olap_spark.plans.executor import PlanExecutor

        df = _docs(spark, [
            "the quick brown fox jumps over the lazy dog today ok fine",
            " ".join(["dup"] * 25),
        ])
        ex = PlanExecutor()
        out = ex.execute(df, [
            {"operator": "redact_pii", "params": {}},
            {"operator": "heuristic_filter",
             "params": {"min_tokens": 5, "max_top_token_frac": 0.5}},
            {"operator": "repetition_profile", "params": {}},
            {"operator": "take_token_budget",
             "params": {"budget": 100, "score_col": "doc_id"}},
        ])
        rows = out.collect()
        assert [r["doc_id"] for r in rows] == [0]
        assert "top_token_frac" in out.columns


def test_new_ops_as_plan_steps(spark):
    from semantic_olap_spark.plans.executor import PlanExecutor

    df = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "beta gamma delta")],
        ["doc_id", "text"],
    )
    ex = PlanExecutor()
    out = ex.execute(df, [
        {"operator": "ngram_lm_score", "params": {}},
        {"operator": "bm25_topk", "params": {"query": "alpha", "k": 1}},
    ])
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert "lm_score" in out.columns and "bm25" in out.columns

    import datetime as dt
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "view"),
         (1, dt.datetime(2024, 1, 1, 1), "click")],
        ["user_id", "ts", "event_type"],
    )
    fun = ex.execute(ev, [{"operator": "funnel",
                           "params": {"steps": ["view", "click"]}}])
    assert {r["name"]: r["users"] for r in fun.collect()} == {
        "view": 1, "click": 1,
    }
    coh = ex.execute(ev, [{"operator": "cohort_retention", "params": {}}])
    assert coh.collect()[0]["users"] == 1


def test_take_token_budget_null_text_consumes_zero(spark):
    from pyspark.sql import types as T

    from semantic_olap_spark.functions.cleaning import take_token_budget

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.LongType()),
    ])
    df = spark.createDataFrame(
        [(0, "a b c", 2), (1, None, 3), (2, "d e", 1)], schema
    )
    rows = {r["doc_id"]: r["n_tokens"] for r in take_token_budget(
        df, budget=5, score_col="score"
    ).collect()}
    # NULL doc counts 0 tokens (not NULL) and doesn't corrupt the
    # running total: order is doc1(0) -> doc0(3) -> doc2(2), cum 5
    assert rows == {1: 0, 0: 3, 2: 2}


def test_heuristic_filter_rejects_metric_column_collision(spark):
    from semantic_olap_spark.functions.cleaning import (
        heuristic_filter,
        repetition_profile,
    )

    df = repetition_profile(
        spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    )
    with pytest.raises(ValueError, match="overwrite"):
        heuristic_filter(df)


def test_contamination_report_consistent_with_decontaminate(tables):
    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.cleaning import (
        contamination_report,
        decontaminate,
    )

    docs = tables["documents"]
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    report = contamination_report(corpus, bench, n=4)
    # severity-0 rows are exactly decontaminate's survivors
    clean_ids = {
        r["doc_id"]
        for r in report.filter(~F.col("contaminated"))
        .select("doc_id").collect()
    }
    survivors = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, n=4).select("doc_id").collect()
    }
    assert clean_ids == survivors
    # report keeps every corpus row and counts are non-negative
    assert report.count() == corpus.count()
    assert report.filter(F.col("n_contaminated_grams") < 0).count() == 0


def test_contamination_report_hand_case(spark):
    from semantic_olap_spark.functions.cleaning import contamination_report

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (0, "x alpha beta gamma delta y"),       # 1 shared 4-gram? two!
            (1, "alpha beta gamma delta epsilon z"), # several shared
            (2, "totally different words here now"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in contamination_report(corpus, bench, n=4).collect()
    }
    # bench distinct 4-grams: "alpha beta gamma delta",
    # "beta gamma delta epsilon"
    assert got[0] == (1, True)
    assert got[1] == (2, True)
    assert got[2] == (0, False)


def test_contamination_report_plan_step(tables, spark):
    from pyspark.sql import functions as F

    from semantic_olap_spark.plans.executor import PlanExecutor

    docs = tables["documents"]
    docs.filter(F.col("source") == "src0").createOrReplaceTempView(
        "bench_src0"
    )
    out = PlanExecutor().execute(
        docs.filter(F.col("source") != "src0"),
        [{"operator": "contamination_report",
          "params": {"benchmark_view": "bench_src0", "n": 4}}],
    )
    assert "n_contaminated_grams" in out.columns
    assert out.count() > 0
    with __import__("pytest").raises(ValueError):
        PlanExecutor().execute(
            docs, [{"operator": "contamination_report", "params": {}}]
        )


class TestRepetitionCountsUdf:
    """r13: top/dup-bigram counts moved to an Arrow integer UDF
    (guide §4.2); these pin the edge semantics the old Catalyst
    folds defined and that the ratios above rely on."""

    def test_null_text_yields_null_metrics(self, spark):
        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        row = repetition_profile(df).collect()[0]
        assert row["top_token_frac"] is None
        assert row["dup_2gram_frac"] is None

    def test_one_python_eval_node(self, spark):
        # both counts must come from ONE ArrowEvalPython (a second
        # would double the token shipping)
        plan = (
            repetition_profile(_docs(spark, ["a b c"]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1

    def test_counts_match_brute_force(self, spark):
        from collections import Counter

        texts = [
            "a a a b", "x", "", "  ", "a B a b A", "w1 w2 w1 w2 w1",
            "tab\tsep\nlines", "sym!@# sym!@# other",
        ]
        rows = {
            r["doc_id"]: r
            for r in repetition_profile(_docs(spark, texts)).collect()
        }
        for i, t in enumerate(texts):
            toks = t.lower().split()
            n = len(toks)
            top = max(Counter(toks).values()) / n if n else 0.0
            grams = list(zip(toks, toks[1:]))
            dup = (
                1.0 - len(set(grams)) / len(grams)
                if len(grams) else 0.0
            )
            assert rows[i]["top_token_frac"] == pytest.approx(
                round(top, 6), abs=0
            ), t
            assert rows[i]["dup_2gram_frac"] == pytest.approx(
                round(dup, 6), abs=1e-9
            ), t
