"""Regression pins for the round-3 review findings (r2-tail modules)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_top_frequent_default_returns_full_topk_on_uniform(spark):
    from semantic_olap_spark.functions.sketches import top_frequent

    rows = [(f"v{i % 50}",) for i in range(3000)]  # every value 60×
    df = spark.createDataFrame(rows, ["val"])
    assert top_frequent(df, "val", k=5).count() == 5
    # the opt-in support floor may legitimately return fewer
    assert top_frequent(df, "val", k=5, support=0.5).count() == 0


def test_snapshot_diff_explicit_empty_compare_is_membership_only(spark):
    from semantic_olap_spark.functions.quality import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    new = spark.createDataFrame([(1, "CHANGED"), (3, "c")], ["id", "v"])
    got = {
        r["id"]: r["change"]
        for r in snapshot_diff(old, new, "id", compare=[]).collect()
    }
    # id=1 differs in v but compare=[] asked for membership only
    assert got == {2: "removed", 3: "added"}


def test_pivot_agg_refuses_colliding_sanitized_names(spark):
    from semantic_olap_spark.operators.reshape import pivot_agg

    df = spark.createDataFrame(
        [("g", "a.b", 1.0), ("g", "a_b", 2.0)], ["grp", "cat", "v"]
    )
    with pytest.raises(ValueError, match="collide"):
        pivot_agg(df, ["grp"], "cat", ["a.b", "a_b"], "v")


def test_write_zordered_preserves_user_zkey_column(spark, tmp_path):
    from semantic_olap_spark.sources.layout import write_zordered

    df = spark.createDataFrame(
        [(i, float(i), "keepme") for i in range(100)],
        ["x", "y", "_zkey"],
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["x", "y"], bits=3, num_files=2)
    back = spark.read.parquet(out)
    assert "_zkey" in back.columns
    assert back.filter(F.col("_zkey") == "keepme").count() == 100


def test_fuzzy_join_same_named_key_columns(spark):
    from semantic_olap_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [("acme corp", "b1")], ["name", "blk"]
    )
    right = spark.createDataFrame(
        [("acme corp.", "b1"), ("zzz", "b1")], ["name", "blk"]
    )
    got = fuzzy_join(left, right, "name", "name", block_col="blk").collect()
    assert len(got) == 1
    assert got[0]["name"] == "acme corp"
    assert got[0]["name_right"] == "acme corp."
    assert got[0]["edit_distance"] == 1


def test_rolling_agg_subsecond_events_not_peers(spark):
    from semantic_olap_spark.functions.timeseries import rolling_agg

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base + dt.timedelta(milliseconds=100), 1.0),
        (1, base + dt.timedelta(milliseconds=900), 10.0),
    ]
    df = spark.createDataFrame(rows, ["uid", "ts", "value"])
    out = {
        r["ts"].microsecond: r["sum_value_1_hour"]
        for r in rolling_agg(
            df, "ts", "value", "uid", window="1 hour", aggs=("sum",)
        ).collect()
    }
    # the .100 row must NOT see the .900 value from its future
    assert out[100_000] == 1.0
    assert out[900_000] == 11.0


def test_quality_report_empty_input_zero_violations(spark):
    from semantic_olap_spark.functions.quality import quality_report

    empty = spark.createDataFrame([], "x INT")
    rows = quality_report(empty, [{"not_null": "x"}]).collect()
    assert rows[0]["violations"] == 0
    assert rows[0]["pass_rate"] == 1.0


def test_fuzzy_pairs_shuffle_mode_no_extra_repartition(spark):
    import io
    from contextlib import redirect_stdout

    from semantic_olap_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        [(i, f"word{i}", i % 3) for i in range(60)], ["id", "w", "blk"]
    )
    out = fuzzy_pairs(df, "w", "id", block_col="blk", broadcast=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "RoundRobinPartitioning" not in plan


# ---- second review batch (round-3 modules) ----


def test_bpe_encode_ascii_whitespace_matches_training_split(spark):
    # word_counts splits on the Java regex \s+ (ASCII); encoding must
    # tokenize identically or learned merges never apply (NBSP case).
    from semantic_olap_spark.functions.bpe import (
        bpe_encode,
        learn_bpe,
        word_counts,
    )

    df = spark.createDataFrame([("a b a b cc",)], ["text"])
    wc = dict(word_counts(df, "text"))
    assert "a b" in wc and wc["a b"] == 2
    merges = learn_bpe(df, "text", num_merges=5)
    toks = bpe_encode(df, merges, "text").select("bpe_tokens").first()[0]
    # the NBSP word must survive as one word: its pieces reassemble it
    joined = "".join(toks)
    assert "a b" in joined.replace("</w>", "")


def test_reservoir_sample_duplicate_keys_partition_invariant(spark):
    from semantic_olap_spark.functions.sampling import reservoir_sample

    rows = [(f"k{i % 4}", f"payload{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["key", "payload"])
    a = sorted(map(tuple, reservoir_sample(df.repartition(1), 7, "key").collect()))
    b = sorted(map(tuple, reservoir_sample(df.repartition(13), 7, "key").collect()))
    assert a == b


def test_weighted_sample_n_duplicate_keys_partition_invariant(spark):
    from semantic_olap_spark.functions.sampling import weighted_sample_n

    rows = [(f"k{i % 4}", f"payload{i}", 1.0 + (i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, ["key", "payload", "w"])
    a = sorted(
        map(tuple, weighted_sample_n(df.repartition(1), 7, "w", "key").collect())
    )
    b = sorted(
        map(tuple, weighted_sample_n(df.repartition(13), 7, "w", "key").collect())
    )
    assert a == b


def test_parse_llm_json_mismatched_brackets_extracts_embedded_object():
    from semantic_olap_spark.llm.repair import parse_llm_json

    assert parse_llm_json('[1] See answer: {"x": 2}') == {"x": 2}


def test_sampling_all_exports_weighted_ops():
    from semantic_olap_spark.functions import sampling

    assert "weighted_sample" in sampling.__all__
    assert "weighted_sample_n" in sampling.__all__


# ---- third review batch ----


def test_from_star_keeps_fact_column_sharing_dim_key_name(spark):
    from semantic_olap_spark.engine import OlapEngine

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 7.0)], ["id", "cust_id", "amount"]
    )
    dim = spark.createDataFrame([(10, "alice"), (20, "bob")], ["id", "name"])
    eng = OlapEngine.from_star(fact, [(dim, "cust_id", "id")])
    root = eng.memory.nodes[eng.memory.root_id]
    assert "id" in root.df.columns and "name" in root.df.columns
    got = {r["id"]: r["name"] for r in root.df.select("id", "name").collect()}
    assert got == {1: "alice", 2: "bob"}


def test_react_loop_survives_malformed_actions(spark):
    from semantic_olap_spark.engine import OlapEngine

    class OneShotLLM:
        def __init__(self, payload):
            self.payload = payload

        def predict(self, prompt):
            p, self.payload = self.payload, "{}"
            return p

        def predict_batch(self, prompts):
            return [self.predict(p) for p in prompts]

    for bad in (
        '{"thought":"t","action":"roll_up"}',
        '{"thought":"t","action":{"type":"roll_up","params":{}}}',
        '{"thought":"t","action":{"type":"drill_down","params":{}}}',
        '{"action":{"type":"roll_up","params":"nope"}}',
    ):
        df = spark.createDataFrame([("a", 1.0)], ["grp", "v"])
        e = OlapEngine(df, llm_factory=lambda b=bad: OneShotLLM(b))
        node = e.memory.nodes[e.memory.root_id]
        assert e._run_analysis("analyze grp", node) is not None


def test_finalize_agg_round_to_applies_to_sum(spark):
    from semantic_olap_spark.functions.incremental import agg_state, finalize_agg

    small = spark.createDataFrame(
        [("g", 0.001234), ("g", 0.002222)], ["g", "rate"]
    )
    st = agg_state(small, ["rate"], group_by="g")
    assert (
        abs(finalize_agg(st, ["rate"], round_to=6).collect()[0]["rate_sum"]
            - 0.003456) < 1e-12
    )


def test_range_join_rejects_shared_non_key_columns(spark):
    from semantic_olap_spark.operators.relational import range_join

    L = spark.createDataFrame([(5, "x")], ["ts", "value"])
    R = spark.createDataFrame([(0, 10, "y")], ["start", "end", "value"])
    with pytest.raises(ValueError, match="value"):
        range_join(L, R, "ts", "start", "end")


def test_profile_columns_hostile_names_and_empty(spark):
    from semantic_olap_spark.functions.profiling import profile_columns

    h = spark.createDataFrame([(1.5, "a")], ["it's", "we`ird"])
    prof = {r["column"]: r for r in profile_columns(h).collect()}
    assert prof["it's"]["max_num"] == 1.5
    assert prof["we`ird"]["n_distinct"] == 1
    with pytest.raises(ValueError):
        profile_columns(h, cols=[])


def test_chunk_documents_rejects_output_column_collision(spark):
    from semantic_olap_spark.functions.packing import chunk_documents

    df = spark.createDataFrame([("a b c", "x")], ["text", "chunk"])
    with pytest.raises(ValueError, match="chunk"):
        chunk_documents(df, size=2)


# ---- fourth review batch (streaming / sketches / stats / timeseries) ----


def test_sessionize_subsecond_gap_boundary(spark):
    from semantic_olap_spark.functions.timeseries import sessionize

    rows = [
        ("u", dt.datetime(2024, 1, 1, 0, 0, 10, 100000)),
        ("u", dt.datetime(2024, 1, 1, 0, 0, 40, 900000)),  # gap 30.8s
        ("v", dt.datetime(2024, 1, 1, 0, 0, 10, 900000)),
        ("v", dt.datetime(2024, 1, 1, 0, 0, 40, 800000)),  # gap 29.9s
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["user_id"], r["ts"]): r["session_id"]
        for r in sessionize(df, "ts", "user_id", gap="30 seconds").collect()
    }
    assert got[("u", rows[1][1])] == 2  # 30.8s > 30s: new session
    assert got[("v", rows[3][1])] == 1  # 29.9s <= 30s: same session


def test_top_frequent_support_floor_not_truncated(spark):
    from semantic_olap_spark.functions.sketches import top_frequent

    # 250 rows: 'a'×248, 'b'×2 — support 0.01 → floor 2.5; 'b' (2 < 2.5)
    # must be dropped, not admitted via long-truncation to 2
    rows = [("a",)] * 248 + [("b",)] * 2
    df = spark.createDataFrame(rows, ["val"])
    vals = {r["value"] for r in top_frequent(df, "val", k=5, support=0.01).collect()}
    assert vals == {"a"}


def test_windowed_agg_accepts_string_group_by(spark):
    from semantic_olap_spark.streaming.windows import session_agg, windowed_agg

    df = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 0, 0, 5), 1.0)],
        ["user_id", "ts", "value"],
    )
    out = windowed_agg(df, group_by="user_id", agg_col="value")
    assert "user_id" in out.columns and out.count() == 1
    out2 = session_agg(df, group_by="user_id")
    assert "user_id" in out2.columns and out2.count() == 1


def test_histogram_rejects_explicit_degenerate_bounds(spark):
    from semantic_olap_spark.functions.stats import histogram

    df = spark.createDataFrame([(5.7,)], ["x"])
    with pytest.raises(ValueError, match="hi > lo"):
        histogram(df, "x", bins=1, lo=5.0, hi=5.0)
    # computed degenerate bounds (all values equal) still widen
    same = spark.createDataFrame([(5.0,), (5.0,)], ["x"])
    assert histogram(same, "x", bins=1).collect()[0]["n"] == 2


# ---- fifth review batch (semantic / plans core) ----


def test_filter_pattern_cond_skips_out_of_range_group(spark):
    from semantic_olap_spark.operators.semantic import filter_pattern_cond

    class BadGroupLLM:
        def predict(self, prompt):
            # 1 capture group in the regex, but conditions index group 2
            return (
                '{"regex": "ERR-([0-9]+)", "logic": "and", "conditions": '
                '[{"group": 2, "operator": ">", "threshold": 100}]}'
            )

        def predict_batch(self, prompts):
            return [self.predict(p) for p in prompts]

    df = spark.createDataFrame([("ERR-500",), ("ERR-50",)], ["code"])
    out = df.filter(
        filter_pattern_cond(df, "code", "code > 100", lambda: BadGroupLLM())
    )
    # the malformed plan skips the template (no rows) instead of
    # crashing mid-scan with a regexp_extract group-count error
    assert out.count() == 0


def test_sem_join_prefilter_lossless_when_token_matches_column_name(tables):
    from semantic_olap_spark.operators.semantic import sem_join

    docs = tables["documents"].limit(50)
    # the right value 'text' equals the LEFT COLUMN NAME: the judge
    # sees "text: ..." lines and answers Yes, so the prefilter must
    # not prune these pairs
    right = docs.sparkSession.createDataFrame([("text",)], ["topic"])
    a = {
        (r["doc_id"], r["topic"])
        for r in sem_join(docs, right, ["text"], ["topic"], "covers").collect()
    }
    b = {
        (r["doc_id"], r["topic"])
        for r in sem_join(
            docs, right, ["text"], ["topic"], "covers", prefilter=False
        ).collect()
    }
    assert a == b and a


def test_drill_down_plan_records_real_columns(spark):
    from semantic_olap_spark.plans.memory import CubeMemory
    from semantic_olap_spark.plans.rollup import drill_down

    df = spark.createDataFrame(
        [("scan heavy workload", "db1"), ("join heavy workload", "db2")],
        ["text", "db"],
    )
    mem = CubeMemory(df)
    _, _ = drill_down(mem, mem.root_id, "topic", "topic of the text")
    node = mem.nodes[mem.root_id]
    dim = node.dimension("topic")
    gv = list(dim.granularities.values())[-1]
    recorded = gv.plan[0]["parameters"]["columns"]
    assert "text" in recorded and "db" in recorded


def test_executor_lineage_keeps_filter_group_subplan(spark):
    from semantic_olap_spark.plans.executor import PlanExecutor

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    ex = PlanExecutor()
    step = {
        "operator_name": "filter_group",
        "parameters": {},
        "operations": [
            {
                "id": 1,
                "operator_name": "num_filter",
                "parameters": {
                    "conditions": [
                        {"column": "id", "operator": ">", "threshold": 1}
                    ]
                },
            }
        ],
        "logic": [1],
    }
    out = ex.execute_step(df, step)
    assert out.count() == 1
    assert ex.lineage[-1]["operations"] is not None
    assert ex.lineage[-1]["logic"] == [1]


def test_profile_enumerable_counts_nulls_in_total(spark):
    from semantic_olap_spark.plans.planner import profile_enumerable

    # 5 distinct values over 100 non-null rows + 900 nulls: with
    # nulls in n_total the unique ratio is 5/1000 <= 0.05 even if
    # n_unique > max_unique is forced low
    rows = [(f"v{i % 5}",) for i in range(100)] + [(None,)] * 900
    df = spark.createDataFrame(rows, ["c"])
    assert profile_enumerable(df, "c", max_unique=3, max_ratio=0.05)


# ---- sixth review batch (similarity / loaders / analytics) ----


def test_zero_norm_embeddings_do_not_crash_ansi(spark):
    from semantic_olap_spark.functions.similarity import (
        cosine_pairs,
        quantize_index,
    )

    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.0, 0.0]),  # hash_embed of blank text
        ("c", [0.8, 0.6]),
    ]
    df = spark.createDataFrame(rows, ["id", "embedding"])
    pairs = cosine_pairs(
        df, threshold=0.1, id_col="id", allow_unblocked=True
    ).collect()
    # zero vector has similarity 0 with everything: never paired
    assert all("b" not in (r["id_a"], r["id_b"]) for r in pairs)
    qi = quantize_index(df)
    row_b = qi.filter(F.col("id") == "b").collect()[0]
    assert row_b["_qs"] == 0.0 and all(v == 0 for v in row_b["_qv"])


def test_load_csv_corrupt_col_with_ddl_schema(spark, tmp_path):
    from semantic_olap_spark.sources.loaders import load_csv

    p = str(tmp_path / "rows.csv")
    (tmp_path / "rows.csv").write_text("a,b\n1,x\nnotanint,y\n")
    out = load_csv(spark, p, schema="a INT, b STRING", corrupt_col="_bad")
    rows = {r["b"]: r["_bad"] for r in out.collect()}
    assert rows["x"] is None and rows["y"] is not None
    with pytest.raises(ValueError, match="explicit schema"):
        load_csv(spark, p, corrupt_col="_bad")


def test_flatten_json_col_rejects_non_object(spark):
    from semantic_olap_spark.sources.loaders import flatten_json_col

    df = spark.createDataFrame([("[1,2,3]",)], ["props"])
    with pytest.raises(ValueError, match="objects"):
        flatten_json_col(df, "props")


def test_running_totals_rejects_fractional_values(spark):
    from semantic_olap_spark.sources.loaders import running_totals

    df = spark.createDataFrame([("a", 1.5)], ["k", "v"])
    with pytest.raises(TypeError, match="integral"):
        running_totals(df, ["k"], "v", "_cum")


# ---- seventh review batch (logic / reshape / multimodal / session) ----


def test_normalize_logic_rejects_childless_op(spark):
    from semantic_olap_spark.operators.logic import normalize_logic

    with pytest.raises(ValueError, match="no children"):
        normalize_logic(["AND"])
    with pytest.raises(ValueError, match="no children"):
        normalize_logic(["OR"])


def test_pivot_agg_rejects_group_col_collision(spark):
    from semantic_olap_spark.operators.reshape import pivot_agg

    df = spark.createDataFrame(
        [("status_a", "a", 1.0)], ["status_a", "status", "v"]
    )
    with pytest.raises(ValueError, match="group_cols"):
        pivot_agg(
            df,
            group_cols=["status_a"],
            pivot_col="status",
            pivot_values=["a"],
            value_col="v",
        )


def test_sample_frames_null_payload_yields_no_frames(spark):
    from semantic_olap_spark.functions.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)],
        "doc_id INT, payload BINARY",
    )
    out = sample_frames(df, n_frames=3).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 3


def test_get_spark_shuffle_partitions_reads_env_at_call_time():
    import os

    from semantic_olap_spark.session import _default_shuffle_partitions

    old = os.environ.get("SPARK_GRAFT_CPUS")
    try:
        os.environ["SPARK_GRAFT_CPUS"] = "7"
        assert _default_shuffle_partitions() == 7
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_CPUS", None)
        else:
            os.environ["SPARK_GRAFT_CPUS"] = old
