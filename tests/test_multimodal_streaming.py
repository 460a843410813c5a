"""Multimodal column plumbing + streaming operators.

Multimodal: metadata/sniffing are real Catalyst exprs (oracle-checked
via constructed fixtures); decode/caption/frames are stubs — tests
pin the plumbing (schemas, 1→N explode, determinism).

Streaming: batch/stream parity — the same windowed aggregation over
events as an availableNow stream into a memory sink must equal the
batch result; the batch side gets a DuckDB time_bucket oracle.
"""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from semantic_olap_spark.functions.multimodal import (
    attach_binary_metadata,
    caption_media,
    image_features,
    sample_frames,
    sniff_format,
)
from semantic_olap_spark.streaming import (
    read_events_stream,
    session_agg,
    stream_dedup,
    windowed_agg,
)
from tests.conftest import assert_matches


def _media_df(spark):
    rows = [
        (0, b"\xff\xd8\xff\xe0JFIFxxxx"),
        (1, b"\x89PNG\r\n\x1a\nxxxx"),
        (2, b"GIF89a..."),
        (3, b"RIFF....WAVE"),
        (4, b"%PDF-1.7 ..."),
        (5, b"random bytes here"),
        (6, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "payload"])


def test_sniff_format_magic_bytes(spark):
    out = {
        r["doc_id"]: r["fmt"]
        for r in _media_df(spark).select(
            "doc_id", sniff_format(F.col("payload")).alias("fmt")
        ).collect()
    }
    assert out == {0: "jpeg", 1: "png", 2: "gif", 3: "riff", 4: "pdf",
                   5: "unknown", 6: None}


def test_attach_binary_metadata(spark):
    out = attach_binary_metadata(_media_df(spark)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["media_bytes"] == 12
    assert by_id[0]["media_format"] == "jpeg"
    assert by_id[0]["media_id"] == hashlib.md5(b"\xff\xd8\xff\xe0JFIFxxxx").hexdigest()


def test_image_features_null_payload_consistent_with_metadata(spark):
    out = image_features(_media_df(spark)).collect()
    nulls = [r for r in out if r["media_id"] is None]
    # the one NULL payload yields NULL id/features (same as
    # attach_binary_metadata), not the md5 of b''
    assert len(nulls) == 1
    assert nulls[0]["width"] is None and nulls[0]["mean_luma"] is None


def test_image_features_schema_and_determinism(spark):
    df = _media_df(spark).filter(F.col("payload").isNotNull())
    out = image_features(df).collect()
    assert len(out) == 6
    assert set(out[0].asDict()) == {"media_id", "width", "height", "mean_luma"}
    # deterministic across runs
    again = {r["media_id"]: (r["width"], r["height"]) for r in image_features(df).collect()}
    assert all((r["width"], r["height"]) == again[r["media_id"]] for r in out)


def test_sample_frames_explodes_rows(spark):
    df = _media_df(spark).filter(F.col("payload").isNotNull())
    out = sample_frames(df, n_frames=3)
    assert out.columns == ["doc_id", "frame_idx", "frame"]
    assert out.count() == 6 * 3
    one = out.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == [0, 1, 2]
    assert all(len(r["frame"]) == 16 for r in one)


def test_caption_media_contract(spark):
    out = caption_media(_media_df(spark)).collect()
    caps = {r["doc_id"]: r["caption"] for r in out}
    assert caps[0].startswith("media:")
    assert caps[0] == "media:" + hashlib.md5(b"\xff\xd8\xff\xe0JFIFxxxx").hexdigest()[:8]


def test_multimodal_over_documents_oracle(tables, duck):
    # binary plumbing over real driver data: encode text as payload
    df = attach_binary_metadata(
        tables["documents"].withColumn("payload", F.encode(F.col("text"), "utf-8"))
    ).select("doc_id", "media_bytes", "media_format", "media_id")
    assert_matches(
        df,
        duck,
        """
        SELECT doc_id,
               octet_length(encode(text)) AS media_bytes,
               'unknown' AS media_format,
               md5(text) AS media_id
        FROM documents
        """,
    )


# ---- streaming ---------------------------------------------------------


def test_windowed_agg_batch_oracle(tables, duck):
    out = windowed_agg(
        tables["events"], "ts", "1 hour", group_by=["event_type"],
        agg_col="value", aggs=("sum",),
    )
    assert_matches(
        out,
        duck,
        """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                   AS window_end,
               event_type,
               count(*) AS count,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2, 3
        """,
    )


def test_session_agg_batch(tables, duck):
    out = session_agg(tables["events"], "ts", "5 minutes", ["user_id"])
    # gaps-and-islands oracle: a new session starts when the gap from
    # the previous event of the same user exceeds 5 minutes
    assert_matches(
        out,
        duck,
        """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL '5 minutes'
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (
                     PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT min(ts) AS session_start,
               max(ts) + INTERVAL '5 minutes' AS session_end,
               user_id, count(*) AS count
        FROM sessions GROUP BY user_id, sid
        """,
    )


def test_stream_windowed_agg_matches_batch(spark, sf_dir, tables):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    agg = windowed_agg(
        stream, "ts", "1 hour", group_by=["event_type"],
        agg_col="value", aggs=("sum",), watermark="1 hour",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql("SELECT * FROM win_agg_test").toPandas()
    want = windowed_agg(
        tables["events"], "ts", "1 hour", group_by=["event_type"],
        agg_col="value", aggs=("sum",),
    ).toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_sem_filter_works_on_streams(spark, sf_dir, tables):
    # semantic operators are plain Arrow UDF transformations, so they
    # apply to streaming frames unchanged — stream/batch parity
    from semantic_olap_spark.operators.semantic import sem_filter
    from semantic_olap_spark.streaming import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    filtered = sem_filter(stream, ["event_type"], "error rows")
    assert filtered.isStreaming
    q = (
        filtered.writeStream.format("memory")
        .queryName("sem_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql("SELECT count(*) c FROM sem_stream_test").collect()[0]["c"]
    want = sem_filter(tables["events"], ["event_type"], "error rows").count()
    assert got == want > 0


def test_stream_dedup_batch_mode(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["event_id", "v"]
    )
    assert stream_dedup(df, ["event_id"]).count() == 2


def test_stream_dedup_streaming_end_to_end(spark, tmp_path):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    src = str(tmp_path / "dups")
    # two files with identical content → every id arrives twice
    df.coalesce(1).write.mode("overwrite").parquet(src)
    df.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql(
        "SELECT event_id FROM dedup_stream_test ORDER BY event_id"
    ).collect()
    assert [r["event_id"] for r in got] == list(range(10))


def test_stream_interval_join_matches_batch(spark, sf_dir, tables):
    from semantic_olap_spark.streaming import stream_interval_join

    def sides(src):
        left = src.filter(F.col("event_type") == "error").select(
            "event_id", "user_id", F.col("ts").alias("l_ts")
        )
        right = src.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        return left, right

    sl, sr = sides(read_events_stream(spark, sf_dir))
    joined = stream_interval_join(
        sl, sr, "l_ts", "r_ts", ["user_id"],
        lookback="30 minutes", watermark="1 hour",
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql(
        "SELECT event_id, r_ts, r_value FROM ssj_test"
    ).toPandas()
    bl, br = sides(tables["events"])
    want = stream_interval_join(
        bl, br, "l_ts", "r_ts", ["user_id"], lookback="30 minutes"
    ).select("event_id", "r_ts", "r_value").toPandas()
    key = ["event_id", "r_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_audio_features_stub_deterministic_and_null_safe(spark):
    import hashlib

    from semantic_olap_spark.functions.multimodal import audio_features

    df = spark.createDataFrame(
        [(0, b"abc"), (1, None), (2, b"abc")], ["doc_id", "payload"]
    )
    rows = audio_features(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # null payload → all-null feature row
    assert None in by_id and by_id[None][0]["duration_s"] is None
    mid = hashlib.md5(b"abc").hexdigest()
    feats = by_id[mid]
    assert len(feats) == 2  # identical content → identical features
    f = feats[0]
    assert f["duration_s"] >= 0.5 and f["sample_rate"] % 8000 == 0
    assert 0.0 <= f["rms"] <= 1.0
    assert feats[0] == feats[1]


def test_cleaning_ops_work_on_streams(spark, sf_dir):
    # stateless scan-side gates apply to streaming frames unchanged
    from semantic_olap_spark.functions.cleaning import (
        heuristic_filter,
        redact_pii,
    )
    from semantic_olap_spark.sources.loaders import load_table

    schema = load_table(spark, sf_dir, "documents").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    gated = heuristic_filter(redact_pii(stream), min_tokens=5)
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory")
        .queryName("clean_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql("SELECT count(*) c FROM clean_stream_test").collect()[0]["c"]
    want = heuristic_filter(
        redact_pii(load_table(spark, sf_dir, "documents")), min_tokens=5
    ).count()
    assert got == want > 0


def test_stream_interval_join_same_ts_name_and_outer_keys(spark):
    import datetime as dt

    from semantic_olap_spark.streaming import stream_interval_join

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t), (2, t)], ["user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(1, t - dt.timedelta(minutes=5), 1.5),
         (9, t, 9.9)],  # right-only user
        ["user_id", "ts", "value"],
    )
    # identical ts names on both sides must not be ambiguous
    out = stream_interval_join(
        left, right, "ts", "ts", ["user_id"], lookback="10 minutes",
        how="full",
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user[1][0]["value"] == 1.5
    assert by_user[2][0]["value"] is None        # left-unmatched
    assert 9 in by_user                          # right-only keeps its key
    assert by_user[9][0]["_r_ts"] is not None    # colliding ts exposed


def test_chunk_normalize_sentiment_work_on_streams(spark, sf_dir):
    # the round-3 stateless ops (normalize → chunk → sentiment col)
    # apply to streaming frames unchanged — no state, no watermark
    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.cleaning import normalize_text
    from semantic_olap_spark.functions.packing import chunk_documents
    from semantic_olap_spark.functions.text import sentiment_score
    from semantic_olap_spark.sources.loaders import load_table

    schema = load_table(spark, sf_dir, "documents").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )

    def pipe(df):
        return chunk_documents(
            normalize_text(df), size=32, overlap=8
        ).withColumn("sentiment", sentiment_score(F.col("chunk")))

    out = pipe(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("chunk_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql(
        "SELECT count(*) c, sum(n_chunk_tokens) t FROM chunk_stream_test"
    ).collect()[0]
    want = pipe(load_table(spark, sf_dir, "documents")).agg(
        F.count("*").alias("c"), F.sum("n_chunk_tokens").alias("t")
    ).collect()[0]
    assert (got["c"], got["t"]) == (want["c"], want["t"]) and got["c"] > 0


def test_dedup_against_works_on_streams(spark, sf_dir):
    # incremental ingest dedup is a stream-static left_anti join on
    # fingerprints — stateless on the stream side, supported by
    # Structured Streaming as-is
    from pyspark.sql import functions as F

    from semantic_olap_spark.functions.dedup import dedup_against
    from semantic_olap_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 3 == 0)
    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = dedup_against(stream, seen)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_against_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.sql(
        "SELECT count(*) c FROM dedup_against_stream"
    ).collect()[0]["c"]
    want = dedup_against(docs, seen).count()
    assert got == want
    # every surviving row's fingerprint is absent from seen
    assert want < docs.count()
