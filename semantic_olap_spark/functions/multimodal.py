"""Multimodal columns: binary payloads with typed metadata.

Beyond-reference operators (SURVEY.md §7.1 M7; BASELINE.json north
star).  The column contract: media travel as an opaque ``binary``
column plus typed metadata columns; every transform is either a pure
Catalyst expression over the bytes (sniffing, sizing) or an
Arrow-batched ``mapInPandas``/``pandas_udf`` whose schema,
partitioning and batch shape are real.

The actual codec work (JPEG decode, audio resample, video frame
extraction) requires media libraries this environment does not ship.
Those steps are STUBBED — a clearly-marked deterministic fake keyed
on the content hash — behind the real Spark plumbing, so swapping in
Pillow/ffmpeg later changes only the inner function body:

- ``sniff_format`` / ``attach_binary_metadata`` — REAL (magic-byte
  dispatch + byte length, pure Catalyst, codegen-friendly).
- ``image_features`` — STUB decode (hash-derived width/height/luma),
  real Arrow batch pass.
- ``sample_frames`` — STUB frame extraction (hash-derived bytes),
  real row-explode plumbing via ``mapInPandas`` (1→N rows).
- ``caption_media`` — STUB captioner behind the ``llm.predict``
  protocol, same contract as the text operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes, hex-encoded (first bytes of the payload)
_MAGIC = (
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("474946", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("25504446", "pdf"),
    ("000000", "mp4_maybe"),
)


def sniff_format(binary_col: Column) -> Column:
    """Container format from magic bytes — pure Catalyst CASE chain."""
    head = F.hex(F.substring(binary_col, 1, 4))
    expr = F.lit("unknown")
    for prefix, fmt in reversed(_MAGIC):
        expr = F.when(head.startswith(prefix), F.lit(fmt)).otherwise(expr)
    return F.when(binary_col.isNull(), F.lit(None)).otherwise(expr)


def attach_binary_metadata(
    df: DataFrame, binary_col: str = "payload"
) -> DataFrame:
    """Typed metadata columns: byte size, sniffed format, content id.

    All JVM-side: at 100 TB this runs at scan speed and the content
    id (md5) doubles as the exact-dedup key for media.
    """
    c = F.col(binary_col)
    return (
        df.withColumn("media_bytes", F.length(c))
        .withColumn("media_format", sniff_format(c))
        .withColumn("media_id", F.md5(c))
    )


_IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB decode — deterministic pseudo-features from the content
    hash.  Replace the body with a real decoder (PIL.Image.open →
    size + luma) when media libs are available; the signature and
    batch shape stay the same."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def image_features(
    df: DataFrame, binary_col: str = "payload"
) -> DataFrame:
    """Per-image features via an Arrow-batched ``mapInPandas``.

    Output: one row per input image ``(media_id, width, height,
    mean_luma)``.  The decode step is the stub above; the Spark side
    (schema, batch iteration, column pruning to just the binary
    column) is production-shaped.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "mean_luma": []}
            for payload in pdf[binary_col]:
                if payload is None:
                    # consistent with attach_binary_metadata: NULL
                    # payload → NULL media_id/features (md5(b'')
                    # would collide every null row into one fake id)
                    for k in out:
                        out[k].append(None)
                    continue
                b = bytes(payload)
                w, h, luma = _fake_decode(b)
                out["media_id"].append(hashlib.md5(b).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return df.select(binary_col).mapInPandas(run, schema=_IMAGE_FEATURES_SCHEMA)


_AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _fake_audio_decode(payload: bytes) -> tuple[float, int, float]:
    """STUB decode — deterministic pseudo-features from the content
    hash (same contract as ``_fake_decode``).  A real implementation
    reads the container header / PCM frames (soundfile/ffprobe); the
    signature and batch shape stay the same."""
    h = hashlib.md5(payload).digest()
    duration_s = 0.5 + h[3] / 16.0  # dyadic: exact in float and SQL
    sample_rate = 8000 * (1 + h[4] % 5)
    rms = round(h[5] / 255.0, 6)
    return duration_s, sample_rate, rms


def audio_features(
    df: DataFrame, binary_col: str = "payload"
) -> DataFrame:
    """Per-clip audio features via an Arrow-batched ``mapInPandas``.

    Output: one row per clip ``(media_id, duration_s, sample_rate,
    rms)``.  Decode is the stub above; the Spark plumbing (schema,
    batch iteration, pruning to the binary column) is
    production-shaped — the audio analog of :func:`image_features`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "duration_s": [], "sample_rate": [], "rms": [],
            }
            for payload in pdf[binary_col]:
                if payload is None:
                    for k in out:
                        out[k].append(None)
                    continue
                b = bytes(payload)
                dur, sr, rms = _fake_audio_decode(b)
                out["media_id"].append(hashlib.md5(b).hexdigest())
                out["duration_s"].append(dur)
                out["sample_rate"].append(sr)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select(binary_col).mapInPandas(run, schema=_AUDIO_FEATURES_SCHEMA)


def _frames_schema(id_col: str, id_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
) -> DataFrame:
    """1→N frame sampling via ``mapInPandas`` (row-exploding shape).

    STUB frame extraction (hash-derived 16-byte pseudo-frames); the
    real implementation swaps the inner loop for an ffmpeg keyframe
    read.  Output: ``(id, frame_idx, frame: binary)``.
    """
    id_type = df.schema[id_col].dataType
    schema = _frames_schema(id_col, id_type)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    # a NULL video has no frames — fabricating
                    # md5(b'') pseudo-frames would collapse every
                    # NULL-payload row into one fake frame identity
                    # (same contract as image_features' NULL rule)
                    continue
                b = bytes(payload)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(
                        hashlib.md5(b + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def caption_media(
    df: DataFrame,
    binary_col: str = "payload",
    caption_col: str = "caption",
) -> DataFrame:
    """STUB captioner behind the standard column contract.

    Deterministic fake: ``media:<md5 prefix>``.  A real multimodal
    backend replaces the row function with an LLM/vision call — the
    ``withColumn`` contract (same one the text ``sem_map`` uses)
    stays identical.
    """

    @F.pandas_udf(T.StringType())
    def captioner(payloads: pd.Series) -> pd.Series:
        return pd.Series(
            [
                "media:" + hashlib.md5(
                    bytes(p) if p is not None else b""
                ).hexdigest()[:8]
                for p in payloads
            ]
        )

    return df.withColumn(caption_col, captioner(F.col(binary_col)))
