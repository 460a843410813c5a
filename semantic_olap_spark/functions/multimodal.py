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
- ``image_features`` / ``audio_features`` — ``decode="stub"``
  (default, the driver-oracle contract) hash-derives features;
  ``decode="real"`` actually decodes: PNG via a stdlib zlib+struct
  decoder and WAV via stdlib ``wave`` (both dependency-free and
  pinned against known pixel/sample values in
  tests/test_multimodal_real_decode.py), other formats via
  Pillow/soundfile behind try-imports when installed, NULL features
  when nothing applies — never fabricated.
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


def _decode_png(data: bytes) -> tuple[int, int, float] | None:
    """REAL PNG decode, stdlib-only (zlib inflate + scanline
    unfilter) — 8-bit gray/gray-A/RGB/RGBA, non-interlaced.

    Luma per pixel: the value itself for grayscale, Rec.601
    (0.299R + 0.587G + 0.114B) for color; ``mean_luma`` is the mean
    over pixels scaled to [0, 1], rounded to 6 — the same scale the
    stub fakes.  Returns None for shapes this decoder doesn't cover
    (16-bit, palette, interlaced) so the caller can fall through.
    """
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        pos += 8
        chunk = data[pos:pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if hdr is None:
        return None
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or interlace != 0 or channels is None or not w or not h:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    prev = bytearray(stride)
    luma_sum = 0.0
    i = 0
    for _y in range(h):
        f = raw[i]
        i += 1
        line = bytearray(raw[i:i + stride])
        i += stride
        if f:  # unfilter (types 1-4; 0 = none)
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if f == 1:
                    line[x] = (line[x] + a) & 255
                elif f == 2:
                    line[x] = (line[x] + b) & 255
                elif f == 3:
                    line[x] = (line[x] + (a + b) // 2) & 255
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    line[x] = (line[x] + pr) & 255
        prev = line
        if channels >= 3:
            for x in range(0, stride, channels):
                luma_sum += (
                    0.299 * line[x] + 0.587 * line[x + 1]
                    + 0.114 * line[x + 2]
                )
        else:
            for x in range(0, stride, channels):
                luma_sum += line[x]
    return int(w), int(h), round(luma_sum / (w * h) / 255.0, 6)


def _real_image_decode(payload: bytes) -> tuple[int, int, float] | None:
    """REAL decode dispatch: stdlib PNG first (deterministic,
    dependency-free, the canonical tested path), then optional
    Pillow for other formats behind a try-import.  None = this
    payload is not decodable here (caller emits NULL features —
    honest, never fabricated)."""
    out = _decode_png(payload)
    if out is not None:
        return out
    try:  # optional: covers jpeg/gif/... when Pillow is installed
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            gray = im.convert("L")
            hist = gray.histogram()
            total = sum(hist)
            mean = sum(v * n for v, n in enumerate(hist)) / total
            return int(w), int(h), round(mean / 255.0, 6)
    except Exception:
        return None


def image_features(
    df: DataFrame, binary_col: str = "payload", decode: str = "stub"
) -> DataFrame:
    """Per-image features via an Arrow-batched ``mapInPandas``.

    Output: one row per input image ``(media_id, width, height,
    mean_luma)``.  ``decode``:

    - ``"stub"`` (default, the driver-oracle contract): hash-derived
      deterministic fakes — plumbing-real, content-fake.
    - ``"real"``: actual decoding — stdlib PNG decoder always
      (zlib+struct, no dependency), Pillow for other formats when
      importable; payloads neither path can decode get NULL features
      (``media_id`` still set), never fabricated values.

    The Spark side (schema, batch iteration, column pruning to just
    the binary column) is identical in both modes.
    """
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")
    use_real = decode == "real"

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
                feats = _real_image_decode(b) if use_real else _fake_decode(b)
                w, h, luma = feats if feats is not None else (None,) * 3
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


def _decode_wav(data: bytes) -> tuple[float, int, float] | None:
    """REAL WAV decode, stdlib-only (``wave`` module): duration from
    frame count, sample rate from the header, RMS over PCM samples
    scaled to [-1, 1] (all channels pooled), rounded to 6.  Returns
    None for non-WAV payloads or sample widths wave can't express.
    """
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(data)) as w:
            sr = w.getframerate()
            n = w.getnframes()
            sw = w.getsampwidth()
            frames = w.readframes(n)
    except (wave.Error, EOFError, OSError):
        return None
    if sr <= 0:
        return None
    duration = n / sr
    if sw == 2:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames)
        scale = 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        vals = tuple(b - 128 for b in frames)
        scale = 128.0
    else:
        return None
    rms = (
        (sum((v / scale) ** 2 for v in vals) / len(vals)) ** 0.5
        if vals else 0.0
    )
    return duration, int(sr), round(rms, 6)


def _real_audio_decode(payload: bytes) -> tuple[float, int, float] | None:
    """REAL decode dispatch: stdlib WAV first, then optional
    soundfile for other containers behind a try-import; None when
    neither applies (caller emits NULL features)."""
    out = _decode_wav(payload)
    if out is not None:
        return out
    try:  # optional: flac/ogg/... when soundfile is installed
        import io

        import soundfile as sf
    except ImportError:
        return None
    try:
        data, sr = sf.read(io.BytesIO(payload), dtype="float64")
        n = len(data)
        if n == 0 or sr <= 0:
            return 0.0, int(sr or 0), 0.0
        flat = data.reshape(-1)
        rms = float((flat ** 2).mean() ** 0.5)
        return n / sr, int(sr), round(rms, 6)
    except Exception:
        return None


def audio_features(
    df: DataFrame, binary_col: str = "payload", decode: str = "stub"
) -> DataFrame:
    """Per-clip audio features via an Arrow-batched ``mapInPandas``.

    Output: one row per clip ``(media_id, duration_s, sample_rate,
    rms)`` — the audio analog of :func:`image_features`, with the
    same ``decode`` contract: ``"stub"`` (default, driver-oracle)
    hash-fakes; ``"real"`` decodes WAV via stdlib ``wave`` always and
    other containers via soundfile when importable, NULL features
    otherwise.
    """
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")
    use_real = decode == "real"

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
                feats = (
                    _real_audio_decode(b) if use_real
                    else _fake_audio_decode(b)
                )
                dur, sr, rms = feats if feats is not None else (None,) * 3
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
