"""Real multimodal decode against in-test-generated media.

Tiny PNGs (hand-encoded with zlib/struct — every filter type) and
WAVs (stdlib ``wave`` writer) with KNOWN pixel/sample values;
``decode="real"`` must recover exact width/height/mean-luma and
duration/sample-rate/RMS.  The stub mode stays the driver-oracle
default and is pinned unchanged.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import pytest

from semantic_olap_spark.functions.multimodal import (
    _decode_png,
    _decode_wav,
    audio_features,
    image_features,
)


# ---------------------------------------------------------------------------
# media builders


def make_png(pixels, channels=3, filters=None):
    """Minimal PNG encoder: ``pixels`` is rows × cols of per-channel
    tuples/ints; per-row filter types via ``filters`` (default all
    0/None)."""
    h = len(pixels)
    w = len(pixels[0])
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = bytearray()
    prev = bytearray(w * channels)
    filters = filters or [0] * h
    for y, row in enumerate(pixels):
        flat = bytearray()
        for px in row:
            flat.extend(px if isinstance(px, (tuple, list)) else (px,))
        f = filters[y]
        raw.append(f)
        line = bytearray(flat)
        enc = bytearray(line)
        for x in range(len(line)):
            a = line[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if f == 1:
                enc[x] = (line[x] - a) & 255
            elif f == 2:
                enc[x] = (line[x] - b) & 255
            elif f == 3:
                enc[x] = (line[x] - (a + b) // 2) & 255
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 255
        raw.extend(enc)
        prev = line

    def chunk(typ, body):
        out = struct.pack(">I", len(body)) + typ + body
        return out + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_wav(samples, rate=8000, width=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        else:
            w.writeframes(bytes((s + 128) & 255 for s in samples))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# decoder-level pins (known values, no Spark)


def test_png_gray_known_luma():
    # 2x2 grayscale: 0, 51, 102, 255 → mean 102/255... compute exactly
    png = make_png([[0, 51], [102, 255]], channels=1)
    w, h, luma = _decode_png(png)
    assert (w, h) == (2, 2)
    assert luma == round((0 + 51 + 102 + 255) / 4 / 255.0, 6)


def test_png_rgb_rec601_luma_all_filters():
    # 4 rows exercise filter types 1-4; solid known colors
    rows = [
        [(255, 0, 0), (255, 0, 0)],   # red    → .299
        [(0, 255, 0), (0, 255, 0)],   # green  → .587
        [(0, 0, 255), (0, 0, 255)],   # blue   → .114
        [(255, 255, 255), (0, 0, 0)], # white+black → .5
    ]
    png = make_png(rows, channels=3, filters=[1, 2, 3, 4])
    w, h, luma = _decode_png(png)
    assert (w, h) == (2, 4)
    want = (0.299 * 255 * 2 + 0.587 * 255 * 2 + 0.114 * 255 * 2
            + (0.299 + 0.587 + 0.114) * 255) / 8 / 255.0
    assert luma == pytest.approx(want, abs=1e-6)


def test_png_rgba_ignores_alpha_for_luma():
    png = make_png([[(10, 20, 30, 255), (10, 20, 30, 0)]], channels=4)
    w, h, luma = _decode_png(png)
    assert (w, h) == (2, 1)
    want = (0.299 * 10 + 0.587 * 20 + 0.114 * 30) / 255.0
    assert luma == pytest.approx(want, abs=1e-6)


def test_png_rejects_what_it_cannot_decode():
    assert _decode_png(b"\xff\xd8\xffJFIF....") is None  # jpeg
    # palette PNG (ctype 3) → honest None, not garbage
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0")
    assert _decode_png(bad) is None


def test_wav_16bit_known_rms():
    # constant amplitude 16384 = 0.5 full scale → RMS 0.5 exactly
    wav = make_wav([16384] * 8000, rate=8000)
    dur, sr, rms = _decode_wav(wav)
    assert (dur, sr) == (1.0, 8000)
    assert rms == 0.5


def test_wav_8bit_and_short_duration():
    wav = make_wav([64] * 2000, rate=4000, width=1)  # 0.5 fs, 0.5 s
    dur, sr, rms = _decode_wav(wav)
    assert (dur, sr) == (0.5, 4000)
    assert rms == 0.5


def test_wav_rejects_non_wav():
    assert _decode_wav(b"\x89PNG\r\n\x1a\nxxxx") is None


# ---------------------------------------------------------------------------
# operator level (Spark plumbing in real mode)


def test_image_features_real_mode(spark):
    png = make_png([[0, 51], [102, 255]], channels=1)
    rows = [(0, png), (1, b"\xff\xd8\xffJFIFnotdecodable"), (2, None)]
    out = {
        r["media_id"]: r
        for r in image_features(
            spark.createDataFrame(rows, ["doc_id", "payload"]),
            decode="real",
        ).collect()
    }
    good = out[hashlib.md5(png).hexdigest()]
    assert (good["width"], good["height"]) == (2, 2)
    assert good["mean_luma"] == round(408 / 4 / 255.0, 6)
    # undecodable: id present, features NULL
    bad = out[hashlib.md5(b"\xff\xd8\xffJFIFnotdecodable").hexdigest()]
    assert bad["width"] is None and bad["mean_luma"] is None
    assert None in out  # NULL payload row untouched


def test_audio_features_real_mode(spark):
    wav = make_wav([16384] * 4000, rate=8000)  # 0.5 s @ 0.5 fs
    rows = [(0, wav), (1, b"not audio at all")]
    out = {
        r["media_id"]: r
        for r in audio_features(
            spark.createDataFrame(rows, ["doc_id", "payload"]),
            decode="real",
        ).collect()
    }
    good = out[hashlib.md5(wav).hexdigest()]
    assert good["duration_s"] == 0.5
    assert good["sample_rate"] == 8000
    assert good["rms"] == 0.5
    bad = out[hashlib.md5(b"not audio at all").hexdigest()]
    assert bad["duration_s"] is None


def test_stub_mode_unchanged(spark):
    """The driver-oracle default must keep producing hash-fakes."""
    payload = b"\x89PNG\r\n\x1a\nwhatever"
    h = hashlib.md5(payload).digest()
    df = spark.createDataFrame([(0, payload)], ["doc_id", "payload"])
    img = image_features(df).collect()[0]
    assert img["width"] == 64 + h[0] * 4
    assert img["height"] == 64 + h[1] * 4
    aud = audio_features(df).collect()[0]
    assert aud["duration_s"] == 0.5 + h[3] / 16.0


def test_bad_decode_arg_rejected(spark):
    df = spark.createDataFrame([(0, b"x")], ["doc_id", "payload"])
    with pytest.raises(ValueError, match="decode"):
        image_features(df, decode="magic")
    with pytest.raises(ValueError, match="decode"):
        audio_features(df, decode="magic")
