"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery here is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` partitioning, deterministic fake feature
extraction. The actual media decode is STUBBED (``decode_stub``): the
image/audio libraries are not in this container. Swap ``_decode_image`` for
a real decoder (PIL/ffmpeg) in production; nothing else changes.

Design for 100 TB of media:

- binary payloads ride in parquet as ``BinaryType`` — columnar readers
  prune them unless the plan touches the column, so metadata-only queries
  never read bytes.
- decode/feature-extract runs in ``mapInPandas`` with a bounded Arrow batch
  size (``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor
  memory is payload-bounded, not row-count-bounded.
- derived features (dims, duration, embedding) land in a sibling struct
  column; the binary column is dropped as early as the plan allows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType(), True),
        T.StructField("bytes", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("checksum", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives (width, height) from the payload
    bytes. Replace with a real decoder in production; raises on None to
    mirror real decoder behavior.

    Real implementation would be, e.g.::

        from PIL import Image; import io
        img = Image.open(io.BytesIO(payload)); return img.size
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder required")
    w = 64 + (payload[0] if payload else 0) % 192 if len(payload) else 64
    h = 64 + (payload[-1] if payload else 0) % 192 if len(payload) else 64
    return int(w), int(h)


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract media rows via ``mapInPandas``.

    Iterator-of-batches form: payloads stream through in Arrow batches, so
    a partition larger than memory still processes incrementally. Byte
    length and content checksum are computed JVM-side (codegen ``length``/
    ``md5``) BEFORE the Python stage — only the decode itself, the one
    step a real media library would own, crosses into Python."""

    pre = df.select(
        "media_id", "kind", "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _decode(payload):
            try:
                return decode_stub(payload)
            except NotImplementedError:
                return (None, None)

        # per-element Python survives only at the decode seam; everything
        # else rides through from the JVM or is a vectorized Series op
        for pdf in batches:
            wh = pdf["payload"].map(_decode)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "checksum": pdf["checksum"],
                "width": wh.map(lambda t: t[0]),
                "height": wh.map(lambda t: t[1]),
            })

    return pre.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads to ``width``×``height`` via ``mapInPandas``.

    The resize itself is STUBBED deterministically (payload re-derived from
    the input bytes at a size proportional to the target area — a real
    implementation swaps in ``PIL.Image.resize`` and nothing else changes).
    The Spark plumbing is real: non-image rows are pruned JVM-side before
    any Python runs, and payloads stream through in bounded Arrow batches.
    """

    size = max(16, (width * height) // 256)

    def _fake_resize(payload):
        if payload is None:
            return None
        # deterministic fake: digest-seeded bytes, size scaled to the
        # target area (stands in for re-encoded pixels)
        seed = hashlib.md5(payload).digest()
        return (seed * (size // len(seed) + 1))[:size]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-element Python only at the resize seam; constant columns and
        # frame assembly are vectorized
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": pdf["payload"].map(_fake_resize),
                "width": width,
                "height": height,
            })

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_resize, schema=RESIZED_SCHEMA)
    )


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_sec", T.DoubleType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(df: DataFrame, fps: float = 1.0,
                  max_frames: int = 16) -> DataFrame:
    """Sample frames from video payloads at ``fps`` frames/sec (capped at
    ``max_frames``), one output row per frame — the row-expanding shape a
    real ffmpeg-backed sampler needs, with the decode STUBBED: duration is
    derived deterministically from payload length, frame bytes from a
    digest of (payload, index). ``mapInPandas`` may emit more rows than it
    consumes, so the expansion happens executor-side without a join or
    explode over pre-materialized frame arrays (which would buffer whole
    videos in one row — the thing to avoid at 100 TB)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]
            if not len(pdf):
                yield pd.DataFrame(
                    {c: pd.Series(dtype=object) for c in cols})
                continue
            # frame counts + expansion are pure numpy: duration is faked
            # from payload length, each input row repeats n times with a
            # per-row arange of frame indices
            lens = pdf["payload"].str.len().to_numpy(dtype="float64")
            duration = np.maximum(1.0, lens / 8.0)  # fake seconds
            n = np.clip((duration * fps).astype("int64"), 1, max_frames)
            media_id = np.repeat(pdf["media_id"].to_numpy(), n)
            frame_idx = np.concatenate([np.arange(k) for k in n])
            hexes = np.repeat(
                pdf["payload"].map(bytes.hex).to_numpy(), n)
            # digest over the lowercase-hex form of (payload, idx):
            # byte-identical in ANSI SQL (md5 there is VARCHAR-only),
            # so the fake frame bytes are oracle-verifiable
            yield pd.DataFrame({
                "media_id": media_id,
                "frame_idx": frame_idx.astype("int32"),
                "ts_sec": np.round(frame_idx / fps, 3),
                "frame": [
                    hashlib.md5((hx + format(i, "08x")).encode()).digest()
                    for hx, i in zip(hexes, frame_idx)
                ],
            })

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(_sample, schema=FRAME_SCHEMA)
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes derived
    from the id (no randomness)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8")
        .alias("payload"),
    )
    return base.withColumn(
        "meta",
        F.struct(F.lit("synthetic").alias("format"),
                 F.length("payload").cast("long").alias("bytes")),
    )


# --- real container-format probing (no media libraries needed) -------------

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}

PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def probe_media_bytes(payload) -> tuple:
    """REAL header parsing — (format, width, height) from the container
    bytes of PNG / GIF / BMP / JPEG, no image library involved. This is
    the decode-free metadata pass a 100 TB media pipeline runs first
    (routing, size filtering, corrupt-file triage read a few hundred
    header bytes, never the pixels). Unknown or truncated payloads
    return (None, None, None) — triage, not crash.

    - PNG: 8-byte signature, then the IHDR chunk's big-endian
      width/height at fixed offsets 16/20.
    - GIF87a/89a: logical screen descriptor, little-endian at 6/8.
    - BMP: BITMAPINFOHEADER little-endian at 18/22 (height may be
      negative for top-down rows — absolute value).
    - JPEG: segment scan for the first SOF marker (C0..CF minus
      C4/C8/CC), big-endian height/width at +5/+7 inside it.
    """
    if payload is None or len(payload) < 10:
        return (None, None, None)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return ("png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"))
    if b[:2] == b"BM" and len(b) >= 26:
        return ("bmp", int.from_bytes(b[18:22], "little"),
                abs(int.from_bytes(b[22:26], "little", signed=True)))
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                return ("jpeg", None, None)  # corrupt segment stream
            # spec-legal fill: any run of 0xFF bytes precedes the marker
            j = i + 1
            while j < len(b) and b[j] == 0xFF:
                j += 1
            if j >= len(b):
                break
            marker = b[j]
            if marker in _SOF_MARKERS:
                if j + 8 >= len(b):
                    break
                return ("jpeg", int.from_bytes(b[j + 6:j + 8], "big"),
                        int.from_bytes(b[j + 4:j + 6], "big"))
            if marker == 0xD9:           # EOI before any SOF
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xD8:
                i = j + 1                # standalone: no length field
                continue
            if j + 2 >= len(b):
                break
            seglen = int.from_bytes(b[j + 1:j + 3], "big")
            if seglen < 2:
                return ("jpeg", None, None)
            i = j + 1 + seglen
        return ("jpeg", None, None)
    return (None, None, None)


def probe_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format probe over a binary column via ``mapInPandas`` —
    the real (non-stubbed) counterpart of ``extract_features``'s decode
    seam: only header bytes are interpreted, so the Arrow batches carry
    payloads once and every derived column is metadata."""
    src = df.select("media_id", "kind", F.col(payload_col).alias("__p"))

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = pdf["__p"].map(probe_media_bytes)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "format": probed.map(lambda t: t[0]),
                "width": probed.map(lambda t: t[1]),
                "height": probed.map(lambda t: t[2]),
            })

    return src.mapInPandas(_probe, schema=PROBE_SCHEMA)


AUDIO_PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("sample_rate_hz", T.IntegerType(), True),
    T.StructField("bits_per_sample", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def probe_audio_bytes(payload) -> tuple:
    """REAL RIFF/WAVE container parsing — (format, channels,
    sample_rate_hz, bits_per_sample, duration_ms) from the header
    bytes, no audio library. Walks the chunk list (chunks are
    word-aligned: odd sizes pad one byte) collecting the ``fmt ``
    descriptor and the ``data`` chunk size; duration is
    ``data_size · 1000 / byte_rate``. Unknown/truncated payloads
    return all-None; a WAV whose fmt or data chunk is missing returns
    ``('wav', None, ...)`` — triage, not crash."""
    if payload is None or len(payload) < 12:
        return (None, None, None, None, None)
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (None, None, None, None, None)
    channels = rate = bits = byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        csz = int.from_bytes(b[i + 4:i + 8], "little")
        # field reads are bounded by the CHUNK's declared size, not the
        # payload length — a malformed short fmt chunk must not read
        # the next chunk's id bytes as a sample rate
        body = b[i + 8:i + 8 + csz]
        if cid == b"fmt " and csz >= 16 and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_size = csz
        i += 8 + csz + (csz & 1)
    dur = (data_size * 1000 // byte_rate
           if data_size is not None and byte_rate else None)
    return ("wav", channels, rate, bits, dur)


def probe_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio-container probe over a binary column via ``mapInPandas`` —
    the audio sibling of ``probe_media``: decode-free metadata (channel
    layout, sample rate, duration) for routing and length filtering
    before any sample decoding."""
    src = df.select("media_id", "kind", F.col(payload_col).alias("__p"))

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = pdf["__p"].map(probe_audio_bytes)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "format": probed.map(lambda t: t[0]),
                "channels": probed.map(lambda t: t[1]),
                "sample_rate_hz": probed.map(lambda t: t[2]),
                "bits_per_sample": probed.map(lambda t: t[3]),
                "duration_ms": probed.map(lambda t: t[4]),
            })

    return src.mapInPandas(_probe, schema=AUDIO_PROBE_SCHEMA)
