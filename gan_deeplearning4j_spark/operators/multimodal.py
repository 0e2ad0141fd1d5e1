"""Multimodal columns (north-star scope, BASELINE.json): image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested. Image decode is REAL for PNG, binary
PGM/PPM (functions/imagecodec.py) and baseline JPEG
(functions/jpegcodec.py, pure-python T.81 sequential DCT); non-baseline
JPEG modes and unrecognized formats raise ``NotImplementedError``, as
does audio decode (no audio library in this container) — the
deterministic fake decoder (``fake=True``) covers those plumbing paths.

Scale notes (100 TB of media):
- Binary payloads stay OFF the shuffle path: metadata-only plans (filter on
  width/height/codec) prune before any decode.
- Decode/resize runs in ``mapInPandas`` so one task streams Arrow batches —
  bounded memory regardless of per-file size skew; batch size is controlled
  by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- Frame sampling emits (media_id, frame_no) rows — an explode whose
  cardinality is declared up-front, not a hidden blow-up.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.imagecodec import decode_any, encode_png, to_gray

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("content", T.BinaryType()),      # opaque payload
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),       # typed metadata ↓
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def synth_media_df(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fixture. Image rows carry REAL payloads (pixels
    derived from media_id, encoded by the in-engine codecs) so the decode
    path runs un-faked — every third row is a baseline JPEG (quant=1,
    exact roundtrip for 8-bit gray), the rest PNG, so a mixed-format
    corpus flows through one decode stage the way a crawled dataset
    would; audio rows carry REAL RIFF/WAVE PCM16 payloads (in-engine
    wavcodec) so the audio decode path also runs un-faked; video payloads
    stay opaque hash bytes for the fake frame decoder."""
    from ..functions.jpegcodec import encode_jpeg
    from ..functions.wavcodec import encode_wav

    rows = []
    for i in range(n):
        if kind == "image":
            pixels = _fake_decode(f"media-image-{i}".encode(), 16, 16)
            if i % 3 == 2:
                payload = encode_jpeg(pixels, quant=1)
                mime = "image/jpeg"
            else:
                payload = encode_png(pixels)
                mime = "image/png"
        elif kind == "audio":
            h = hashlib.sha256(f"media-audio-{i}".encode()).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
            samples = rng.integers(
                -32768, 32768, size=3200, dtype=np.int16
            )  # 200 ms @ 16 kHz
            payload = encode_wav(samples, 16000)
            mime = "audio/wav"
        else:
            payload = hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * 8
            mime = f"{kind}/x-fake"
        rows.append((i, kind, bytearray(payload), mime, 16, 16,
                     8 if kind == "video" else 1, 16000 if kind == "audio" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: hash → uint8 pixel tensor (H, W)."""
    h = hashlib.sha256(content).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.integers(0, 256, (height, width), dtype=np.uint8)


def decode_image(content: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a (H, W) uint8 grayscale tensor.

    Real path: the in-engine pure-python codecs (PNG via zlib + binary
    PGM/PPM in functions/imagecodec.py, baseline JPEG in
    functions/jpegcodec.py); color images reduce via integer luma.
    Non-baseline JPEG modes (progressive, arithmetic, 12-bit) and
    unrecognized formats raise NotImplementedError. ``fake=True`` keeps
    the deterministic hash decoder for plumbing tests. The declared
    width/height metadata is advisory; the decoded header wins.
    """
    if fake:
        return _fake_decode(content, width, height)
    return to_gray(decode_any(content))


def decode_features(
    df: DataFrame, out_dim: int = 32, fake: bool = True,
    id_col: str = "media_id",
) -> DataFrame:
    """decode → normalize → flatten → fixed-dim feature vector, as one
    mapInPandas stage (no shuffle; binary column never leaves the scan task).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                img = decode_image(bytes(content), int(w), int(h), fake=fake)
                flat = (img.astype(np.float32) / 255.0).ravel()
                # fold into out_dim buckets (stand-in feature extractor)
                pad = (-len(flat)) % out_dim
                flat = np.pad(flat, (0, pad))
                feats.append(flat.reshape(-1, out_dim).mean(axis=0))
            yield pd.DataFrame({id_col: pdf[id_col], "feature": [list(map(float, f)) for f in feats]})

    # project to only the columns the kernel reads BEFORE the Python
    # boundary: an opaque mapInPandas defeats Catalyst's column pruning,
    # so without this every caller column (and its storage read) ships to
    # the worker (guide §4.1 / r13 optimization pass)
    return df.select(id_col, "content", "width", "height").mapInPandas(
        run, schema=out_schema
    )


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8,
                  fake: bool = True) -> DataFrame:
    """decode → nearest-neighbor resize (the K5 kernel family applied to a
    media column) → re-encode as array<int> pixels."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                img = decode_image(bytes(content), int(w), int(h), fake=fake)
                ih, iw = img.shape  # decoded dims win over metadata
                ys = (np.arange(out_h) * ih // out_h)
                xs = (np.arange(out_w) * iw // out_w)
                small = img[np.ix_(ys, xs)]
                out.append([int(v) for v in small.ravel()])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "pixels": out,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    # column-prune before the Python boundary (see decode_features)
    return df.select("media_id", "content", "width", "height").mapInPandas(
        run, schema=out_schema
    )


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video rows: explode declared frame counts into
    (media_id, frame_no) — pure Catalyst, no decode needed to *plan* the
    sample; the decode of chosen frames reuses decode_features."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
            ).alias("frame_no"),
        )
    )


def _fake_decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """Deterministic fake PCM decoder: hash → float32 waveform in [-1, 1]."""
    h = hashlib.sha256(content).digest()
    rng = np.random.default_rng(int.from_bytes(h[8:16], "little"))
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0)


def audio_frame_energy(
    df: DataFrame, frame_ms: int = 25, fake: bool = True,
    duration_ms: int = 200,
) -> DataFrame:
    """Audio feature extraction: decode → frame into frame_ms windows → RMS
    energy per frame, one mapInPandas stage (same shuffle-free shape as
    decode_features — the waveform never leaves the scan task, only the
    (media_id, frame_no, rms) rows do).

    ``fake=True`` (historical default) synthesizes a deterministic
    waveform of ``duration_ms`` from the content hash; ``fake=False``
    decodes REAL RIFF/WAVE PCM bytes with the in-engine clean-room
    wavcodec (channel-averaged to mono, int16 -> [-1, 1) float), raising
    loudly on non-WAV payloads — the audio twin of the PNG/JPEG decode
    path."""
    from ..functions.wavcodec import decode_wav
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("rms", T.FloatType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, rms = [], [], []
            for mid, content, sr in zip(
                pdf["media_id"], pdf["content"], pdf["sample_rate"]
            ):
                sr = int(sr) if sr is not None and not pd.isna(sr) else 16000
                if fake:
                    wav = _fake_decode_audio(
                        bytes(content), sr * duration_ms // 1000
                    )
                else:
                    samples, sr = decode_wav(bytes(content))
                    wav = (
                        samples.astype(np.float32).mean(axis=1) / 32768.0
                    )
                hop = max(sr * frame_ms // 1000, 1)
                n_frames = len(wav) // hop
                w = wav[: n_frames * hop].reshape(n_frames, hop)
                e = np.sqrt((w * w).mean(axis=1))
                ids.extend([mid] * n_frames)
                frames.extend(range(n_frames))
                rms.extend(float(v) for v in e)
            yield pd.DataFrame({"media_id": ids, "frame_no": frames, "rms": rms})

    # column-prune before the Python boundary (see decode_features)
    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "content", "sample_rate")
        .mapInPandas(run, schema=out_schema)
    )
