"""Clean-room RIFF/WAVE PCM codec (numpy only — no external audio libs).

Upgrades the audio modality from the deterministic fake decoder
(`operators/multimodal._fake_decode_audio`) to a REAL container format,
the way `imagecodec`/`jpegcodec` did for images: the engine can now
round-trip actual `.wav` bytes through binary columns and decode files
produced by foreign encoders (validated against the stdlib ``wave``
module in tests).

Scope (mirrors the codec family's loud-rejection discipline):

- **encode**: PCM16 little-endian, mono or interleaved multi-channel,
  canonical 44-byte header + ``data`` chunk.
- **decode**: PCM (format code 1) at 8 or 16 bits, any channel count;
  unknown RIFF chunks (``LIST``, ``fact``, ``cue ``...) are skipped with
  correct odd-size padding; anything non-PCM raises ``ValueError``
  naming the format code (IEEE-float 3, A-law 6, mu-law 7,
  WAVE_FORMAT_EXTENSIBLE 0xFFFE) — never a silent wrong decode.

Reference parity note: the reference repo's media surface is image-only
(`dl4jGANComputerVision.java` MNIST pipelines); the audio modality is
part of this repo's training-data-pipeline extension surface, with the
Spark-side plumbing (binary columns + Arrow-batched decode) shared with
the image codecs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]

# WAVE format tags we refuse by name (T.81-style loud scope rejection)
_FORMAT_NAMES = {
    0x0003: "IEEE_FLOAT",
    0x0006: "ALAW",
    0x0007: "MULAW",
    0x0011: "IMA_ADPCM",
    0x0055: "MP3",
    0xFFFE: "EXTENSIBLE",
}


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples as a canonical RIFF/WAVE file.

    ``samples``: shape ``(n,)`` mono or ``(n, channels)`` interleaved on
    write. dtype must be int16 (exact container semantics — resampling
    or dithering is the caller's job, not the codec's).
    """
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError(f"wav: encode expects int16 samples, got {arr.dtype}")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise ValueError(f"wav: bad sample shape {arr.shape}")
    if not (0 < sample_rate < 2**32):
        raise ValueError(f"wav: bad sample rate {sample_rate}")
    n, ch = arr.shape
    data = arr.astype("<i2").tobytes()  # interleaved little-endian
    block_align = 2 * ch
    byte_rate = sample_rate * block_align
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, ch, sample_rate, byte_rate, block_align, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM bytes -> ``(samples (n, channels) int16, rate)``.

    8-bit PCM (unsigned by spec) is returned widened to int16 via
    ``(v - 128) << 8`` so every PCM depth lands in one dtype.
    """
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if riff_size + 8 > len(data):
        raise ValueError("wav: truncated file (RIFF size exceeds data)")

    fmt = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        csize = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + csize > len(data):
            raise ValueError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("wav: fmt chunk too short")
            (tag, ch, rate, _br, _ba, bits) = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if tag != 1:
                name = _FORMAT_NAMES.get(tag, "UNKNOWN")
                raise ValueError(
                    f"wav: unsupported format {name} (0x{tag:04x}); "
                    "only PCM is in scope"
                )
            if bits not in (8, 16):
                raise ValueError(f"wav: unsupported PCM depth {bits}")
            if ch < 1:
                raise ValueError("wav: zero channels")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt chunk")
            ch, rate, bits = fmt
            width = bits // 8
            frame = width * ch
            if csize % frame:
                raise ValueError("wav: data size not a whole frame count")
            raw = data[body:body + csize]
            if bits == 16:
                arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
            else:  # 8-bit PCM is unsigned by spec
                arr = (
                    (np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
                     - 128) << 8
                )
            return arr.reshape(-1, ch), rate
        # any other chunk (LIST, fact, cue , bext...): skip
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    raise ValueError("wav: no data chunk found")
