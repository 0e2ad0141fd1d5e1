"""Pure-stdlib image codec: PNG (via zlib) and binary PPM/PGM.

The container ships no image libraries, but PNG's container format is just
zlib + per-scanline filters (RFC 2083), both implementable with the standard
library — so the engine's media path decodes REAL bytes, not only the
deterministic fake. Supported:

- decode: PNG color types 0 (gray), 2 (RGB), 6 (RGBA), bit depth 8, all five
  scanline filters (None/Sub/Up/Average/Paeth), non-interlaced;
  PPM ``P6`` (RGB) and PGM ``P5`` (gray), maxval 255;
  baseline JPEG (gray / YCbCr, any sampling) via functions/jpegcodec.py.
- encode: PNG (any filter type, default 0), PGM/PPM, and baseline JPEG —
  used by fixtures and round-trip tests.

Everything here is driver/executor-local Python operating on one payload at a
time; the distributed shape (mapInPandas over Arrow batches, binary columns
kept off the shuffle path) lives in operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str | None:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type → samples per pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (H, W) for gray, (H, W, C) for RGB/RGBA."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    height = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "unsupported (8-bit gray/RGB/RGBA only)"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:                      # None
            cur = line
        elif f == 1:                    # Sub
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 2:                    # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:                    # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:                    # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = out[y]
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


def _filter_line(f: int, cur: np.ndarray, prev: np.ndarray, ch: int) -> bytes:
    """Apply PNG filter ``f`` to a raw scanline for encoding."""
    stride = len(cur)
    if f == 0:
        return bytes(cur)
    out = bytearray(stride)
    for x in range(stride):
        left = int(cur[x - ch]) if x >= ch else 0
        up = int(prev[x])
        ul = int(prev[x - ch]) if x >= ch else 0
        if f == 1:
            pred = left
        elif f == 2:
            pred = up
        elif f == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, ul)
        out[x] = (int(cur[x]) - pred) & 0xFF
    return bytes(out)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (H, W) / (H, W, 3) / (H, W, 4) → PNG bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color_type = 2 if arr.shape[2] == 3 else 6
        ch = arr.shape[2]
        flat = arr.reshape(arr.shape[0], -1)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, stride = flat.shape
    w = stride // ch

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        raw.append(filter_type)
        raw.extend(_filter_line(filter_type, flat[y], prev, ch))
        prev = flat[y]
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PPM / PGM (binary)
# ---------------------------------------------------------------------------

def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PGM (P5) → (H, W); binary PPM (P6) → (H, W, 3). maxval 255."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    # header: magic, whitespace-separated width height maxval (with comments)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields[0], fields[1], fields[2]
    if maxval != 255:
        raise NotImplementedError("PNM maxval != 255 unsupported")
    ch = 1 if magic == b"P5" else 3
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, ch)


def encode_pnm(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def to_gray(img: np.ndarray) -> np.ndarray:
    """(H, W[, C]) → (H, W) uint8 via integer ITU-R 601 luma."""
    if img.ndim == 2:
        return img
    r, g, b = (img[..., 0].astype(np.int32), img[..., 1].astype(np.int32),
               img[..., 2].astype(np.int32))
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def decode_any(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "pnm":
        return decode_pnm(data)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(data)
    raise NotImplementedError(
        "unrecognized image payload (PNG, baseline JPEG and binary PGM/PPM "
        "are decodable in-engine; other formats need an image library such "
        "as Pillow)"
    )
