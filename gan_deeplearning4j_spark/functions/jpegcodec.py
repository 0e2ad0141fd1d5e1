"""Pure-python baseline JPEG codec (ITU-T T.81 baseline sequential DCT).

Clean-room from the public spec: no image library, no lifted tables —
the zigzag order is derived programmatically and the encoder builds its
own canonical Huffman tables from the symbols it actually emits (JPEG
embeds tables in DHT segments, so a decoder needs no fixed tables).

Decoder supports what baseline JFIF files in the wild use:

- SOI / APPn / COM / DQT / DHT / DRI / SOF0 / SOS / RSTn / EOI markers
- 8-bit samples, 1 component (grayscale) or 3 components (YCbCr)
- arbitrary sampling factors per component (4:4:4, 4:2:0, 4:2:2, ...),
  chroma upsampled by pixel replication
- restart markers with DC-predictor reset and byte re-alignment

Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
modes raise ``NotImplementedError`` with the marker named — those are
deliberate scope cuts, not stubs (COVERAGE.md).

Encoder (used by fixtures, round-trip tests and synth media): baseline
sequential, grayscale or YCbCr at 4:4:4 / 4:2:0, one quantization table,
uniform-length canonical Huffman codes (valid, merely suboptimal — the
engine is a data pipeline, not an image optimizer).

Everything operates driver/executor-local on one payload; the
distributed shape lives in operators/multimodal.py.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    """The 64-entry zigzag scan order, derived (not transcribed): walk
    anti-diagonals, alternating direction, starting (0,0),(0,1),(1,0)."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        if s % 2 == 0:
            rows = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:
            rows = range(max(0, s - 7), min(s, 7) + 1)
        out.extend((r, s - r) for r in rows)
    return out


_ZZ = _zigzag()
# flat index per zigzag position, and its inverse
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)

# orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)uπ/16);
# forward F = A f Aᵀ, inverse f = Aᵀ F A
_DCT_A = np.array(
    [
        [
            (math.sqrt(0.125) if u == 0 else 0.5)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, surfaces RSTn, stops at
    any other marker (SOS payload ends at the next real marker)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("jpeg: unexpected end of data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("jpeg: unexpected end of data")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _Restart(nxt)
            else:
                self.marker = nxt
                raise _AtMarker(nxt)
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        return v

    def align_after_restart(self) -> None:
        self.bitbuf = 0
        self.nbits = 0
        self.pos += 2  # consume the FFDx marker


class _Restart(Exception):
    def __init__(self, m: int):
        self.m = m


class _AtMarker(Exception):
    def __init__(self, m: int):
        self.m = m


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (H, W) for grayscale, (H, W, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (H, W, comps) where comps = [(cid, h, v, tq)]

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    q = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    q = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                dq = np.zeros(64, dtype=np.int32)
                dq[_ZZ_FLAT] = q  # stored in zigzag order
                qtabs[tid] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                p += 17 + n
                codes = _build_codes(bits, vals)
                htabs[(tclass, tid)] = {
                    (ln, c): sym for sym, (c, ln) in codes.items()
                }
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * i]))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} (non-baseline mode) unsupported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF0")
            ns = seg[0]
            if ns != len(frame[2]):
                # legal baseline, but multi-scan non-interleaved layout —
                # decoding the first scan as if interleaved would silently
                # leave the other component planes zeroed
                raise NotImplementedError(
                    "jpeg: non-interleaved scan (SOS components "
                    f"{ns} != frame components {len(frame[2])}) unsupported"
                )
            scan = []  # (comp index, dc table id, ac table id)
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td, ta = seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F
                ci = next(
                    j for j, c in enumerate(frame[2]) if c[0] == cs
                )
                scan.append((ci, td, ta))
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qtabs, htabs, restart_interval
            )
        pos += seglen
    raise ValueError("jpeg: no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    r = _BitReader(data, pos)
    aT = _DCT_A.T
    mcu_count = 0
    mcus_done = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    # discard the pre-marker padding bits, consume RSTn,
                    # reset the DC predictors (T.81 E.1.4)
                    r.bitbuf = 0
                    r.nbits = 0
                    if r.pos + 1 >= len(r.data):
                        # truncated exactly at an expected RSTn boundary:
                        # same contract as _fill on truncated entropy data
                        raise ValueError("jpeg: unexpected end of data")
                    if not (
                        r.data[r.pos] == 0xFF
                        and 0xD0 <= r.data[r.pos + 1] <= 0xD7
                    ):
                        raise ValueError("jpeg: expected restart marker")
                    r.pos += 2
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, td, ta in scan:
                    _, ch, cv, tq = comps[ci]
                    dct = htabs[(0, td)]
                    act = htabs[(1, ta)]
                    q = qtabs[tq]
                    for by in range(cv):
                        for bx in range(ch):
                            coef = np.zeros(64, dtype=np.float64)
                            s = _huff_decode(r, dct)
                            diff = _extend(r.read(s), s) if s else 0
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(r, act)
                                run, size = rs >> 4, rs & 0x0F
                                if size == 0:
                                    if run == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    raise ValueError("jpeg: AC overflow")
                                coef[_ZZ_FLAT[k]] = _extend(
                                    r.read(size), size
                                )
                                k += 1
                            block = coef.reshape(8, 8) * q
                            pix = aT @ block @ _DCT_A + 128.0
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
                mcus_done += 1
    except _Restart:
        if mcus_done < mcus_x * mcus_y:
            raise ValueError(
                "jpeg: unexpected restart marker after "
                f"{mcus_done}/{mcus_x * mcus_y} MCUs"
            ) from None
        r.align_after_restart()
    except _AtMarker as m:
        if mcus_done < mcus_x * mcus_y:
            # truncated/corrupt entropy data — fail loudly instead of
            # returning a partially gray image
            raise ValueError(
                f"jpeg: scan ended at marker 0x{m.m:02X} after "
                f"{mcus_done}/{mcus_x * mcus_y} MCUs"
            ) from None

    out = []
    for i, (_, ch, cv, _) in enumerate(comps):
        p = planes[i]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:H, :W])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _uniform_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """bits/vals for a valid canonical table giving every symbol the same
    length L with 2^L > n (the all-ones code stays unassigned, as T.81
    requires)."""
    vals = sorted(symbols)
    n = len(vals)
    L = max(2, n.bit_length())
    if (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return bits, vals


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H and W multiples of 8 → (n, 8, 8) row-major."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_to(a: np.ndarray, mult: int) -> np.ndarray:
    h, w = a.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(a, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray, quant: int | np.ndarray = 1, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encode of uint8 (H, W) gray or (H, W, 3) RGB.

    ``quant``: scalar (uniform table — 1 gives near-lossless roundtrip,
    the golden-file test anchor) or a full (8, 8) table. ``subsample``:
    4:2:0 chroma (exercises the decoder's general MCU geometry).
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs with DC-predictor reset — what camera JPEGs do, and the
    decoder's resync path.
    """
    img = np.asarray(img, dtype=np.uint8)
    H, W = img.shape[:2]
    gray = img.ndim == 2
    q = (np.full((8, 8), int(quant), dtype=np.int32)
         if np.isscalar(quant) else np.asarray(quant, dtype=np.int32))

    if gray:
        comps = [(1, 1, 1)]
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., 0].astype(np.float64),
                   img[..., 1].astype(np.float64),
                   img[..., 2].astype(np.float64))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
            cb = _pad_to(cb, 2)
            cr = _pad_to(cr, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        else:
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    # quantized blocks per component, in MCU-interleaved order
    qblocks: list[list[np.ndarray]] = []
    for (cid, ch, cv), plane in zip(comps, planes):
        target_h, target_w = mcus_y * cv * 8, mcus_x * ch * 8
        p = plane[:target_h, :target_w]
        p = np.pad(
            p,
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        blk = _blocks(p - 128.0)
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_A, blk, _DCT_A)
        qb = np.round(coef / q).astype(np.int64)
        qblocks.append([b for b in qb])

    # walk MCUs once to build per-MCU symbol sequences (with DC-predictor
    # resets at restart boundaries), then write bits
    def mcu_blocks(my: int, mx: int):
        for ci, (cid, ch, cv) in enumerate(comps):
            bw = mcus_x * ch  # blocks per row for this component
            for by in range(cv):
                for bx in range(ch):
                    idx = (my * cv + by) * bw + (mx * ch + bx)
                    yield ci, qblocks[ci][idx]

    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    pred = [0] * len(comps)
    mcu_seqs: list[list[tuple[int, list]]] = []
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                pred = [0] * len(comps)
            mcu_no += 1
            entries: list[tuple[int, list]] = []
            for ci, blk in mcu_blocks(my, mx):
                zz = blk.reshape(-1)[_ZZ_FLAT]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                dc_syms.add(_category(diff))
                acs = []
                run = 0
                last = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        if run == 16:
                            acs.append((0xF0, 0, 0))
                            ac_syms.add(0xF0)
                            run = 0
                        continue
                    size = _category(v)
                    acs.append(((run << 4) | size, v, size))
                    ac_syms.add((run << 4) | size)
                    run = 0
                if last < 63:
                    acs.append((0x00, 0, 0))
                    ac_syms.add(0x00)
                entries.append((diff, acs))
            mcu_seqs.append(entries)

    dc_bits, dc_vals = _uniform_table(dc_syms)
    ac_bits, ac_vals = _uniform_table(ac_syms)
    dc_codes = _build_codes(dc_bits, dc_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)

    w = _BitWriter()
    for i, entries in enumerate(mcu_seqs):
        if restart_interval and i and i % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
        for diff, acs in entries:
            cat = _category(diff)
            code, ln = dc_codes[cat]
            w.write(code, ln)
            if cat:
                w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            for sym, v, size in acs:
                code, ln = ac_codes[sym]
                w.write(code, ln)
                if size:
                    w.write(v if v >= 0 else v + (1 << size) - 1, size)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = bytes(int(q.reshape(-1)[i]) for i in _ZZ_FLAT)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_q)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, H, W, len(comps))
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00] + dc_bits + dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits + ac_vals))
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)
