"""Multimodal tests: Spark-side schema/batching/UDF wiring plus the REAL
in-engine PNG/PPM codec (zlib + scanline filters, no external image lib)."""

from __future__ import annotations

import numpy as np
import pytest

from gan_deeplearning4j_spark.functions.imagecodec import (
    decode_png,
    decode_pnm,
    encode_png,
    encode_pnm,
    to_gray,
)
from gan_deeplearning4j_spark.operators.multimodal import (
    decode_features,
    decode_image,
    resize_images,
    sample_frames,
    synth_media_df,
)


def test_decode_raises_on_unknown_format():
    """Unrecognized payloads raise NotImplementedError naming what IS
    decodable; corrupt-but-sniffable JPEG raises a decode error."""
    with pytest.raises(NotImplementedError, match="PNG, baseline JPEG"):
        decode_image(b"GIF89a not decodable", 4, 4, fake=False)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 truncated garbage", 4, 4, fake=False)


def test_jpeg_truncated_entropy_fails_loudly():
    """Cutting a valid JPEG's entropy data mid-scan must raise a descriptive
    ValueError (not return a partially gray image, not IndexError)."""
    import numpy as np

    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(666)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    data = encode_jpeg(img, quant=4)
    assert decode_jpeg(data).shape == (32, 32)  # sanity: intact file decodes
    # chop off the tail (EOI + a chunk of entropy data)
    for cut in (len(data) - 20, len(data) // 2):
        with pytest.raises(ValueError, match="jpeg"):
            decode_jpeg(data[:cut])


def test_jpeg_truncated_at_restart_boundary_fails_loudly():
    """A file cut exactly where an RSTn marker is expected must raise the
    same descriptive ValueError as mid-entropy truncation (the boundary
    check used to index past the buffer -> IndexError)."""
    import numpy as np

    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(666)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    data = encode_jpeg(img, quant=4, restart_interval=1)
    assert decode_jpeg(data).shape == (32, 32)
    # locate the first restart marker in the entropy stream and cut there,
    # and one byte past it (marker byte pair itself truncated)
    first_rst = min(
        data.find(bytes([0xFF, m])) for m in range(0xD0, 0xD8)
        if data.find(bytes([0xFF, m])) != -1
    )
    assert first_rst > 0
    for cut in (first_rst, first_rst + 1):
        with pytest.raises(ValueError, match="jpeg"):
            decode_jpeg(data[:cut])


def test_jpeg_non_interleaved_scan_rejected():
    """A baseline file whose SOS names fewer components than SOF (legal,
    multi-scan non-interleaved) must fail loudly by name — decoding only
    the first scan would silently zero the other planes."""
    import numpy as np

    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quant=4))
    # find the SOS segment (FFDA) and rewrite it to claim 1 component
    i = data.find(b"\xff\xda")
    assert i >= 0
    ns = data[i + 4]
    assert ns == 3
    # new SOS: len=8 (2 + 1 + 2*1 + 3), component 1, tables 0/0
    patched = data[:i] + bytes(
        [0xFF, 0xDA, 0x00, 0x08, 0x01, data[i + 5], data[i + 6],
         data[i + 4 + 2 * 3 + 1], data[i + 4 + 2 * 3 + 2],
         data[i + 4 + 2 * 3 + 3]]
    ) + data[i + 14:]
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(bytes(patched))


def test_jpeg_roundtrip_gray_exact():
    """quant=1 baseline JPEG roundtrips 8-bit gray near-exactly (the DCT
    is orthonormal; only float round noise survives)."""
    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(666)
    img = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_roundtrip_rgb_444_and_420():
    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:20, 0:28]
    img = np.stack(
        [(yy * 5 + 20) % 256, (xx * 4 + 30) % 256, ((yy + xx) * 3) % 256],
        axis=-1,
    ).astype(np.uint8)
    o444 = decode_jpeg(encode_jpeg(img, quant=1))
    assert o444.shape == img.shape
    assert int(np.abs(o444.astype(int) - img.astype(int)).max()) <= 2
    # 4:2:0 exercises the general MCU geometry; chroma averaging makes it
    # lossy but bounded on a smooth gradient
    o420 = decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
    assert o420.shape == img.shape
    assert int(np.abs(o420.astype(int) - img.astype(int)).max()) <= 8


def test_jpeg_lossy_quant_still_close():
    """A real (non-unit) quantization table must decode to something
    visually equivalent on smooth content — mean error ≪ one gray level
    of the gradient step."""
    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=8))
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 4.0


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn resync (what camera JPEGs emit): byte-align, consume the
    marker, reset DC predictors — at several interval lengths."""
    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (33, 41), dtype=np.uint8)
    for ri in (1, 3, 7):
        out = decode_jpeg(encode_jpeg(img, quant=1, restart_interval=ri))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_progressive_rejected_by_name():
    """SOF2 (progressive) is a deliberate scope cut, not a crash."""
    from gan_deeplearning4j_spark.functions.jpegcodec import decode_jpeg

    # minimal SOI + SOF2 header
    sof2 = (b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + b"\x08"
            + b"\x00\x10\x00\x10" + b"\x01" + b"\x01\x11\x00")
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(sof2)


def test_decode_image_jpeg_payload_via_sniffer():
    """decode_image dispatches on magic bytes: a JPEG payload flows
    through the same luma path as PNG."""
    from gan_deeplearning4j_spark.functions.jpegcodec import encode_jpeg

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    got = decode_image(encode_jpeg(rgb, quant=1), 8, 8, fake=False)
    want = to_gray(rgb)
    assert got.shape == want.shape
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 2


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_gray_all_filters(filter_type):
    rng = np.random.default_rng(666 + filter_type)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img, filter_type)), img)


@pytest.mark.parametrize("channels", [3, 4])
def test_png_roundtrip_color(channels):
    rng = np.random.default_rng(666)
    img = rng.integers(0, 256, (9, 11, channels), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img, 4)), img)


def test_pnm_roundtrip():
    rng = np.random.default_rng(666)
    gray = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(gray)), gray)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(rgb)), rgb)


def test_decode_image_real_png_and_luma():
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    got = decode_image(encode_png(rgb), 8, 8, fake=False)
    np.testing.assert_array_equal(got, to_gray(rgb))


def test_decode_features_unfaked_real_png(spark):
    """The registered multimodal_features path: real PNG bytes through
    mapInPandas with fake=False."""
    df = synth_media_df(spark, n=8)
    out = decode_features(df, out_dim=8, fake=False).orderBy("media_id").toPandas()
    assert len(out) == 8
    f = np.stack(out["feature"].to_numpy())
    assert f.shape == (8, 8)
    assert (f >= 0).all() and (f <= 1).all()
    # decoding the same payload twice is bit-identical
    out2 = decode_features(df, out_dim=8, fake=False).orderBy("media_id").toPandas()
    np.testing.assert_array_equal(f, np.stack(out2["feature"].to_numpy()))


def test_decode_features_deterministic(spark):
    df = synth_media_df(spark, n=16)
    out1 = decode_features(df, out_dim=8).orderBy("media_id").toPandas()
    out2 = decode_features(df, out_dim=8).orderBy("media_id").toPandas()
    assert len(out1) == 16
    f1 = np.stack(out1["feature"].to_numpy())
    f2 = np.stack(out2["feature"].to_numpy())
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (16, 8)
    assert (f1 >= 0).all() and (f1 <= 1).all()


def test_resize_images_shape(spark):
    df = synth_media_df(spark, n=4)
    out = resize_images(df, out_w=4, out_h=4).orderBy("media_id").toPandas()
    assert all(len(p) == 16 for p in out["pixels"])


def test_sample_frames_plan_only(spark):
    df = synth_media_df(spark, n=6, kind="video")
    frames = sample_frames(df, every=2).toPandas()
    # 8 frames, every 2nd → 4 per video
    assert len(frames) == 6 * 4
    assert set(frames["frame_no"]) == {0, 2, 4, 6}


def test_audio_frame_energy_shape_and_determinism(spark):
    """Audio path: per-frame RMS rows with the declared cardinality, stable
    across runs (fake decoder is content-hash-seeded)."""
    from gan_deeplearning4j_spark.operators.multimodal import (
        audio_frame_energy,
        synth_media_df,
    )

    media = synth_media_df(spark, n=8, kind="audio")
    out = audio_frame_energy(media, frame_ms=25, duration_ms=200)
    pdf = out.toPandas()
    # 200ms / 25ms = 8 frames per clip
    assert len(pdf) == 8 * 8
    assert set(pdf["frame_no"]) == set(range(8))
    assert ((pdf["rms"] > 0) & (pdf["rms"] < 1)).all()
    pdf2 = audio_frame_energy(media, frame_ms=25, duration_ms=200).toPandas()
    a = pdf.sort_values(["media_id", "frame_no"])["rms"].to_numpy()
    b = pdf2.sort_values(["media_id", "frame_no"])["rms"].to_numpy()
    assert (a == b).all()


def test_jpeg_decodes_foreign_encoder_file():
    """Decode a JPEG produced by a STANDARD encoder (CPython's test-suite
    image — real Annex-K Huffman tables, real quantization, real
    sampling), not just our own encoder's output. Skipped when the
    interpreter doesn't ship its test data."""
    import os
    import sys

    import pytest

    from gan_deeplearning4j_spark.functions.jpegcodec import decode_jpeg

    candidates = [
        os.path.join(
            os.path.dirname(os.__file__), "test", "imghdrdata", "python.jpg"
        ),
        os.path.join(
            os.path.dirname(os.__file__), "test", "test_email", "data",
            "python.jpg",
        ),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        pytest.skip("no CPython test-suite JPEG available")
    img = decode_jpeg(open(path, "rb").read())
    assert img.dtype == np.uint8
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] >= 8 and img.shape[1] >= 8
    # real image content: not a constant field, full 8-bit usage plausible
    assert int(img.max()) - int(img.min()) > 50


def test_jpeg_roundtrip_geometry_sweep():
    """Every MCU-geometry edge (1-pixel dims, non-multiple-of-8/16 dims,
    4:2:0 chroma padding, restart resync on ragged grids) roundtrips
    within codec error bounds."""
    from gan_deeplearning4j_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(1)
    for h in (1, 3, 8, 9, 17):
        for w in (1, 5, 8, 16, 23):
            g = rng.integers(0, 256, (h, w), dtype=np.uint8)
            o = decode_jpeg(encode_jpeg(g, quant=1))
            assert o.shape == g.shape
            assert int(np.abs(o.astype(int) - g.astype(int)).max()) <= 1
            c = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            o2 = decode_jpeg(encode_jpeg(c, quant=1))
            assert o2.shape == c.shape
            assert int(np.abs(o2.astype(int) - c.astype(int)).max()) <= 2
            o3 = decode_jpeg(encode_jpeg(c, quant=1, subsample=True))
            assert o3.shape == c.shape
            o4 = decode_jpeg(encode_jpeg(g, quant=1, restart_interval=2))
            assert int(np.abs(o4.astype(int) - g.astype(int)).max()) <= 1


# ---------------------------------------------------------------------------
# WAV codec (clean-room RIFF/WAVE PCM)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_exact():
    import numpy as np

    from gan_deeplearning4j_spark.functions.wavcodec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    for n, ch, sr in [(1, 1, 8000), (160, 1, 16000), (441, 2, 44100),
                      (1000, 4, 48000)]:
        s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
        out, rate = decode_wav(encode_wav(s, sr))
        assert rate == sr
        assert out.shape == (n, ch)
        assert np.array_equal(out, s)
    # mono 1-D input round-trips as (n, 1)
    m = rng.integers(-32768, 32768, 64, dtype=np.int16)
    out, _ = decode_wav(encode_wav(m, 16000))
    assert np.array_equal(out[:, 0], m)


def test_wav_foreign_encoder_and_decoder():
    """Cross-validate against the stdlib `wave` module in BOTH directions:
    our decoder reads its output; it reads our encoder's output."""
    import io
    import wave

    import numpy as np

    from gan_deeplearning4j_spark.functions.wavcodec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(s.astype("<i2").tobytes())
    out, rate = decode_wav(buf.getvalue())
    assert rate == 22050 and np.array_equal(out, s)

    with wave.open(io.BytesIO(encode_wav(s, 22050)), "rb") as r:
        assert (r.getnchannels(), r.getsampwidth(), r.getframerate()) == (
            2, 2, 22050)
        back = np.frombuffer(
            r.readframes(r.getnframes()), dtype="<i2"
        ).reshape(-1, 2)
    assert np.array_equal(back, s)


def test_wav_skips_foreign_chunks_and_decodes_pcm8():
    import struct

    import numpy as np

    from gan_deeplearning4j_spark.functions.wavcodec import (
        decode_wav,
        encode_wav,
    )

    # splice a LIST chunk (odd size -> padded) between fmt and data
    s = np.arange(-5, 5, dtype=np.int16)
    wav = bytearray(encode_wav(s, 8000))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(wav[:36]) + extra + bytes(wav[36:])
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out, rate = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out[:, 0], s)

    # hand-built 8-bit PCM: unsigned bytes widen to centered int16
    data = bytes(range(0, 256, 32))
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 8000, 1, 8, b"data", len(data))
    out8, _ = decode_wav(hdr + data)
    assert out8.dtype == np.int16
    assert list(out8[:, 0]) == [(v - 128) << 8 for v in range(0, 256, 32)]


def test_wav_rejections_are_loud_and_named():
    import struct

    import numpy as np
    import pytest

    from gan_deeplearning4j_spark.functions.wavcodec import (
        decode_wav,
        encode_wav,
    )

    s = np.zeros(16, dtype=np.int16)
    good = encode_wav(s, 8000)

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:30])
    # IEEE float format tag is refused BY NAME, never silently decoded
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 3)
    with pytest.raises(ValueError, match="IEEE_FLOAT"):
        decode_wav(bytes(bad))
    struct.pack_into("<H", bad, 20, 0xFFFE)
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.zeros(4, dtype=np.float32), 8000)


def test_audio_frame_energy_real_wav_path(spark):
    """fake=False decodes the REAL WAV payloads from synth_media_df and
    matches a direct numpy replay of the same framing math."""
    import hashlib

    import numpy as np

    from gan_deeplearning4j_spark.operators.multimodal import (
        audio_frame_energy,
        synth_media_df,
    )

    media = synth_media_df(spark, n=6, kind="audio")
    pdf = (
        audio_frame_energy(media, frame_ms=25, fake=False)
        .toPandas()
        .sort_values(["media_id", "frame_no"])
        .reset_index(drop=True)
    )
    # 3200 samples @ 16 kHz, 25 ms hop = 400 samples -> 8 frames/clip
    assert len(pdf) == 6 * 8
    for mid in range(6):
        h = hashlib.sha256(f"media-audio-{mid}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        wav = rng.integers(-32768, 32768, 3200, dtype=np.int16)
        w = (wav.astype(np.float32) / 32768.0).reshape(8, 400)
        want = np.sqrt((w * w).mean(axis=1))
        got = pdf[pdf.media_id == mid].rms.to_numpy(dtype=np.float32)
        assert np.allclose(got, want, atol=1e-6)
