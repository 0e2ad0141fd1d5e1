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
    """Non-PNG/PNM payloads (e.g. JPEG) still need an external library."""
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not decodable", 4, 4, fake=False)


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
