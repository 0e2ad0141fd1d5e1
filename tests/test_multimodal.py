"""Multimodal plumbing tests: the Spark-side schema/batching/UDF wiring is
real; the codec is the deterministic fake (decode stub raises without it)."""

from __future__ import annotations

import numpy as np
import pytest

from gan_deeplearning4j_spark.operators.multimodal import (
    decode_features,
    decode_image,
    resize_images,
    sample_frames,
    synth_media_df,
)


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", 4, 4, fake=False)


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
