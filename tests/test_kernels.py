"""Numpy-fixture tests for the tensor kernels (SURVEY §5.2: non-SQL kernels
get numpy-vs-engine fixtures instead of a DuckDB oracle)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gan_deeplearning4j_spark.kernels import (
    LayerSpec,
    act,
    apply_network,
    forward,
    init_weights,
    k_batchnorm,
    k_conv2d,
    k_dense,
    k_maxpool,
    k_upsample,
)

RNG = np.random.default_rng(666)


def naive_conv2d(x, W, b, stride, pad):
    n, c, h, w = x.shape
    oc, ic, kh, kw = W.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (xp.shape[2] - kh) // stride + 1
    ow = (xp.shape[3] - kw) // stride + 1
    out = np.zeros((n, oc, oh, ow), dtype=np.float64)
    for ni in range(n):
        for oci in range(oc):
            for i in range(oh):
                for j in range(ow):
                    patch = xp[ni, :, i * stride : i * stride + kh, j * stride : j * stride + kw]
                    out[ni, oci, i, j] = (patch * W[oci]).sum() + b[oci]
    return out


def test_conv2d_matches_naive():
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    W = RNG.standard_normal((4, 3, 5, 5)).astype(np.float32)
    b = RNG.standard_normal(4).astype(np.float32)
    for stride, pad in [(1, 0), (2, 2), (1, 2)]:
        got = k_conv2d(x, W, b, stride, pad)
        want = naive_conv2d(x, W, b, stride, pad)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_maxpool_2x2_stride1():
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    out = k_maxpool(x, 2, 1)
    want = np.array([[[[5, 6, 7], [9, 10, 11], [13, 14, 15]]]], dtype=np.float32)
    np.testing.assert_array_equal(out, want)


def test_upsample_nearest():
    x = np.array([[[[1.0, 2.0], [3.0, 4.0]]]], dtype=np.float32)
    out = k_upsample(x, 2)
    want = np.array(
        [[[[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]]], dtype=np.float32
    )
    np.testing.assert_array_equal(out, want)


def test_batchnorm_normalizes():
    x = RNG.standard_normal((64, 10)).astype(np.float32) * 5 + 3
    mean, var = x.mean(axis=0), x.var(axis=0)
    out = k_batchnorm(x, np.ones(10), np.zeros(10), mean, var, eps=1e-8)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-3)


def test_softmax_rows_sum_to_one():
    x = RNG.standard_normal((5, 10)).astype(np.float32)
    np.testing.assert_allclose(act(x, "softmax").sum(axis=1), 1.0, rtol=1e-5)


def test_dense_forward_shapes_like_reference_dis():
    """The reference discriminator's flat-input contract: (n, 784) → (n, 1)
    (shape smoke check pattern, dl4jGANComputerVision.java:167-170)."""
    specs = [
        LayerSpec("dis_dense_1", "dense", {"units": 64, "activation": "tanh"}),
        LayerSpec("dis_dense_2", "dense", {"units": 32, "activation": "tanh"}),
        LayerSpec("dis_out", "dense", {"units": 1, "activation": "sigmoid"}),
    ]
    w = init_weights(specs, 784, seed=666)
    x = RNG.standard_normal((10, 784)).astype(np.float32)
    y = forward(x, specs, w)
    assert y.shape == (10, 1)
    assert ((y >= 0) & (y <= 1)).all()
    # determinism: same seed → same init → same output
    w2 = init_weights(specs, 784, seed=666)
    np.testing.assert_array_equal(forward(x, specs, w2), y)


def test_conv_pipeline_shapes_like_reference_gen():
    """Generator topology shape contract (java:173-221): latent → dense 6272
    → (128,7,7) → upsample ×2 → conv → upsample ×2 → conv → (1,28,28)."""
    specs = [
        LayerSpec("gen_dense_1", "dense", {"units": 6272, "activation": "tanh"}),
        LayerSpec("gen_reshape", "reshape", {"shape": (128, 7, 7)}),
        LayerSpec("gen_up_1", "upsample", {"factor": 2}),
        LayerSpec("gen_conv_1", "conv2d", {"filters": 64, "kernel": 5, "stride": 1, "pad": 2, "activation": "tanh"}),
        LayerSpec("gen_up_2", "upsample", {"factor": 2}),
        LayerSpec("gen_conv_2", "conv2d", {"filters": 1, "kernel": 5, "stride": 1, "pad": 2, "activation": "sigmoid"}),
        LayerSpec("gen_flat", "flatten"),
    ]
    w = init_weights(specs, 2, seed=666)
    z = RNG.uniform(-1, 1, (4, 2)).astype(np.float32)
    img = forward(z, specs, w)
    assert img.shape == (4, 784)


def test_apply_network_distributed_matches_local(spark):
    """mapInPandas forward == local numpy forward, row-for-row."""
    specs = [
        LayerSpec("d1", "dense", {"units": 16, "activation": "tanh"}),
        LayerSpec("d2", "dense", {"units": 4, "activation": "sigmoid"}),
    ]
    w = init_weights(specs, 8, seed=666)
    x = RNG.standard_normal((50, 8)).astype(np.float32)
    pdf = [(i, [float(v) for v in x[i]]) for i in range(50)]
    df = spark.createDataFrame(pdf, "id: long, features: array<float>")
    out = apply_network(df, specs, w).orderBy("id").toPandas()
    got = np.stack(out["output"].to_numpy())
    want = forward(x, specs, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
