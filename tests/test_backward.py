"""Numeric-gradient checks for the full backward kernel set (conv2d, maxpool,
upsample, batchnorm, reshape) — completing the trainable DCGAN topology."""

from __future__ import annotations

import numpy as np
import pytest

from gan_deeplearning4j_spark.kernels import LayerSpec, forward_cached, init_weights
from gan_deeplearning4j_spark.pipeline import GanPipeline, net_grads

RNG = np.random.default_rng(7)


def _numeric_check(specs, input_shape, params_to_check, n=4, tol=2e-2):
    shape = (input_shape,) if isinstance(input_shape, int) else tuple(input_shape)
    if len(shape) == 1:
        shape_arg = shape[0]
    else:
        shape_arg = shape
    w = init_weights(specs, shape_arg, seed=666)
    x = RNG.standard_normal((n, *shape)).astype(np.float64)
    # binary target on the final dense sigmoid unit
    y = RNG.integers(0, 2, (n, 1)).astype(np.float64)

    grads, _ = net_grads(x, y, specs, {k: {p: a.copy() for p, a in v.items()} for k, v in w.items()})

    def loss_at(wmod):
        p, _ = forward_cached(x.astype(np.float32), specs, wmod, training=True)
        eps = 1e-7
        return float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).mean())

    eps = 1e-3
    for layer, pname, idx in params_to_check:
        wp = {l: {p: a.copy().astype(np.float64) for p, a in ps.items()} for l, ps in w.items()}
        wm = {l: {p: a.copy().astype(np.float64) for p, a in ps.items()} for l, ps in w.items()}
        wp[layer][pname][idx] += eps
        wm[layer][pname][idx] -= eps
        num = (loss_at(wp) - loss_at(wm)) / (2 * eps)
        ana = grads[layer][pname][idx]
        assert abs(num - ana) < tol, (layer, pname, idx, num, ana)


def test_conv_stack_gradients():
    specs = [
        LayerSpec("c1", "conv2d", {"filters": 3, "kernel": 3, "stride": 1, "pad": 1, "activation": "tanh"}),
        LayerSpec("p1", "maxpool", {"kernel": 2, "stride": 2}),
        LayerSpec("f", "flatten"),
        LayerSpec("out", "dense", {"units": 1, "activation": "sigmoid"}),
    ]
    _numeric_check(
        specs, (1, 6, 6),
        [("c1", "W", (0, 0, 1, 1)), ("c1", "b", (2,)), ("out", "W", (3, 0))],
    )


def test_upsample_batchnorm_gradients():
    specs = [
        LayerSpec("d1", "dense", {"units": 8, "activation": "tanh"}),
        LayerSpec("r", "reshape", {"shape": (2, 2, 2)}),
        LayerSpec("u", "upsample", {"factor": 2}),
        LayerSpec("bn", "batchnorm", {}),
        LayerSpec("f", "flatten"),
        LayerSpec("out", "dense", {"units": 1, "activation": "sigmoid"}),
    ]
    _numeric_check(
        specs, (4,),
        [("d1", "W", (1, 3)), ("bn", "gamma", (1,)), ("bn", "beta", (0,)), ("out", "W", (5, 0))],
        n=8,
    )


def test_strided_conv_gradients():
    """The reference discriminator's stride-2 conv (java:135-140)."""
    specs = [
        LayerSpec("c1", "conv2d", {"filters": 2, "kernel": 5, "stride": 2, "pad": 0, "activation": "tanh"}),
        LayerSpec("f", "flatten"),
        LayerSpec("out", "dense", {"units": 1, "activation": "sigmoid"}),
    ]
    _numeric_check(
        specs, (1, 9, 9),
        [("c1", "W", (1, 0, 2, 3)), ("out", "W", (0, 0))],
    )


def test_conv_gan_trains_end_to_end(spark):
    """A small DCGAN — conv discriminator, upsampling conv generator — runs
    the full distributed adversarial loop (the reference's actual topology
    family, java:118-310) and is deterministic across runs."""
    side = 8
    rng = np.random.default_rng(666)
    # 'images': blobs with class-dependent quadrant intensity
    y = rng.integers(0, 2, 200)
    x = rng.uniform(0, 0.2, (200, side * side)).astype(np.float32)
    x[y == 1, : side * side // 2] += 0.6

    def run():
        p = GanPipeline.dcgan(side=side, latent_dim=2, base_filters=4,
                              n_classes=2, seed=666)
        return p.fit(spark, x, y, epochs=2, batch_rows=64, n_workers=2, avg_freq=3)

    h1, h2 = run(), run()
    assert len(h1) == 2
    assert all(np.isfinite(h["dis_loss"]) and np.isfinite(h["gan_loss"]) for h in h1)
    assert h1 == h2  # bitwise-deterministic distributed conv training
