"""Tensor kernels (SURVEY §2.8 K1-K10): the engine's non-SQL compute path.

The reference executes these as ND4J layer ops inside DL4J ComputationGraphs
(dense dl4jGANComputerVision.java:155-158,189-196; conv2d 5×5 :135-150,
203-219; maxpool 2×2/1 :141-144,151-154; upsampling ×2 :201-202,210-211;
batchnorm :132-134 et al.; activations :126,162,215,362; forward inference
`net.output` :170,225,314,551,578).

Engine re-expression: stateless numpy kernels over NCHW float32 arrays,
driven from Spark via Arrow-batched ``mapInPandas`` — one Arrow batch plays
the role of one ND4J minibatch (the reference's batchSizePred=500 chunking is
``spark.sql.execution.arrow.maxRecordsPerBatch``). Weights travel as a
broadcast dict (they are MB-scale; data is the TB-scale side).

At 100 TB: inference is embarrassingly parallel — no shuffle at all, the
kernel pipeline fuses into a single mapInPandas stage over the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import DEFAULT_SEED

Weights = dict[str, dict[str, np.ndarray]]


@dataclass
class LayerSpec:
    """One named layer of a network DAG (the reference's addLayer(name, ...)).

    kinds and cfg keys:
    - dense:     units, activation
    - conv2d:    filters, kernel, stride, pad, activation   (NCHW)
    - maxpool:   kernel, stride
    - upsample:  factor
    - batchnorm: eps (uses running mean/var params)
    - reshape:   shape (C,H,W) — K7 layout preprocessor, metadata-only
    - flatten:   —
    """

    name: str
    kind: str
    cfg: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def act(x: np.ndarray, name: str | None) -> np.ndarray:
    """K6 activations (tanh default, java:126; sigmoid :162; softmax :362)."""
    if name in (None, "identity", "linear"):
        return x
    if name == "tanh":
        return np.tanh(x)
    if name == "sigmoid":
        return 1.0 / (1.0 + np.exp(-x))
    if name == "relu":
        return np.maximum(x, 0.0)
    if name == "leakyrelu":
        return np.where(x > 0, x, 0.2 * x)
    if name == "softmax":
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)
    raise ValueError(f"unknown activation {name}")


def act_grad(y: np.ndarray, name: str | None) -> np.ndarray:
    """dact/dpre expressed in terms of the activation output y."""
    if name in (None, "identity", "linear"):
        return np.ones_like(y)
    if name == "tanh":
        return 1.0 - y * y
    if name == "sigmoid":
        return y * (1.0 - y)
    if name == "relu":
        return (y > 0).astype(y.dtype)
    if name == "leakyrelu":
        return np.where(y > 0, 1.0, 0.2).astype(y.dtype)
    raise ValueError(f"no elementwise grad for {name}")


def k_dense(x: np.ndarray, W: np.ndarray, b: np.ndarray) -> np.ndarray:
    """K1: (n, in) @ (in, out) + (out,)."""
    return x @ W + b


def _im2col(x: np.ndarray, kh: int, kw: int, stride: int, pad: int):
    n, c, h, w = x.shape
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (x.shape[2] - kh) // stride + 1
    ow = (x.shape[3] - kw) // stride + 1
    s = x.strides
    windows = np.lib.stride_tricks.as_strided(
        x,
        shape=(n, c, oh, ow, kh, kw),
        strides=(s[0], s[1], s[2] * stride, s[3] * stride, s[2], s[3]),
        writeable=False,
    )
    # (n, oh, ow, c*kh*kw)
    return windows.transpose(0, 2, 3, 1, 4, 5).reshape(n, oh, ow, c * kh * kw), oh, ow


def k_conv2d(
    x: np.ndarray, W: np.ndarray, b: np.ndarray, stride: int = 1, pad: int = 0
) -> np.ndarray:
    """K2: NCHW conv via im2col + matmul (the BLAS path, like ND4J).
    W: (out_c, in_c, kh, kw), b: (out_c,)."""
    out_c, in_c, kh, kw = W.shape
    cols, oh, ow = _im2col(x, kh, kw, stride, pad)
    out = cols @ W.reshape(out_c, -1).T + b  # (n, oh, ow, out_c)
    return out.transpose(0, 3, 1, 2)


def k_maxpool(x: np.ndarray, kernel: int = 2, stride: int = 1) -> np.ndarray:
    """K3: sliding-window max over NCHW (kernel 2×2 stride 1, java:141-144)."""
    n, c, h, w = x.shape
    x4 = x.reshape(n * c, 1, h, w)
    cols, oh, ow = _im2col(x4, kernel, kernel, stride, 0)
    return cols.max(axis=-1).reshape(n, c, oh, ow)


def k_upsample(x: np.ndarray, factor: int = 2) -> np.ndarray:
    """K5: nearest-neighbor ×factor (java:201-202)."""
    return np.repeat(np.repeat(x, factor, axis=-1), factor, axis=-2)


def k_batchnorm(
    x: np.ndarray, gamma, beta, mean, var, eps: float = 1e-5
) -> np.ndarray:
    """K4/A5 inference mode: (x-μ)/√(σ²+ε)·γ+β. For NCHW inputs the stats
    are per-channel; for (n, f) per-feature."""
    if x.ndim == 4:
        shp = (1, -1, 1, 1)
        return (x - mean.reshape(shp)) / np.sqrt(var.reshape(shp) + eps) * gamma.reshape(shp) + beta.reshape(shp)
    return (x - mean) / np.sqrt(var + eps) * gamma + beta


def clip_grad(g: np.ndarray, threshold: float = 1.0) -> np.ndarray:
    """K9 (java:123-124): element-wise |v| ≤ threshold."""
    return np.clip(g, -threshold, threshold)


# ---------------------------------------------------------------------------
# network forward (K10)
# ---------------------------------------------------------------------------

def init_weights(specs: list[LayerSpec], input_dim: int, seed: int = DEFAULT_SEED) -> Weights:
    """Xavier init (java:127), deterministic per (seed, layer index)."""
    weights: Weights = {}
    dim: tuple = (input_dim,)
    for i, spec in enumerate(specs):
        rng = np.random.default_rng(seed + i * 1009)
        if spec.kind == "dense":
            fan_in = int(np.prod(dim))
            units = spec.cfg["units"]
            limit = np.sqrt(6.0 / (fan_in + units))
            weights[spec.name] = {
                "W": rng.uniform(-limit, limit, (fan_in, units)).astype(np.float32),
                "b": np.zeros(units, dtype=np.float32),
            }
            dim = (units,)
        elif spec.kind == "conv2d":
            c = dim[0]
            f, k = spec.cfg["filters"], spec.cfg["kernel"]
            limit = np.sqrt(6.0 / (c * k * k + f * k * k))
            weights[spec.name] = {
                "W": rng.uniform(-limit, limit, (f, c, k, k)).astype(np.float32),
                "b": np.zeros(f, dtype=np.float32),
            }
            stride, pad = spec.cfg.get("stride", 1), spec.cfg.get("pad", 0)
            oh = (dim[1] + 2 * pad - k) // stride + 1
            ow = (dim[2] + 2 * pad - k) // stride + 1
            dim = (f, oh, ow)
        elif spec.kind == "batchnorm":
            nf = dim[0] if len(dim) == 3 else int(np.prod(dim))
            weights[spec.name] = {
                "gamma": np.ones(nf, dtype=np.float32),
                "beta": np.zeros(nf, dtype=np.float32),
                "mean": np.zeros(nf, dtype=np.float32),
                "var": np.ones(nf, dtype=np.float32),
            }
        elif spec.kind == "maxpool":
            k, stride = spec.cfg.get("kernel", 2), spec.cfg.get("stride", 1)
            dim = (dim[0], (dim[1] - k) // stride + 1, (dim[2] - k) // stride + 1)
        elif spec.kind == "upsample":
            f = spec.cfg.get("factor", 2)
            dim = (dim[0], dim[1] * f, dim[2] * f)
        elif spec.kind == "reshape":
            dim = tuple(spec.cfg["shape"])
        elif spec.kind == "flatten":
            dim = (int(np.prod(dim)),)
    return weights


def forward(x: np.ndarray, specs: list[LayerSpec], weights: Weights) -> np.ndarray:
    """K10 full forward pass (net.output, java:170 et al.)."""
    out = x.astype(np.float32)
    for spec in specs:
        w = weights.get(spec.name, {})
        if spec.kind == "dense":
            if out.ndim > 2:
                out = out.reshape(out.shape[0], -1)
            out = act(k_dense(out, w["W"], w["b"]), spec.cfg.get("activation", "tanh"))
        elif spec.kind == "conv2d":
            out = act(
                k_conv2d(out, w["W"], w["b"], spec.cfg.get("stride", 1), spec.cfg.get("pad", 0)),
                spec.cfg.get("activation", "tanh"),
            )
        elif spec.kind == "maxpool":
            out = k_maxpool(out, spec.cfg.get("kernel", 2), spec.cfg.get("stride", 1))
        elif spec.kind == "upsample":
            out = k_upsample(out, spec.cfg.get("factor", 2))
        elif spec.kind == "batchnorm":
            out = k_batchnorm(out, w["gamma"], w["beta"], w["mean"], w["var"], spec.cfg.get("eps", 1e-5))
        elif spec.kind == "reshape":
            out = out.reshape(out.shape[0], *spec.cfg["shape"])
        elif spec.kind == "flatten":
            out = out.reshape(out.shape[0], -1)
        else:
            raise ValueError(f"unknown layer kind {spec.kind}")
    return out


# ---------------------------------------------------------------------------
# Spark integration: distributed inference via mapInPandas
# ---------------------------------------------------------------------------

def apply_network(
    df: DataFrame,
    specs: list[LayerSpec],
    weights: Weights,
    features_col: str = "features",
    output_col: str = "output",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed forward pass: one Arrow batch = one minibatch.

    Weights are shipped once per task via Spark broadcast; the scan→kernel
    pipeline is a single narrow stage (no shuffle).
    """
    spark = df.sparkSession
    keep_cols = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != features_col
    ]
    bc = spark.sparkContext.broadcast(weights)

    out_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(
        out_fields + [T.StructField(output_col, T.ArrayType(T.FloatType()))]
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc.value
        for pdf in batches:
            x = np.stack(pdf[features_col].to_numpy())
            y = forward(x, specs, w)
            y = y.reshape(y.shape[0], -1)
            out = pdf[keep_cols].copy()
            out[output_col] = list(y.astype(np.float32))
            yield out

    return df.mapInPandas(infer, schema=out_schema)
