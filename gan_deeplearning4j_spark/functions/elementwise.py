"""Element-wise transforms and activations (SURVEY §2.2 P1-P9, §2.8 K6/K9).

All pure Catalyst column expressions — JVM-side, codegen'd, no Python in the
hot path. Array-valued variants use higher-order functions (``transform`` /
``aggregate``) so they stay vectorized over ``array<T>`` columns.

Reference parity:
- P1 min-max normalize: gan.ipynb raw 81-84 (x/255 special case).
- P5 affine rescale:    dl4jGANComputerVision.java:420,465 (rand*2-1).
- P6 label smoothing:   dl4jGANComputerVision.java:405-406,414-421.
- P8/K9 clip:           GradientNormalization.ClipElementWiseAbsoluteValue,
                        threshold 1.0 (dl4jGANComputerVision.java:123-124).
- K6 activations:       tanh default (:126), sigmoid heads (:162,215),
                        softmax(10) (:362).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minmax_normalize_expr(col: Column, mn: Column, mx: Column) -> Column:
    """P1 general form: (v - min) / (max - min). Callers supply the
    aggregated min/max (broadcast-joined, not windowed, at scale)."""
    return (col - mn) / (mx - mn)


def affine_rescale(col: Column, scale: float = 2.0, shift: float = -1.0) -> Column:
    """P5: x*scale + shift (reference: uniform [0,1] → [-1,1])."""
    return col * F.lit(scale) + F.lit(shift)


def clip(col: Column, lo: float = -1.0, hi: float = 1.0) -> Column:
    """P8/K9 element-wise clip: clamp scalar to [lo, hi]."""
    return F.greatest(F.least(col, F.lit(hi)), F.lit(lo))


def clip_arr(col: Column, lo: float = -1.0, hi: float = 1.0) -> Column:
    """P8 for array<double> columns."""
    return F.transform(col, lambda v: F.greatest(F.least(v, F.lit(hi)), F.lit(lo)))


def sigmoid(col: Column) -> Column:
    """K6 sigmoid: 1/(1+exp(-x)) — spelled out (identical in the DuckDB oracle)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def tanh_arr(col: Column) -> Column:
    """K6 tanh over array<double>."""
    return F.transform(col, F.tanh)


def softmax_arr(col: Column) -> Column:
    """K6 softmax over array<double>: exp(v)/sum(exp). Max-subtraction for
    numerical stability (the reference's ND4J softmax does the same)."""
    mx = F.array_max(col)
    exps = F.transform(col, lambda v: F.exp(v - mx))
    denom = F.aggregate(exps, F.lit(0.0), lambda acc, v: acc + v)
    return F.transform(exps, lambda e: e / denom)


def label_smooth(label: Column, seed: int, sigma: float = 0.05) -> Column:
    """P6: label + N(0, sigma²) noise.

    Compat note: the reference draws the noise ONCE and reuses it for every
    batch (dl4jGANComputerVision.java:405-406) — a quirk, not a semantic.
    Engine default is fresh per-row noise; freeze by materializing the noise
    column once and joining it back.
    """
    return label + F.randn(seed) * F.lit(sigma)
