"""Round-5 surface widening.

Opens with the fixed-point GAN-inference twin the round-4 verdict asked
for: the SAME distributed inference machinery as ``gan_grid_inference``
(R3 latent grid -> K10 ``kernels.apply_network`` mapInPandas forward ->
W3 row-major ordering; reference dl4jGANComputerVision.java:550-570) run
over a literal-weight integer network, so the GAN serving path earns a
hash-grade DuckDB oracle the way ``pq_fixed_topk`` did for ANN.

Exactness argument (same discipline as the PQ twins): latents quantize
to int64 via floor(z * 2^6) — a power-of-two scale on the identical IEEE
double is engine-invariant — and every weight is a small integer, so the
float32 kernel arithmetic is EXACT (every intermediate is an integer
< 2^24, and float add/mul on such integers is lossless in any
accumulation order).  The oracle replays the identical forward pass in
pure BIGINT math from the same literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# Fixed-weight generator: 2 -> dense(8, relu) -> dense(2, linear)
# ---------------------------------------------------------------------------

_GRID_SIDE = 10
_Z_SCALE = 64          # Q6 latent quantization: floor(z * 64)
_N_HIDDEN = 8
_N_OUT = 2


def _gan_fixed_ints() -> tuple[list, list, list, list]:
    """Deterministic small-integer weights (pure python ints — the single
    source of truth for BOTH the numpy kernel weights and the SQL oracle
    literals)."""
    w1 = [[((3 * i + 5 * j + 1) % 15) - 7 for j in range(_N_HIDDEN)]
          for i in range(2)]
    b1 = [(j % 5) - 2 for j in range(_N_HIDDEN)]
    w2 = [[((7 * j + 11 * k + 3) % 15) - 7 for k in range(_N_OUT)]
          for j in range(_N_HIDDEN)]
    b2 = [10 * k + 1 for k in range(_N_OUT)]
    return w1, b1, w2, b2


def _gan_fixed_oracle() -> str:
    w1, b1, w2, b2 = _gan_fixed_ints()
    s = _GRID_SIDE
    step = f"(2.0/{s - 1}.0)"
    hidden = ", ".join(
        f"GREATEST(0, ({w1[0][j]})*ziq + ({w1[1][j]})*zjq + ({b1[j]})) AS h{j}"
        for j in range(_N_HIDDEN)
    )
    outs = ", ".join(
        "CAST("
        + " + ".join(f"({w2[j][k]})*h{j}" for j in range(_N_HIDDEN))
        + f" + ({b2[k]}) AS BIGINT) AS px{k}_q"
        for k in range(_N_OUT)
    )
    return f"""
WITH g AS (
  SELECT grid_id,
         CAST(floor((-1.0 + (grid_id // {s}) * {step}) * {_Z_SCALE})
              AS BIGINT) AS ziq,
         CAST(floor((-1.0 + (grid_id % {s}) * {step}) * {_Z_SCALE})
              AS BIGINT) AS zjq
  FROM range({s * s}) AS t(grid_id)
), h AS (
  SELECT grid_id, {hidden} FROM g
)
SELECT grid_id, {outs} FROM h ORDER BY grid_id
"""


@register(
    "gan_grid_inference_fixed",
    oracle=_gan_fixed_oracle(),
    doc="Hash-grade twin of gan_grid_inference (K10+R3+W3, "
        "dl4jGANComputerVision.java:550-570): the REAL distributed "
        "inference path — latent_grid (R3 row-major) -> "
        "kernels.apply_network mapInPandas forward (K10) — over a "
        "literal-weight integer generator (2 -> dense-8 relu -> dense-2 "
        "linear). Latents quantize via floor(z*2^6) (power-of-two scale "
        "on the identical IEEE double: engine-invariant); with small-"
        "integer weights every float32 intermediate is an integer < 2^24 "
        "so the kernel arithmetic is exact, and the DuckDB oracle replays "
        "the identical forward pass in pure BIGINT math from the same "
        "literals — the pq_fixed_topk evidence pattern applied to the GAN "
        "serving path",
)
def q_gan_grid_inference_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.random import latent_grid
    from .kernels import LayerSpec, apply_network

    w1, b1, w2, b2 = _gan_fixed_ints()
    weights = {
        "g1": {"W": np.array(w1, dtype=np.float32),
               "b": np.array(b1, dtype=np.float32)},
        "g2": {"W": np.array(w2, dtype=np.float32),
               "b": np.array(b2, dtype=np.float32)},
    }
    specs = [
        LayerSpec("g1", "dense", {"units": _N_HIDDEN, "activation": "relu"}),
        LayerSpec("g2", "dense", {"units": _N_OUT, "activation": "linear"}),
    ]
    grid = latent_grid(spark, _GRID_SIDE).select(
        "grid_id",
        F.array(
            F.floor(F.col("zi") * _Z_SCALE).cast("float"),
            F.floor(F.col("zj") * _Z_SCALE).cast("float"),
        ).alias("features"),
    )
    out = apply_network(grid, specs, weights, keep_cols=["grid_id"])
    return out.select(
        "grid_id",
        F.element_at("output", 1).cast("long").alias("px0_q"),
        F.element_at("output", 2).cast("long").alias("px1_q"),
    ).orderBy("grid_id")
