"""Random generation (SURVEY §2.3 R1-R3, R5).

Determinism discipline (R5, seed 666 — dl4jGANComputerVision.java:75): Spark's
``rand``/``randn`` are seeded per-partition, so bitwise reproducibility
additionally requires pinning the partitioning of the generating DataFrame.
``latent_grid`` is fully deterministic (no RNG at all) and preserves the
reference's strict row-major consumption order (W3,
dl4jGANComputerVision.java:385-389 / gan.ipynb raw 416-423).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import DEFAULT_SEED


def seeded_rand(seed: int = DEFAULT_SEED) -> Column:
    """R2 uniform [0,1)."""
    return F.rand(seed)


def seeded_randn(seed: int = DEFAULT_SEED) -> Column:
    """R1 standard normal."""
    return F.randn(seed)


_P31 = 2147483647  # Mersenne prime 2^31-1 (Lehmer modulus)


def counter_rand(id_col: Column, seed: int = DEFAULT_SEED,
                 stream: int = 0) -> Column:
    """Counter-based uniform [0,1): three Lehmer steps over (id + f(seed,
    stream)). Unlike ``F.rand`` — whose stream is seeded PER PARTITION, so
    the same row draws a different value under a different layout — this is
    a pure function of the row id: layout-independent, shuffle-safe,
    re-executable after task retries at 100 TB, and exactly replicable in
    ANSI SQL (integer arithmetic only, no engine RNG). The counter-based
    design follows Salmon et al., 'Parallel Random Numbers: As Easy as 1, 2,
    3' (SC'11).

    All intermediates stay < 2^47, safe under Spark 4 ANSI overflow checks.
    """
    c = (seed + 131071 * stream) * 2654435761 % _P31
    s = (id_col + F.lit(c)) % F.lit(_P31)
    for _ in range(3):
        s = (s * F.lit(48271)) % F.lit(_P31)
    return s.cast("double") / F.lit(float(_P31))


def counter_randn(id_col: Column, seed: int = DEFAULT_SEED,
                  stream: int = 0) -> Column:
    """Counter-based standard normal via Box-Muller over two independent
    counter_rand streams. ln(1-u) keeps the log argument in (0,1]."""
    u1 = counter_rand(id_col, seed, stream)
    u2 = counter_rand(id_col, seed, stream + 7919)
    import math

    return F.sqrt(-2.0 * F.log(1.0 - u1)) * F.cos(2.0 * math.pi * u2)


def random_vector(dim: int, seed: int = DEFAULT_SEED, dist: str = "randn") -> Column:
    """R1/R2 vector form: array of independent draws (one seed per element so
    columns are independent)."""
    gen = F.randn if dist == "randn" else F.rand
    return F.array(*[gen(seed + i) for i in range(dim)])


def latent_grid(spark: SparkSession, side: int = 10) -> DataFrame:
    """R3: linspace(-1,1,side) ⊗ linspace(-1,1,side) in row-major order
    (i outer, j inner), with a deterministic ``grid_id`` = i*side + j.

    Reference: Nd4j.linspace(-1,1,10) + nested loop
    (dl4jGANComputerVision.java:382-389).
    """
    n = side * side
    step = F.lit(2.0 / (side - 1))
    df = spark.range(n).withColumnRenamed("id", "grid_id")
    gi = (F.col("grid_id") / side).cast("long")
    gj = F.col("grid_id") % side
    return df.select(
        "grid_id",
        gi.alias("gi"),
        gj.alias("gj"),
        (F.lit(-1.0) + gi * step).alias("zi"),
        (F.lit(-1.0) + gj * step).alias("zj"),
    )
