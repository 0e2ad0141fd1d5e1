"""Aggregation operators (SURVEY §2.4): parameter averaging, losses, accuracy,
batch-norm statistics.

A1 — synchronous parameter averaging — is the reference's flagship aggregate
(ParameterAveragingTrainingMaster, dl4jGANComputerVision.java:324-330): the
global model is the element-wise mean of worker parameter vectors. Two
physical forms here:

1. ``parameter_average_sql`` — posexplode → groupBy(keys, pos) → avg →
   (optionally) re-collect. Pure SQL, DuckDB-oracleable, but explodes
   |params| × dim rows: the right shape when the "model" is a big long-form
   table already.
2. ``parameter_average_arrays`` — no explode: per-group fold of arrays with
   zip_with inside an aggregate over collect_list, or (for wide vectors) the
   applyInPandas fast path in kernels.py. O(groups) shuffle rows instead of
   O(groups × dim).

Scale: parameters are tiny relative to data (MB, not TB) — either form is a
broadcast-scale shuffle. The same operators double as general vector-column
aggregates (embedding centroids per key at 100 TB: posexplode form shuffles
rows × dim — use the array fold form, one shuffle row per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_vectors(
    df: DataFrame, vec_col: str, keys: list[str], pos_col: str = "pos",
    val_col: str = "value",
) -> DataFrame:
    """Long-form view: one row per (keys..., position, value), 0-based pos."""
    return df.select(
        *keys,
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(pos_col, val_col),
    )


def parameter_average_sql(
    df: DataFrame, vec_col: str, keys: list[str]
) -> DataFrame:
    """A1, pure-SQL form: element-wise mean of vectors per key group."""
    return (
        explode_vectors(df, vec_col, keys)
        .groupBy(*keys, "pos")
        .agg(F.avg("value").alias("avg_value"))
    )


def parameter_average_arrays(
    df: DataFrame, vec_col: str, keys: list[str], out_col: str = "avg_vec"
) -> DataFrame:
    """A1, array-native form: sum arrays with a zip_with fold, divide by count.
    One shuffle row per group (vs × dim for the explode form)."""
    summed = df.groupBy(*keys).agg(
        F.count("*").alias("__n"),
        F.aggregate(
            F.collect_list(F.col(vec_col).cast("array<double>")),
            F.expr(f"array_repeat(0.0D, size(first({vec_col})))"),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("__sum"),
    )
    return summed.select(
        *keys,
        F.transform(F.col("__sum"), lambda s: s / F.col("__n")).alias(out_col),
    )


def batchnorm_stats(df: DataFrame, vec_col: str, keys: list[str]) -> DataFrame:
    """A5 training-mode statistics: per-element mean and (sample) variance per
    group — the μ/σ² of a BatchNormalization layer
    (dl4jGANComputerVision.java:132-134 et al.)."""
    return (
        explode_vectors(df, vec_col, keys)
        .groupBy(*keys, "pos")
        .agg(
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
        )
    )


def binary_xent(p: Column, y: Column) -> Column:
    """A2 per-row binary cross-entropy (LossFunctions.XENT + sigmoid,
    dl4jGANComputerVision.java:159-163). Aggregate with avg()."""
    return -(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))


def categorical_xent(logits: Column, label: Column) -> Column:
    """A3 per-row categorical cross-entropy from raw logits (MCXENT + softmax,
    dl4jGANComputerVision.java:357-363): logsumexp(logits) - logits[label].
    Sequential fold → deterministic."""
    exps = F.aggregate(
        F.transform(logits, lambda v: F.exp(v)), F.lit(0.0), lambda a, v: a + v
    )
    picked = F.element_at(logits, label + F.lit(1)).cast("double")
    return F.log(exps) - picked


def accuracy(df: DataFrame, pred: Column, label: Column, keys: list[str] | None = None) -> DataFrame:
    """A4: mean(pred == label), optionally per group. Returns n / n_correct /
    acc columns (counts are exact; acc is their ratio)."""
    agg = [
        F.count("*").alias("n"),
        F.sum((pred == label).cast("long")).alias("n_correct"),
    ]
    gb = df.groupBy(*keys) if keys else df.groupBy()
    out = gb.agg(*agg)
    return out.withColumn("acc", F.round(F.col("n_correct") / F.col("n"), 6))
