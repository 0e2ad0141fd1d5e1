"""IO tests: reference-compat headerless CSV roundtrip (S1-S3, S6-S9) and the
positional join (J2)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gan_deeplearning4j_spark.io import (
    mnist_like_schema,
    read_headerless_csv,
    read_mnist_csv,
    write_headerless_csv,
)
from gan_deeplearning4j_spark.operators.relational import positional_join


def test_mnist_csv_roundtrip(spark, tmp_path):
    """S6 write → S1/S3 read: headerless 785-col float CSV with label at
    position 784 (the reference's implicit schema, java:68)."""
    n, d = 20, 784
    rng = np.random.default_rng(666)
    x = rng.uniform(0, 1, (n, d)).round(2)
    y = rng.integers(0, 10, n)
    rows = [tuple(list(map(float, x[i])) + [float(y[i])]) for i in range(n)]
    df = spark.createDataFrame(rows, mnist_like_schema(d))
    path = str(tmp_path / "mnist_csv")
    write_headerless_csv(df, path)

    back = read_mnist_csv(spark, path, d).orderBy("label").toPandas()
    assert len(back) == n
    assert len(back["features"][0]) == d
    assert sorted(back["label"]) == sorted(int(v) for v in y)


def test_headerless_csv_declared_schema(spark, tmp_path):
    df = spark.createDataFrame([(1.5, 2.5), (3.0, 4.0)], "a: double, b: double")
    path = str(tmp_path / "plain_csv")
    write_headerless_csv(df, path)
    back = read_headerless_csv(spark, path, df.schema)
    assert back.schema == df.schema
    got = sorted((r["a"], r["b"]) for r in back.collect())
    assert got == [(1.5, 2.5), (3.0, 4.0)]


def test_positional_join_aligns_rows(spark):
    """J2 (gan.ipynb raw 405): prediction row i ↔ label row i."""
    preds = spark.createDataFrame([(0.9,), (0.1,), (0.8,)], "p: double")
    labels = spark.createDataFrame([(1,), (0,), (1,)], "y: int")
    j = positional_join(preds, labels).orderBy("p").collect()
    pairs = {(r["p"], r["y"]) for r in j}
    assert pairs == {(0.9, 1), (0.1, 0), (0.8, 1)}
