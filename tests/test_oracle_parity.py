"""Differential test: every registered query with an oracle must match DuckDB
exactly (row count, column names, order-insensitive values) — a local replica
of the driver's CORRECTNESS gate, run at sf0.001 for speed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from gan_deeplearning4j_spark.io import TABLES
from gan_deeplearning4j_spark.queries import REGISTRY

ORACLED = [name for name, q in REGISTRY.items() if q.oracle]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df):
    """Sort columns by name, then rows; stringify floats to 9 sig digits."""
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "␀"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{int(v)}"
            return f"{v:.9g}"
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    odf = con.sql(q.oracle).df()
    s_cols, s_rows = _canon(sdf)
    o_cols, o_rows = _canon(odf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first value mismatches: {mismatches}"
