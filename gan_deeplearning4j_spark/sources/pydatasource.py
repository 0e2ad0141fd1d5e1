"""Spark 4 Python DataSource API demo source (S-family depth).

A deterministic synthetic source implemented against the public
``pyspark.sql.datasource`` API (SPARK-44076, Spark 4.x): 8 range
partitions, each yielding (id, val = id*id mod 97) rows.  The point is the
PLUMBING — a user-defined source that partitions correctly (one
InputPartition per parallel split, no driver-side row generation) and
integrates with the DataFrame reader — with output simple enough that a
DuckDB ``range()`` oracle can hash-grade the full scan.

Scale notes: partitions() is the contract that makes a Python source
parallel — each partition is read independently on an executor (the class
is pickled to workers), so a real source (e.g. a paginated API or a
proprietary file format) scales horizontally exactly like a file scan.
Row-by-row yield is the slow path at 100 TB; the API also accepts
pyarrow.RecordBatch yields for vectorized reads — kept row-based here
because the relation is 10k rows by construction.
"""

from __future__ import annotations

N_ROWS = 10_000
N_PARTS = 8
MOD = 97

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SynthQuadraticSource(DataSource):
        """``spark.read.format("synth_quadratic")`` — deterministic rows."""

        @classmethod
        def name(cls) -> str:
            return "synth_quadratic"

        def schema(self) -> str:
            return "id BIGINT, val BIGINT"

        def reader(self, schema) -> "SynthQuadraticReader":
            return SynthQuadraticReader()

    class SynthQuadraticReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(N_PARTS)]

        def read(self, partition):
            per = N_ROWS // N_PARTS
            start = partition.value * per
            for i in range(start, start + per):
                yield (i, (i * i) % MOD)

    HAVE_PY_DATASOURCE = True
except ImportError:  # pragma: no cover - pyspark < 4 fallback
    SynthQuadraticSource = None  # type: ignore[assignment]
    HAVE_PY_DATASOURCE = False
