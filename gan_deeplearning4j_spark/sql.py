"""SQL entry surface: run plain Spark SQL over the engine's tables.

The reference has no SQL layer (SURVEY §0 — its "queries" are dataflow
pipelines), but this engine's API commitment is DataFrame *and* SQL: every
relational operator reachable through the DataFrame registry is equally
reachable through ``spark.sql`` once the tables are registered. Catalyst
plans both identically — the view layer below adds zero execution cost
(views are plan fragments, not materializations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str,
                    prefix: str = "") -> list[str]:
    """Register every engine table as a temp view (``events`` goes through
    the nanos-safe loader). Returns the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views and run a SQL query against them."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
