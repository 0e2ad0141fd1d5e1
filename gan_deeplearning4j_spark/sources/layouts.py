"""Physical-layout helpers for 100 TB-scale tables: partitioned and bucketed
parquet, the co-located-join story.

Why this exists: at cluster scale, the dominant cost of the engine's repeated
fact-table joins (orders ⋈ lineitem et al.) is the shuffle. Writing both
sides bucketed by the join key (`write_bucketed`) lets Spark plan a
shuffle-FREE sort-merge join (bucket pruning + no Exchange); writing
time-partitioned (`write_time_partitioned`) gives partition pruning on date
predicates — the scan reads only matching directories.

These are write-side choices, so they live with the sources: the engine's
contract is that a table registered via `write_bucketed` joins against any
same-bucketed table with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata needs the
    catalog). Join two tables bucketed on the same key/count → no Exchange."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "day"
) -> None:
    """Directory-partitioned by date — predicate on the partition column
    prunes whole directories at planning time."""
    part = F.date_format(F.col(ts_col), "yyyy-MM-dd" if granularity == "day" else "yyyy-MM")
    df.withColumn("__pt", part).write.mode("overwrite").partitionBy("__pt").parquet(path)


def repartition_for_join(df: DataFrame, keys: list[str], n: int | None = None) -> DataFrame:
    """Pre-shuffle once on the join key so N downstream joins/aggs on the
    same key reuse the partitioning (Exchange reuse)."""
    return df.repartition(n, *[F.col(k) for k in keys]) if n else df.repartition(*[F.col(k) for k in keys])
