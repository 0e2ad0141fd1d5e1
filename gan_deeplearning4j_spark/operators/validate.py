"""Declarative data-quality validation (the Deequ/Great-Expectations shape):
each constraint compiles to ONE aggregate or anti-join count over the table,
and a report is the lazy union of those counts — no collect, no row-level
materialization of violations.

Scale notes: every check is a single map-side-combinable aggregate
(null/range/regex) or a broadcast/shuffled anti-join (uniqueness via
group-count, referential integrity via left-anti). A 100 TB nightly
validation is therefore bounded by one scan per table plus one shuffle per
uniqueness/FK check — and because the checks are plain DataFrames, Catalyst
fuses same-table aggregates the caller unions into a shared scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, df: DataFrame, n_violations: Column) -> DataFrame:
    return df.agg(n_violations.cast("long").alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return _report(
        name or f"not_null:{col}", df,
        F.count(F.when(F.col(col).isNull(), 1)),
    )


def check_in_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    return _report(
        name or f"in_range:{col}", df,
        F.count(F.when(~F.col(col).between(lo, hi), 1)),
    )


def check_regex(
    df: DataFrame, col: str, pattern: str, name: str | None = None
) -> DataFrame:
    """Counts non-null values NOT fully matching ``pattern``."""
    return _report(
        name or f"regex:{col}", df,
        F.count(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).rlike(pattern), 1
            )
        ),
    )


def check_unique(
    df: DataFrame, cols: list[str], name: str | None = None
) -> DataFrame:
    """Violations = rows beyond the first per key (0 when key is unique)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("__n"))
        .agg(F.sum(F.col("__n") - 1).alias("__extra"))
    )
    return dup.select(
        F.lit(name or f"unique:{','.join(cols)}").alias("check"),
        F.coalesce(F.col("__extra"), F.lit(0)).cast("long")
        .alias("n_violations"),
    )


def check_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Violations = child rows whose key has no match in parent (left anti)."""
    orphans = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return orphans.agg(F.count("*").cast("long").alias("n_violations")).select(
        F.lit(name or f"fk:{child_col}").alias("check"), "n_violations"
    )


def validation_report(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row check results into one (check, n_violations) report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
