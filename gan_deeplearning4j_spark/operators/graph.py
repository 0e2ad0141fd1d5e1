"""Iterative graph algorithms on DataFrames.

``connected_components`` (min-label propagation) lives in operators/dedup.py
with its dedup-clustering consumers; this module holds the general-purpose
iterative ops. Like the fixed-point ANN paths, PageRank here runs in an
exact integer domain so a SQL oracle can replay it hash-for-hash — float
PageRank sums diverge across engines at the ulp level after one iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000          # rank fixed-point scale (ppm)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as an exact ratio


def pagerank_fixed(
    edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = 3,
) -> DataFrame:
    """Fixed-point PageRank over an UNDIRECTED view of ``edges``.

    rank_0 = PR_SCALE for every node;
    rank_{k+1}(v) = 0.15·PR_SCALE + floor(0.85 · Σ_{u→v} floor(rank_k(u) /
    deg(u))) — all arithmetic int64 (floor div + integer sums), so the
    result is bit-identical across engines, partitionings, and re-runs.
    Undirecting guarantees deg ≥ 1 (no dangling-mass correction needed).

    Scale shape: one degree aggregate up front, then per iteration one
    src-keyed join + one dst-keyed aggregate — the canonical O(iters)
    shuffle pattern (same as connected_components); nothing touches the
    driver. The edge+degree relations are materialized ONCE and the rank
    table per round: an iterative consumer with an unmaterialized input
    re-executes the input's whole subtree every round, and an
    unmaterialized rank table stacks k joins of lineage by round k (the
    r6 dense-dedup stress measured this class of bug at 4x wall-clock).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = e.union(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().localCheckpoint(eager=True)
    deg = und.groupBy("s").agg(
        F.count("*").alias("deg")
    ).localCheckpoint(eager=True)
    ranks = und.select(F.col("s").alias("node")).distinct().withColumn(
        "rank", F.lit(PR_SCALE).cast("long")
    )
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    for _ in range(iters):
        contrib = (
            und.join(ranks, und.s == ranks.node)
            .join(deg, "s")
            .select(F.col("d"), F.expr("rank div deg").alias("c"))
        )
        ranks = contrib.groupBy("d").agg(
            (
                F.lit(base)
                + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")
            ).alias("rank")
        ).select(F.col("d").alias("node"), "rank").localCheckpoint(
            eager=True
        )
    return ranks
