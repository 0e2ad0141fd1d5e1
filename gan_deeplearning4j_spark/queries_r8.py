"""Round-8 staged queries — written during round 7, registered in round 8.

Same staging pattern as queries_r7 (see its module docstring): the round-7
driver window is pinned to the current never-green prefix (the 20 round-7
entries), so anything new written this round stays behind ``SPARK_GRAFT_R8=1``
until CORRECTNESS_r07 lands and round 8 makes registration unconditional.

Local verification (identical gates to registered queries):

    SPARK_GRAFT_R8=1 python scripts/driver_replica.py <names...>
    SPARK_GRAFT_R8=1 python scripts/check_parity.py <names...>
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

# name -> (fn, oracle, headline, doc); materialized into the real registry
# by register_all() (round 8) or under SPARK_GRAFT_R8=1 (round-7 local
# verification).
STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str | None = None, headline: bool = False,
           doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        STAGED[name] = (fn, oracle, headline, doc)
        return fn
    return deco


def register_all() -> None:
    """Register the staged queries (idempotent; see queries_r7)."""
    from .queries import REGISTRY, register

    for name, (fn, oracle, headline, doc) in STAGED.items():
        if name not in REGISTRY:
            register(name, oracle=oracle, headline=headline, doc=doc)(fn)


@_stage(
    "viterbi_event_paths",
    oracle="""
    WITH RECURSIVE
    seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT event_type AS a, nxt AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    outdeg AS (
      SELECT a, CAST(SUM(c) AS BIGINT) AS tot FROM trans GROUP BY a
    ),
    p AS (
      SELECT t.a, t.b, t.c * 1000000 // o.tot AS p_ppm
      FROM trans t JOIN outdeg o ON o.a = t.a
    ),
    start AS (
      SELECT event_type AS s FROM events
      GROUP BY 1 ORDER BY COUNT(*) DESC, event_type LIMIT 1
    ),
    v AS (
      SELECT 0 AS k, s AS state, CAST(1000000 AS BIGINT) AS score
      FROM start
      UNION ALL
      SELECT k + 1, p.b AS state,
             CAST(MAX(v.score * p.p_ppm // 1000000) AS BIGINT) AS score
      FROM v JOIN p ON p.a = v.state
      WHERE k < 4
      GROUP BY k, p.b
    )
    SELECT CAST(k AS BIGINT) AS step, state, score AS score_ppm
    FROM (
      SELECT k, state, score,
             ROW_NUMBER() OVER (PARTITION BY k
                                ORDER BY score DESC, state) AS rn
      FROM v WHERE k > 0) WHERE rn = 1
    ORDER BY step
    """,
    doc="Viterbi decoding (max-product dynamic programming) over the "
        "event-type Markov chain: transition probabilities as ppm "
        "integers (count ratios, truncating division), start = the "
        "globally most frequent type, and for each of 4 steps the "
        "highest-scoring reachable state with its path score — scores "
        "propagate as score*p div 1e6, all int64, engine-exact. The "
        "DuckDB oracle replays the DP as a recursive CTE with GROUP BY "
        "over the recursive reference (per-state max over predecessors "
        "per step). Scale: the fact-sized work is one LEAD window per "
        "user partition + one transition groupBy; the DP itself runs on "
        "the bounded state-transition matrix (|event types|^2 rows)",
)
def q_viterbi_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("a"), F.col("nxt").alias("b")
    ).agg(F.count("*").alias("c"))
    outdeg = trans.groupBy("a").agg(F.sum("c").alias("tot"))
    p = (
        trans.join(outdeg, "a")
        .select("a", "b", F.expr("c * 1000000 div tot").alias("p_ppm"))
        .localCheckpoint(eager=True)  # consumed once per DP step
    )
    start = (
        ev.groupBy("event_type").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type").limit(1)
        .select(F.col("event_type").alias("state"))
    )
    v = start.select(
        "state", F.lit(1000000).cast("long").alias("score")
    ).localCheckpoint(eager=True)
    rows = []
    for k in range(1, 5):
        v = (
            v.join(p, v.state == p.a)
            .groupBy(F.col("b").alias("state"))
            .agg(
                F.max(F.expr("score * p_ppm div 1000000"))
                .cast("long").alias("score")
            )
            .localCheckpoint(eager=True)
        )
        rows.append(
            v.orderBy(F.desc("score"), "state").limit(1).select(
                F.lit(k).cast("long").alias("step"), "state",
                F.col("score").alias("score_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


# Self-register ONLY under the round-8 gate (this module is imported both
# by queries.py under the gate and directly by tests without it).
import os as _os

if _os.environ.get("SPARK_GRAFT_R8"):
    register_all()
