"""Session-hygiene and boundary-semantics pins.

1. Cache hygiene: queries must not leave entries in the shared session's
   CacheManager (VERDICT r3: ``embedding_neardup_lsh`` persisted its
   signature relation and never unpersisted — under the driver's shared
   session running ~50 queries those caches accumulate).  DataFrame
   ``.persist()`` registers in the CacheManager and stays until an explicit
   unpersist; ``localCheckpoint`` RDDs by contrast are reclaimed by the
   ContextCleaner once unreferenced, so multi-branch reuse goes through
   localCheckpoint (operators/dedup.py) and single-branch persists were
   removed (operators/similarity.py).

2. session_window boundary: an event at exactly prev_ts + gap MERGES into
   the running session in Spark (sessions extend while next_start <=
   current_end, and the window is [start, last+gap)).  The
   ``events_session_window`` DuckDB oracle encodes the same rule (new
   session only when diff is STRICTLY greater than the gap) — this test is
   the empirical pin for that exact-boundary agreement (ADVICE r3).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gan_deeplearning4j_spark.queries import REGISTRY


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_queries_leave_no_cachemanager_entries(spark, sf_dir):
    spark.catalog.clearCache()
    assert _cache_empty(spark)
    for name in ("minhash_dedup", "embedding_neardup_lsh", "dedup_clusters"):
        REGISTRY[name].fn(spark, sf_dir).count()
    assert _cache_empty(spark), (
        "a query left a persisted DataFrame in the CacheManager"
    )


def test_session_window_exact_gap_boundary(spark):
    t0 = datetime.datetime(2025, 1, 1, 0, 0, 0)
    gap = datetime.timedelta(minutes=30)
    us = datetime.timedelta(microseconds=1)
    # exactly-at-gap pair -> ONE session; one microsecond past -> TWO
    at_gap = spark.createDataFrame(
        [(1, t0), (1, t0 + gap)], "user_id int, ts timestamp"
    )
    past_gap = spark.createDataFrame(
        [(1, t0), (1, t0 + gap + us)], "user_id int, ts timestamp"
    )

    def n_sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .count()
            .count()
        )

    assert n_sessions(at_gap) == 1
    assert n_sessions(past_gap) == 2
