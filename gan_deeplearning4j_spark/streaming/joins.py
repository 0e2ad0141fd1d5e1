"""Stream-stream event-time interval join.

The reference has no streaming surface at all (SURVEY §0 — its pipeline is a
fixed-size batch loop), so this is north-star coverage: the canonical
"attribute a purchase to the clicks that preceded it" join, expressed once
and runnable over a batch DataFrame or two Structured-Streaming inputs.

Scale notes: a stream-stream inner join keys state by user_id (the equi
part); the interval condition plus both watermarks bound how long each
side's rows are retained, so state is O(events-per-watermark-window), not
O(stream). On a 1000-executor cluster both sides shuffle-partition on
user_id — the same single-shuffle layout as the batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_attribution(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to every click by the same user in the preceding
    ``gap``. Batch/stream-unified: on streaming input both sides get
    watermarks (required for state cleanup in a stream-stream join); on
    batch input it is the identical interval join without them."""
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "user_id",
        F.col("value").alias("purchase_value"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("user_id").alias("c_user"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {gap}"))
        & (c.c_ts <= p.p_ts)
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "click_id", "user_id", "purchase_value"
    )


def purchase_click_attribution_outer(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant: purchases with no preceding click still emit,
    click columns null. On a stream this exercises the other half of the
    stream-stream join machinery: an unmatched left row can only be emitted
    once the right-side watermark has passed its join window (no earlier
    click can still arrive), so output latency is bounded by
    ``watermark + gap`` — the price of the null guarantee. State bounds are
    the same as the inner form."""
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "user_id",
        F.col("value").alias("purchase_value"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("user_id").alias("c_user"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {gap}"))
        & (c.c_ts <= p.p_ts)
    )
    return p.join(c, cond, "left_outer").select(
        "purchase_id", "click_id", "user_id", "purchase_value"
    )


def enriched_segment_windows(
    events: DataFrame,
    customers: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 hours",
) -> DataFrame:
    """Stream-STATIC enrichment join + windowed rollup: map each event's
    user to a market segment from a static dimension table, then tumbling
    per-(window, segment) purchase counts and exact integer revenue cents.

    The missing third join shape next to the batch equi-joins and the
    stream-stream interval joins: a stream-static join is STATELESS in
    Structured Streaming (the dimension is re-broadcast per micro-batch,
    picking up dim refreshes between triggers), so the stream side never
    keys state by the join column — only the downstream windowed
    aggregate holds watermark-bounded state. Batch/stream-unified: the
    same function body runs on a batch DataFrame for the equality test.

    Scale: the dimension is explicitly `broadcast()` (segment dims are
    fixed-cardinality); the fact stream shuffles once, on the window
    aggregate key. Users absent from the dimension roll up under
    'unknown' (left join) rather than silently dropping."""
    e = events.filter(F.col("event_type") == "purchase").select(
        "ts", "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    if events.isStreaming:
        e = e.withWatermark("ts", watermark)
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    j = e.join(F.broadcast(dim), "user_id", "left")
    return (
        j.groupBy(
            F.window("ts", window).alias("w"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias("segment"),
        )
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"), "segment",
            "n_purchases", "revenue_cents",
        )
    )
