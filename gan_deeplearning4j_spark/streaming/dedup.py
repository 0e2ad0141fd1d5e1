"""Streaming deduplication.

The batch dedup family (operators/dedup.py) keyed on a content fingerprint;
the streaming form is the same key with bounded state:
``dropDuplicatesWithinWatermark`` keeps a fingerprint's state only until the
watermark passes its event time, so state is O(events per watermark window)
— the only dedup semantics that can run forever on an unbounded stream.

Scale notes: state is hash-partitioned on the fingerprint (one shuffle);
at 100 TB/day the watermark delay is the knob trading completeness
(late duplicate arrivals) against state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type", "value"),
    watermark: str = "2 hours",
) -> DataFrame:
    """First-arrival dedup on a content key. Streaming input: watermarked
    ``dropDuplicatesWithinWatermark`` (bounded state). Batch input: plain
    ``dropDuplicates`` — same first-row-per-key semantics."""
    keyed = events.withColumn(
        "__fp", F.xxhash64(*[F.col(c) for c in key_cols])
    )
    if events.isStreaming:
        out = keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["__fp"]
        )
    else:
        out = keyed.dropDuplicates(["__fp"])
    return out.drop("__fp")
