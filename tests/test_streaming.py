"""Structured Streaming facade test: the tumbling aggregate produces the same
result on a real stream (file source, availableNow trigger) as in batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gan_deeplearning4j_spark.io import load_events
from gan_deeplearning4j_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    tumbling_agg,
)


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    ev = load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # re-materialize at µs precision (streaming parquet source can't read the
    # driver's TIMESTAMP_NANOS files), in a few files to get multiple triggers
    src = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = tumbling_agg(stream, "1 hour", watermark="10 hours")
    run_stream_to_memory(agg, "tumbling_test", timeout_sec=120)

    got = spark.sql("select * from tumbling_test").toPandas()
    want = tumbling_agg(ev, "1 hour").toPandas()

    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s["n"].to_numpy() == want_s["n"].to_numpy()).all()
    assert abs(got_s["sum_value"].to_numpy() - want_s["sum_value"].to_numpy()).max() < 1e-6
