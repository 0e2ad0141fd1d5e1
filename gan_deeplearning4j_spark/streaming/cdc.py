"""Streaming CDC apply: foreachBatch → MERGE round per micro-batch.

Maintains a materialized parquet table from a stream of change records,
applying each micro-batch through ``operators.relational.merge_upsert``
(the engine's CDC-apply primitive) — the Structured-Streaming analogue of
a Delta/Iceberg `MERGE INTO` sink, built on plain parquet with versioned
snapshot directories (write-new-then-swap, never overwrite-in-place).

Semantics per micro-batch:

1. the batch is reduced to its LAST change per key (by ``seq_col``) — a
   CDC batch may carry several updates for one key and MERGE's full-outer
   join must see exactly one;
2. ``merge_upsert`` folds it into the current snapshot (update / insert /
   optional delete);
3. the result is written as snapshot v{n+1}; the previous snapshot stays
   until the write commits, so readers never see a torn table.

Because MERGE-apply is idempotent (re-applying a batch to a state that
already contains it is a no-op), a restart that replays the last
micro-batch from the checkpoint converges to the same table — effective
exactly-once without sink-side transaction support.

Scale: per batch this is one full-outer join on the merge key — one
shuffle per side, zero if the snapshot and the change stream are both
bucketed on the key (sources/layouts.write_bucketed). State lives in
parquet, not executor memory, so table size is unbounded by RAM.

Snapshot discovery constraint: ``_latest_snapshot`` resolves versions
with ``os.listdir`` on the DRIVER's local filesystem, so ``state_dir``
must be a driver-visible local path (or a mount that behaves like one,
e.g. NFS/fuse).  A raw ``hdfs://``/``s3://`` state_dir would silently
list nothing and re-bootstrap v0 every batch; for remote object stores,
resolve snapshots through the Hadoop FileSystem API or keep a _LATEST
manifest file instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import merge_upsert


def _latest_snapshot(state_dir: str) -> tuple[int, str | None]:
    if not os.path.isdir(state_dir):
        return -1, None
    versions = [
        int(d[1:]) for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    ]
    if not versions:
        return -1, None
    v = max(versions)
    return v, os.path.join(state_dir, f"v{v}")


def apply_cdc_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> str:
    """Apply one CDC batch to the latest snapshot; returns the new
    snapshot path. Usable directly for batch backfills and as the
    foreachBatch body for streams."""
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
    latest = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    ver, snap = _latest_snapshot(state_dir)
    if snap is None:
        target = latest.drop(seq_col)
        if delete_col is not None:
            # NULL delete flag means "not a delete" — same coalesce
            # semantics merge_upsert applies on later batches, so a
            # record is kept/dropped identically whether its key first
            # appears in the bootstrap batch or a subsequent one.
            target = target.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
            # first snapshot: deletes of never-seen keys are no-ops
        merged = target
    else:
        target = spark.read.parquet(snap)
        merged = merge_upsert(
            target, latest.drop(seq_col), keys, delete_col=delete_col
        )
    out = os.path.join(state_dir, f"v{ver + 1}")
    merged.write.mode("overwrite").parquet(out)
    return out


def streaming_cdc_apply(
    stream_df: DataFrame,
    state_dir: str,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
    timeout_sec: int = 120,
    checkpoint_dir: str | None = None,
) -> str | None:
    """Drive one availableNow pass of the change stream into the
    materialized table; returns the final snapshot path."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        apply_cdc_batch(
            spark, state_dir, batch_df, keys, seq_col, delete_col=delete_col
        )

    writer = stream_df.writeStream.foreachBatch(_apply).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    drained = q.awaitTermination(timeout_sec)
    q.stop()
    if not drained:
        # The availableNow pass did NOT finish inside timeout_sec: the
        # snapshot on disk reflects only a prefix of the available data.
        # Returning it as if the stream had drained would be a silent
        # under-apply — fail loudly instead.
        raise TimeoutError(
            f"streaming_cdc_apply: availableNow pass exceeded "
            f"{timeout_sec}s before draining; snapshot at "
            f"{_latest_snapshot(state_dir)[1]!r} is partial"
        )
    return _latest_snapshot(state_dir)[1]
