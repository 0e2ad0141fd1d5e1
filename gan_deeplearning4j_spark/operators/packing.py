"""Token-stream packing operators — the scale path behind the
``token_window_packing`` / ``pack_fragmentation_report`` queries
(queries_r16.py).

The queries compute per-doc token spans with ONE window pass partitioned
by ``source``: correct, but a single source's stream is one partition —
a 5-TB source serializes into one task. This module implements the
two-level prefix-merge form the query docstrings promise for 100 TB:

1. split each source's Lehmer-ordered stream into ``shards`` contiguous
   ranges by VALUE-SPLITTING the Lehmer key domain (deterministic, no
   sampling, order-preserving: every key in shard s sorts before every
   key in shard s+1);
2. run the running token sum per (source, shard) — parallelism is now
   sources × shards;
3. aggregate one row per (source, shard) (a tiny relation), compute each
   shard's exclusive prefix offset with a window over THAT relation, and
   broadcast-join the offsets back.

The result is IDENTICAL to the global-window form (pinned by
tests/test_operators.py::test_token_spans_two_level_equivalence) because
the global running sum decomposes exactly into local sum + offset.
Measured: scripts/stress_packing.py (SCALE.md round 13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEHMER_MOD = 65537


def n_tokens_col() -> "F.Column":
    """House tokenization: trim + whitespace split + drop empties.

    The single definition shared by the packing operators AND the
    queries_r16 schedule/repack queries — one source of truth so the
    operator and the registered queries cannot drift tokenizations.
    """
    return F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")


def token_spans(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    shards: int | None = None,
) -> DataFrame:
    """Per-doc token spans under contiguous per-group stream packing.

    Docs order by the house Lehmer key within ``group_col``; each doc
    occupies the token span [s_start, s_end) of its group's stream, and
    ``first_w``/``last_w`` are the first/last ``budget``-token window the
    span touches (a doc with last_w > first_w is split across window
    boundaries — the overflow-split packing semantics).

    ``shards=None`` — one window pass partitioned by group (the
    registered-query form; right when groups are many/small).
    ``shards=k`` — the two-level prefix-merge: local running sums over
    (group, shard) + a broadcast shard-offset table (right when a single
    group's stream is huge; parallelism becomes groups × k). Outputs are
    identical; see the module docstring.
    """
    lehmer = (F.col(id_col) * 48271) % _LEHMER_MOD
    toks = docs.select(
        id_col, group_col, n_tokens_col().alias("nt"),
        lehmer.alias("__lk"),
    )
    if shards is None:
        w = (
            Window.partitionBy(group_col)
            .orderBy("__lk", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        spanned = toks.select(
            id_col, group_col, "nt",
            F.sum("nt").over(w).cast("long").alias("s_end"),
        )
    else:
        if shards < 1:
            raise ValueError(f"token_spans: shards must be >= 1, got {shards}")
        # value-split of the Lehmer key domain: deterministic contiguous
        # ranges, no sampling (repartitionByRange would sample), and
        # order-preserving across shards by construction
        sharded = toks.withColumn(
            "__shard",
            F.expr(f"(__lk * {int(shards)}) div {_LEHMER_MOD}"),
        )
        wl = (
            Window.partitionBy(group_col, "__shard")
            .orderBy("__lk", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = sharded.select(
            id_col, group_col, "nt", "__shard",
            F.sum("nt").over(wl).cast("long").alias("__local_end"),
        )
        # one row per (group, shard): exclusive prefix offsets. Computed
        # from `sharded` (the pre-window relation), NOT from `local`:
        # Spark re-executes a subtree per consuming plan branch, and an
        # offsets branch over the WINDOWED relation would re-run the
        # window shuffle; off the scan it is a map-side-combinable
        # aggregate whose only exchange carries groups × shards rows
        # (the second scan+tokenize pass is the documented cost of
        # staying stateless — cheaper than checkpointing the full
        # tokenized corpus).
        wo = (
            Window.partitionBy(group_col)
            .orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offsets = (
            sharded.groupBy(group_col, "__shard")
            .agg(F.sum("nt").alias("__shard_tot"))
            .select(
                group_col, "__shard",
                (F.sum("__shard_tot").over(wo) - F.col("__shard_tot"))
                .cast("long").alias("__offset"),
            )
        )
        spanned = (
            local.join(F.broadcast(offsets), [group_col, "__shard"])
            .select(
                id_col, group_col, "nt",
                (F.col("__local_end") + F.col("__offset")).alias("s_end"),
            )
        )
    # budget is a caller constant; power-of-two budgets keep the double
    # division exact, arbitrary budgets go through integral div
    return spanned.select(
        id_col, group_col, "nt", "s_end",
        (F.col("s_end") - F.col("nt")).alias("s_start"),
        F.expr(f"(s_end - nt) div {int(budget)}").alias("first_w"),
        F.expr(f"(s_end - 1) div {int(budget)}").alias("last_w"),
    )


def rank_manifest(docs: DataFrame, budget: int = 512, ranks: int = 4,
                  workers: int = 2,
                  group_col: str = "source") -> DataFrame:
    """Dataloader shard manifest over the packed token windows — the
    ★dataloader_rank_manifest pipeline as a reusable operator.

    Each group's stream packs into ``ceil(tokens/budget)`` windows (the
    tail window carries the remainder); every window gets a GLOBAL index
    g = per-group ordinal + an exclusive prefix offset over the
    per-group window counts (a metadata-scale window over one row per
    group — the two-level prefix shape, never a global sort), and lands
    on the (g % ranks, (g div ranks) % workers) shard. Output: one row
    per shard with window/token/tail counts and the token share in ppm.

    Scale: the explode is linear in windows (tokens/budget); the only
    non-map steps are the |groups|-row offset window and the
    ranks*workers-row final aggregate. Measured in
    scripts/stress_manifest.py (SCALE.md round 13)."""
    from ..functions.windows import bounded_window

    b, nr, nw_ = int(budget), int(ranks), int(workers)
    if nr < 1 or nw_ < 1:
        raise ValueError(f"rank_manifest: ranks/workers must be >= 1, "
                         f"got {ranks}/{workers}")
    agg = (
        docs.select(group_col, n_tokens_col().alias("nt"))
        .groupBy(group_col)
        .agg(
            F.sum("nt").cast("long").alias("total"),
            F.expr(f"(sum(nt) + {b - 1}) div {b}").cast("long")
            .alias("nw"),
        )
    )
    woff = bounded_window(group_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = agg.select(
        group_col, "total", "nw",
        (F.sum("nw").over(woff) - F.col("nw")).cast("long").alias("off0"),
    )
    win = (
        off.filter(F.col("nw") > 0)   # sequence(0, -1) would DESCEND
        .select(
            "off0", "nw", "total",
            F.explode(F.expr("sequence(CAST(0 AS BIGINT), nw - 1)"))
            .alias("w"),
        )
    )
    wt = win.select(
        (F.col("off0") + F.col("w")).alias("gidx"),
        F.when(F.col("w") == F.col("nw") - 1,
               F.col("total") - (F.col("nw") - 1) * b)
        .otherwise(F.lit(b)).cast("long").alias("wtok"),
    )
    sh = wt.select(
        (F.col("gidx") % nr).cast("long").alias("dl_rank"),
        F.expr(f"(gidx div {nr}) % {nw_}").cast("long").alias("dl_worker"),
        "wtok",
    )
    per = sh.groupBy("dl_rank", "dl_worker").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum("wtok").cast("long").alias("n_tokens"),
        F.count_if(F.col("wtok") < b).cast("long").alias("n_tail_windows"),
    )
    # total tokens derived from the ranks*workers-row shard summary
    # itself, never a second aggregate branch over the fact table
    wtot = bounded_window()
    return (
        per.select(
            "dl_rank", "dl_worker", "n_windows", "n_tokens",
            "n_tail_windows",
            F.sum("n_tokens").over(wtot).cast("long").alias("t"),
        )
        .select(
            "dl_rank", "dl_worker", "n_windows", "n_tokens",
            "n_tail_windows",
            F.expr("CASE WHEN t = 0 THEN 0 ELSE "
                   "n_tokens * 1000000 div t END")
            .cast("long").alias("token_share_ppm"),
        )
        .orderBy("dl_rank", "dl_worker")
    )


def packing_summary(spans: DataFrame, budget: int = 512,
                    group_col: str = "source") -> DataFrame:
    """Per-group window accounting over ``token_spans`` output — the
    ★token_window_packing aggregate as a reusable operator."""
    b = int(budget)
    return (
        spans.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
            F.expr(f"(sum(nt) + {b - 1}) div {b}").cast("long")
            .alias("n_windows"),
            F.count_if(F.col("last_w") > F.col("first_w")).cast("long")
            .alias("n_split_docs"),
            F.sum(F.col("last_w") - F.col("first_w")).cast("long")
            .alias("boundary_crossings"),
            # a zero-token group has no windows — report 0 fill, not a
            # phantom full tail (sum - (0-1)*b would say b)
            F.expr(
                f"CASE WHEN sum(nt) = 0 THEN 0 ELSE "
                f"sum(nt) - ((sum(nt) + {b - 1}) div {b} - 1) * {b} END"
            ).cast("long").alias("tail_fill_tokens"),
        )
        .orderBy(group_col)
    )
