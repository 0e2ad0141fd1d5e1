"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only "state" is driver-held model weights between epochs
(dl4jGANComputerVision.java:408-621, a bounded batch loop); Structured
Streaming's arbitrary-stateful operator is the engine's scale-path analogue:
per-key state lives in the executor state store (partitioned by group key,
checkpointed, RocksDB-backed on a real cluster), so state size scales with
#keys across the cluster, never with stream length or driver memory.

Two operators:
- ``running_user_totals`` — unbounded per-key running aggregates (count /
  sum / max event time), emitted once per micro-batch per active key.
- ``stateful_sessionize`` — gap-based sessionization where the session
  accumulator is explicit state; closed sessions are emitted when a later
  event for the same key arrives past the gap. (The batch-form equivalent —
  the DuckDB-oracled ``sessionize`` query — is the correctness anchor; the
  stream-vs-batch test pins the two to each other.)
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

RUNNING_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _running_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_ts, seq = (
        state.get if state.exists else (0, 0.0, None, 0)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    seq += 1
    state.update((n, total, last_ts, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [last_ts],
            "emit_seq": [seq],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), max ts), maintained in GroupState
    across micro-batches. Emits the updated totals for every key touched by a
    batch (output mode: update); ``emit_seq`` orders a key's emissions so a
    downstream consumer (or test) can take the latest.

    Scale: one state row per user, hash-partitioned by user_id across the
    cluster's state store — the shuffle is the same groupBy shuffle the batch
    aggregate pays, amortized over the stream's lifetime.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn_factory(gap_seconds: int):
    gap = pd.Timedelta(seconds=gap_seconds)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        start, end, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        # a key's batch slice may arrive as several Arrow chunks; order the
        # whole slice by time before applying the gap rule (one key's batch
        # fits in memory — that is the applyInPandasWithState contract).
        # Cross-batch order is the source's responsibility (per-key ordered
        # ingest, e.g. keyed Kafka partitions); out-of-order-across-batch
        # events need the event-time-timeout variant, out of round-1 scope.
        all_ts = pd.concat([pdf["ts"] for pdf in pdfs])
        for ts in all_ts.sort_values():
            if start is None:
                start, end, n = ts, ts, 1
            elif ts - end <= gap:
                end, n = max(end, ts), n + 1
            else:
                closed.append((key[0], start, end, n))
                start, end, n = ts, ts, 1
        state.update((start, end, n))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return fn


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization with explicit GroupState: a key's open session
    is the state; a new event past the gap closes and emits it. The final
    still-open session per key stays in state (a production job ages it out
    with an event-time timeout; the batch-form ``sessionize`` query is the
    bounded-input equivalent that also emits the last session).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_c", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

EWMA_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("acc", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _ewma_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, acc, seq = state.get if state.exists else (0, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # within a batch, replay in event order — the recurrence is
    # order-sensitive, unlike the running-total fold
    rows = rows.sort_values(["ts_nanos", "event_id"])
    for c in rows["c"]:
        c = int(c)
        acc = c if n == 0 else (9 * acc + c) // 10
        n += 1
    seq += 1
    state.update((n, acc, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "ewma_c": [acc],
            "emit_seq": [seq],
        }
    )


def running_user_ewma(events: DataFrame) -> DataFrame:
    """Per-user streaming EWMA — the stateful twin of the batch
    ``ewma_user_value`` query: identical integer recurrence
    (acc = (9*acc + c) div 10 over cents in (ts, event_id) order), carried
    across micro-batches in GroupState, so after the last batch the state
    equals the batch array-fold EXACTLY (pinned by test).

    The contract only holds if events arrive in order across batches (the
    file-replay harness guarantees it); an out-of-order stream would need
    buffering by watermark before the fold, as session_agg does."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    prepared = events.select(
        "user_id", "ts_nanos", "event_id", cents.alias("c")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BALANCE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("balance_c", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

BALANCE_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("bal", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _balance_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, bal, seq = state.get if state.exists else (0, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_nanos", "event_id"])
    for d in rows["d"]:
        bal = max(bal + int(d), 0)  # the clamp — same fold as the batch op
        n += 1
    seq += 1
    state.update((n, bal, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "balance_c": [bal],
            "emit_seq": [seq],
        }
    )


def running_user_balance(events: DataFrame) -> DataFrame:
    """Per-user streaming clamped balance — the stateful twin of the batch
    ``running_balance_clamped`` query: identical non-linear recurrence
    (bal = max(bal + delta, 0), credits for purchase/signup, debits
    otherwise) carried across micro-batches in GroupState, so after the
    last batch the state equals the batch array fold EXACTLY (pinned by
    test). Same in-order-arrival contract as ``running_user_ewma``."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    delta = F.when(
        F.col("event_type").isin("purchase", "signup"), cents
    ).otherwise(-cents)
    prepared = events.select(
        "user_id", "ts_nanos", "event_id", delta.alias("d")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _balance_fn,
        outputStructType=BALANCE_OUTPUT,
        stateStructType=BALANCE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEBOUNCE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("n_suppressed", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

DEBOUNCE_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("kept", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _debounce_fn_factory(window_us: int):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_us, n, kept, seq = (
            state.get if state.exists else (-1, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_nanos", "event_id"])
        for us in rows["us"]:
            us = int(us)
            if last_us < 0 or us - last_us > window_us:
                kept += 1
            n += 1
            # gap is measured from the previous event KEPT OR NOT — the
            # batch twin's LAG semantics, not a keep-anchored throttle
            last_us = us
        seq += 1
        state.update((last_us, n, kept, seq))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "n_events": [n],
                "n_kept": [kept],
                "n_suppressed": [n - kept],
                "emit_seq": [seq],
            }
        )

    return fn


def streaming_debounce_counts(
    events: DataFrame, window_seconds: int = 300
) -> DataFrame:
    """Per-(user, type) streaming debounce audit — the stateful twin of the
    batch ``debounce_suppressed_counts`` query: an event is suppressed when
    the previous event of the same key (kept or not) lies within the
    window; identical integer microsecond arithmetic, carried across
    micro-batches in GroupState (state = one row per active key: last seen
    time + counters), so after the last batch the per-key counters equal
    the batch LAG computation EXACTLY (pinned by test). Same
    in-order-arrival contract as ``running_user_ewma``.

    Scale: state is one tiny fixed-width row per (user, type) key in the
    executor state store; the shuffle is the same groupBy shuffle the batch
    window pays, amortized over the stream's lifetime."""
    prepared = events.select(
        "user_id", "event_type", "ts_nanos", "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_fn_factory(window_seconds * 1_000_000),
        outputStructType=DEBOUNCE_OUTPUT,
        stateStructType=DEBOUNCE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SS_OUTPUT = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("item", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("err", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

SS_STATE = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _space_saving_fn_factory(m: int):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs, n, seq = state.get
            table = {
                it: [int(c), int(e)]
                for it, c, e in zip(items, counts, errs)
            }
            n = int(n)
            seq = int(seq)
        else:
            table, n, seq = {}, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_nanos", "event_id"])
        for item in rows["item"]:
            item = str(item)
            if item in table:
                table[item][0] += 1
            elif len(table) < m:
                table[item] = [1, 0]
            else:
                # evict the deterministic min: smallest count, then
                # lexicographically smallest item (classic space-saving
                # allows any min-count victim; pinning the tie-break
                # makes replays bit-stable)
                victim = min(table, key=lambda k: (table[k][0], k))
                floor_cnt = table[victim][0]
                del table[victim]
                table[item] = [floor_cnt + 1, floor_cnt]
            n += 1
        seq += 1
        ordered = sorted(table)
        state.update((
            ordered,
            [table[k][0] for k in ordered],
            [table[k][1] for k in ordered],
            n, seq,
        ))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(ordered),
                "item": ordered,
                "cnt": [table[k][0] for k in ordered],
                "err": [table[k][1] for k in ordered],
                "n_seen": [n] * len(ordered),
                "emit_seq": [seq] * len(ordered),
            }
        )

    return fn


def streaming_heavy_hitters(
    events: DataFrame, item_col: str = "event_type", m: int = 8,
    buckets: int = 4,
) -> DataFrame:
    """Streaming space-saving heavy hitters (Metwally, Agrawal & El
    Abbadi, ICDT'05) — per hash bucket, a capped table of ``m``
    (item, count, overestimate-error) counters carried across
    micro-batches in GroupState. The classic guarantees hold per
    bucket: every tracked item satisfies cnt - err <= true <= cnt, and
    any item with true frequency > n_bucket/m is tracked (pinned
    against exact batch counts by test; with m >= distinct items the
    sketch degenerates to exact counts and the stream equals the batch
    groupBy bit-for-bit). Eviction tie-break is pinned (min count,
    then lexicographic) so replays are deterministic.

    Scale: buckets shard the item domain, so state is buckets x m tiny
    rows in the executor state store regardless of stream length —
    the streaming analogue of the per-partition space-saving +
    merge pattern the batch ``heavy_hitters_guarantee`` query uses;
    raise ``buckets`` for key-skew (one hot bucket = one hot
    partition, same salting discipline as batch)."""
    bucket = (
        F.expr(f"conv(substr(md5({item_col}), 1, 15), 16, 10)")
        .cast("long") % buckets
    ).alias("bucket")
    prepared = events.select(
        bucket, F.col(item_col).alias("item"), "ts_nanos", "event_id"
    )
    return prepared.groupBy("bucket").applyInPandasWithState(
        _space_saving_fn_factory(m),
        outputStructType=SS_OUTPUT,
        stateStructType=SS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


WS_OUTPUT = T.StructType(
    [
        T.StructField("segment", T.StringType()),
        T.StructField("rank", T.LongType()),
        T.StructField("item_id", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("key_e12", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

WS_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("ws", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ]
)


def _ws_fn_factory(k: int):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            keys, ids, ws, seq = state.get
            best = list(zip(list(keys), list(ids), list(ws)))
            seq = int(seq)
        else:
            best, seq = [], 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        best.extend(
            (float(r.key), int(r.item_id), int(r.w))
            for r in rows.itertuples(index=False)
        )
        # min-k selection is associative: sorting the union of the old
        # top-k and the new batch equals sorting everything seen — the
        # exact double keys ride through Arrow bit-preserved, so this
        # order is the batch window's order
        best.sort(key=lambda t: (t[0], t[1]))
        best = best[:k]
        seq += 1
        state.update((
            [t[0] for t in best], [t[1] for t in best],
            [t[2] for t in best], seq,
        ))
        yield pd.DataFrame(
            {
                "segment": [key[0]] * len(best),
                "rank": list(range(1, len(best) + 1)),
                "item_id": [t[1] for t in best],
                "w": [t[2] for t in best],
                "key_e12": [math.floor(t[0] * 1e12) for t in best],
                "emit_seq": [seq] * len(best),
            }
        )

    return fn


def streaming_weighted_sample(
    items: DataFrame, segment_col: str, id_col: str, weight,
    k: int = 5,
) -> DataFrame:
    """Streaming weighted sample without replacement — the GroupState
    twin of the batch ``weighted_sample_es`` query: A-ES priority keys
    (operators/relational.a_es_keyed — md5 dyadic uniforms, -ln(u)/w)
    are computed JVM-side per micro-batch, and per segment the state
    keeps only the k smallest (key, id) pairs. Because min-k selection
    is associative and the keys are deterministic in the row alone,
    the final state equals the batch window's top-k EXACTLY, whatever
    the micro-batch slicing (pinned by test).

    Scale: state is k tiny rows per segment regardless of stream
    length; the groupBy shuffle is the same exchange the batch window
    pays, amortized across the stream."""
    from ..operators.relational import a_es_keyed

    base = items.withColumn(
        "__w_src", F.col(weight) if isinstance(weight, str) else weight
    ).select(
        F.col(segment_col).alias("segment"),
        F.col(id_col).alias("item_id"), "__w_src",
    )
    keyed = a_es_keyed(base, "item_id", F.col("__w_src")).select(
        "segment", "item_id", "w", "key"
    )
    return keyed.groupBy("segment").applyInPandasWithState(
        _ws_fn_factory(k),
        outputStructType=WS_OUTPUT,
        stateStructType=WS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOKEN_BUCKET_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_admitted", T.LongType()),
        T.StructField("n_denied", T.LongType()),
        T.StructField("tokens_left_micro", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

TOKEN_BUCKET_STATE = T.StructType(
    [
        T.StructField("tokens", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("admitted", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)

# micro-tokens; the SINGLE source of truth — the batch twin
# (queries_r9.token_bucket_admissions) imports these
TB_CAP_MICRO = 5_000_000
TB_COST_MICRO = 1_000_000


def _token_bucket_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    tokens, last_us, n, admitted, seq = (
        state.get if state.exists else (TB_CAP_MICRO, None, 0, 0, 0)
    )
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_nanos", "event_id"])
    for ts_ns in rows["ts_nanos"]:
        ts_us = int(ts_ns) // 1000
        dt = 0 if last_us is None else ts_us - last_us
        last_us = ts_us
        tokens = min(TB_CAP_MICRO, tokens + dt // 10)
        if tokens >= TB_COST_MICRO:
            tokens -= TB_COST_MICRO
            admitted += 1
        n += 1
    seq += 1
    state.update((tokens, last_us, n, admitted, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_admitted": [admitted],
            "n_denied": [n - admitted],
            "tokens_left_micro": [tokens],
            "emit_seq": [seq],
        }
    )


def streaming_token_bucket(events: DataFrame) -> DataFrame:
    """Per-user streaming token-bucket rate limiter — the stateful twin
    of the batch ``token_bucket_admissions`` query (queries_r9): the
    identical integer micro-token recurrence (capacity 5 tokens, 1 token
    per event, refill 1 token / 10 s from inter-arrival gaps) carried
    across micro-batches in GroupState, so after the stream drains the
    admitted/denied counts and the remaining level equal the batch fold
    EXACTLY (pinned by test). This is the enforcement half of the replay
    query: the same state machine that audits limits over history runs
    live at the edge. Same in-order-arrival contract as the EWMA /
    balance twins (FileStreamSource replay in event order)."""
    prepared = events.select("user_id", "ts_nanos", "event_id")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _token_bucket_fn,
        outputStructType=TOKEN_BUCKET_OUTPUT,
        stateStructType=TOKEN_BUCKET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
