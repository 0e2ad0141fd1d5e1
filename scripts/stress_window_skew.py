"""Skewed-key 100x stress for the window family (r9 verdict ask #6).

The r5 events 100x stress spread per-user keys uniformly — the friendly
case. This one replays sessionize and the trailing-1h RANGE frame over a
10M-row events table with a ZIPF-shaped key distribution: ONE user owns
~20% of all rows (2M events in a single window partition), the rest spread
uniformly across 150k users. Questions answered, recorded in SCALE.md:

  1. How much does the hot key cost vs the uniform layout?
  2. Does AQE engage? (Expected: NO — AQE skew handling splits skewed
     sort-merge-JOIN partitions; a window partition is never split because
     frame semantics need the whole key in one task. The straggler is
     structural, so the mitigation is operator-level, not config-level.)

Usage:
    python scripts/stress_window_skew.py [uniform|zipf] [--copies N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402


def build_events(spark, sf_dir: str, copies: int, topology: str):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "value"
    ).withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    rep = ev.crossJoin(
        spark.range(copies).select(F.col("id").alias("copy"))
    ).withColumn(
        "event_id",
        F.col("event_id") + F.col("copy") * F.lit(10_000_000),
    )
    if topology == "uniform":
        # the r5 layout: 100x rows, 100x distinct users
        out = rep.withColumn(
            "user_id", F.col("user_id") + F.col("copy") * F.lit(100_000)
        )
    elif topology == "zipf":
        # deterministic md5-derived percentile: ~20% of ALL rows collapse
        # onto user 0; the rest spread as in the uniform layout
        pct = F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
            16, 10,
        ).cast("long") % 100
        out = rep.withColumn(
            "user_id",
            F.when(pct < 20, F.lit(0)).otherwise(
                F.col("user_id") + F.col("copy") * F.lit(100_000)
            ),
        )
    else:
        raise SystemExit(f"unknown topology {topology!r}")
    # make event times distinct-ish within the hot key so ordered windows
    # do real work (copies share the base timestamps otherwise)
    out = out.withColumn(
        "ts_us", F.col("ts_us") + F.col("copy") * F.lit(977)
    )
    return out.drop("copy").localCheckpoint(eager=True)


def run_sessionize(ev) -> int:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 1800 * 1_000_000
    prev = F.lag("ts_us").over(w)
    new_sess = F.when(prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1
                      ).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agg = sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"),
    )
    return agg.count()


def run_range_frame(ev) -> int:
    es = (F.col("ts_us") / F.lit(1_000_000)).cast("long")
    w = (Window.partitionBy("user_id").orderBy(es)
         .rangeBetween(-3599, Window.currentRow))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    out = ev.select(
        "event_id", "user_id",
        F.sum(cents).over(w).alias("sum_1h"),
    )
    # aggregate THROUGH the window column: a bare count(*) lets Catalyst
    # prune sum_1h and drop the WindowExec entirely (measured 0.4 s for
    # 10M rows — benchmarking the scan, not the frame)
    return out.agg(F.count("sum_1h")).collect()[0][0]


def run_range_frame_halo(ev) -> int:
    """The same trailing-1h RANGE sum through range_frame_sum_halo
    (frame-width halo chunking, chunk=2h) — the measured answer to the
    zipf topology's straggler."""
    from gan_deeplearning4j_spark.operators.relational import (
        range_frame_sum_halo,
    )

    ev2 = ev.withColumn(
        "ts_sec", (F.col("ts_us") / F.lit(1_000_000)).cast("long")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    out = range_frame_sum_halo(
        ev2, "user_id", "ts_sec", cents, frame=3600, chunk=7200,
        out_col="sum_1h_c",
    )
    return out.agg(F.count("sum_1h_c")).collect()[0][0]


def main() -> int:
    topology = sys.argv[1] if len(sys.argv) > 1 else "zipf"
    copies = 100
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = ensure_engine_conf(get_spark("stress-window-skew",
                                         master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    ev = build_events(spark, sf_dir, copies, topology)
    n = ev.count()
    hot = ev.filter(F.col("user_id") == 0).count()
    print(f"topology={topology} rows={n} hot_user_rows={hot} "
          f"({100.0 * hot / n:.1f}%)", flush=True)

    for label, fn in [("sessionize", run_sessionize),
                      ("range_frame", run_range_frame),
                      ("range_frame_halo", run_range_frame_halo)]:
        t0 = time.perf_counter()
        k = fn(ev)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f} s ({k} result rows)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
