"""Token-window packing stress (SCALE.md round-13 methodology):
single-window vs two-level prefix-merge spans at growing per-source
stream sizes.

The registered ★token_window_packing partitions its running sum by
``source`` — with 20 sources that is a 20-task window pass no matter how
big each source's stream gets (the single-partition-per-group ceiling).
The two-level form (operators/packing.token_spans(shards=k)) splits each
source's Lehmer-ordered stream into k contiguous key ranges, runs local
sums at sources × k parallelism, and merges with a broadcast offset
table. This harness replicates sf0.1 documents Nx (docs keep their
source, so per-source streams grow Nx) and times both forms driving the
same ★token_window_packing aggregate:

    python scripts/stress_packing.py                 # 10x / 20x / 40x
    SPARK_GRAFT_STRESS_COPIES=80 python scripts/stress_packing.py
    python scripts/stress_packing.py --one-source    # the hot-group case

``--one-source`` maps every doc to one source — the regime the two-level
form exists for: a single group's stream is ONE task in the
single-window form, so its sort+cumsum serializes while everything else
scales. Measured r13 (local[32], sf0.1 base): balanced 20-source corpora
up to 200k docs show NO win (0.9-1.1x — the extra offsets scan costs
what the extra parallelism earns back; the per-source streams sort in
one task in well under a second), but one-source streams cross over:
200k docs 0.9x, 1.6M 1.07x, 3.2M **1.31x** (34.5 s -> 26.4 s) and
widening — the single-task window is the growing serial fraction. At
100 TB per-group streams are orders of magnitude past the crossover.

Equivalence is asserted per size (count + checksum over the aggregate),
so the timing compares identical outputs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.operators.packing import (  # noqa: E402
    packing_summary,
    token_spans,
)
from gan_deeplearning4j_spark.session import (  # noqa: E402
    ensure_engine_conf,
    get_spark,
)


def _checksum(df) -> tuple[int, int]:
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_windows") + F.col("n_split_docs")
              + F.col("boundary_crossings")).alias("s"),
    ).collect()[0]
    return int(r.n), int(r.s)


def main() -> int:
    one_source = "--one-source" in sys.argv
    copies_max = int(os.environ.get(
        "SPARK_GRAFT_STRESS_COPIES", "640" if one_source else "40"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shards = int(os.environ.get("SPARK_GRAFT_STRESS_SHARDS", "32"))

    spark = ensure_engine_conf(get_spark("stress-pack", master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )

    for copies in (copies_max // 4, copies_max // 2, copies_max):
        docs = (
            base.crossJoin(
                spark.range(copies).select(F.col("id").alias("c"))
            )
            .select(
                (F.col("doc_id") * copies + F.col("c")).alias("doc_id"),
                (F.lit("src00") if one_source else F.col("source"))
                .alias("source"),
                "text",
            )
            .localCheckpoint(eager=True)  # isolate gen cost
        )
        n_docs = docs.count()
        results = {}
        for mode, kw in (("single", {}), ("twolevel", {"shards": shards})):
            t0 = time.perf_counter()
            out = packing_summary(token_spans(docs, budget=512, **kw))
            chk = _checksum(out)
            secs = time.perf_counter() - t0
            results[mode] = (secs, chk)
            print(f"copies={copies} docs={n_docs} mode={mode} "
                  f"shards={kw.get('shards', 1)} "
                  f"checksum={chk} secs={secs:.2f}", flush=True)
        assert results["single"][1] == results["twolevel"][1], results
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
