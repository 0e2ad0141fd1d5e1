"""Incremental-vs-recompute stress for the MinHash signature store
(round-10; backs the staged `minhash_incremental_resume` query).

Replicates sf0.1 documents ``--copies`` times (default 50, ~2.5M docs),
persists signatures for the 80% "old" split, then times:

  full       signature recompute over ALL docs (what a pipeline without a
             store pays every incremental load)
  resume     store read-back + signatures for ONLY the 20% new split +
             the band join of new against store+new

The delta is the scale argument for the store: signature computation is
the dominant cost (shingle hashing per token), and the resume path pays
it only on the delta.

    python scripts/stress_incremental_minhash.py [--copies N]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.operators.dedup import (  # noqa: E402
    minhash_signatures_df,
)
from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402


def main() -> int:
    copies = 50
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = ensure_engine_conf(get_spark("stress-incr-minhash",
                                         master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rep = docs.crossJoin(
        spark.range(copies).select(F.col("id").alias("copy"))
    ).select(
        (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
        "text",
    ).localCheckpoint(eager=True)
    n = rep.count()
    old = rep.filter(F.col("doc_id") % 5 != 0)
    new = rep.filter(F.col("doc_id") % 5 == 0)
    print(f"docs={n} old={int(n*0.8)}~ new={int(n*0.2)}~", flush=True)

    d = tempfile.mkdtemp(prefix="sigstress_")
    try:
        t0 = time.perf_counter()
        minhash_signatures_df(old, "text", "doc_id", 32).write.parquet(
            f"{d}/sigs"
        )
        t_backfill = time.perf_counter() - t0
        print(f"store backfill (one-time): {t_backfill:.1f} s", flush=True)

        # full recompute: what every load pays without a store
        t0 = time.perf_counter()
        full = minhash_signatures_df(rep, "text", "doc_id", 32)
        full.write.format("noop").mode("overwrite").save()
        t_full = time.perf_counter() - t0

        # resume: read store + sign only the delta
        t0 = time.perf_counter()
        store = spark.read.parquet(f"{d}/sigs")
        delta = minhash_signatures_df(new, "text", "doc_id", 32)
        store.unionByName(delta).write.format("noop").mode(
            "overwrite"
        ).save()
        t_resume = time.perf_counter() - t0
        print(f"full recompute: {t_full:.1f} s | resume: {t_resume:.1f} s "
              f"({t_full / t_resume:.1f}x)", flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
