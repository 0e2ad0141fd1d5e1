"""Dataloader rank-manifest stress (SCALE.md round-13 methodology):
linearity and balance of operators/packing.rank_manifest as the packed
corpus grows.

The manifest explodes one row per 512-token window (windows =
tokens/512, linear in data); the only non-map steps are the
|sources|-row offset window and the 8-row shard aggregate — so wall
time must grow ~linearly in the corpus and the per-shard token shares
must stay in a tight band around 125000 ppm (1/8). This harness
replicates sf0.1 documents Nx (docs keep their source, so per-source
streams grow Nx) and times the manifest at each size:

    python scripts/stress_manifest.py              # 1x / 4x / 16x
    SPARK_GRAFT_STRESS_COPIES=32 python scripts/stress_manifest.py

Structural assertions per size: total windows within |sources| of
N * base windows (per-source ceiling effects only), shares within
[115000, 135000] ppm.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.operators.packing import rank_manifest  # noqa: E402
from gan_deeplearning4j_spark.session import (  # noqa: E402
    ensure_engine_conf,
    get_spark,
)


def _docs(spark, sf_dir: str, copies: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    if copies == 1:
        return base
    reps = spark.range(copies).select(F.col("id").alias("rep"))
    return base.crossJoin(reps).select(
        (F.col("doc_id") * copies + F.col("rep")).alias("doc_id"),
        "source", "text",
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    top = int(os.environ.get("SPARK_GRAFT_STRESS_COPIES", "16"))
    sizes = [n for n in (1, 4, 16, 32, 64) if n <= top]
    spark = get_spark("stress-manifest", master="local[32]",
                      shuffle_partitions=32)
    ensure_engine_conf(spark)

    base_rows = None
    for n in sizes:
        docs = _docs(spark, sf_dir, n).localCheckpoint(eager=True)
        rank_manifest(docs).count()          # warm (JIT + codegen)
        t0 = time.perf_counter()
        rows = rank_manifest(docs).collect()
        wall = time.perf_counter() - t0
        tot_w = sum(r.n_windows for r in rows)
        shares = [r.token_share_ppm for r in rows]
        if n == 1:
            base_rows = tot_w
        else:
            n_sources = docs.select("source").distinct().count()
            # ceil(n*T/512) vs n*ceil(T/512): replication AMORTIZES the
            # per-source ceiling waste, so up to n-1 fewer windows per
            # source (and at most +1 per source the other way)
            lo = n * base_rows - n * n_sources
            hi = n * base_rows + n_sources
            assert lo <= tot_w <= hi, (n, tot_w, base_rows, n_sources)
        assert all(115000 <= s <= 135000 for s in shares), (n, shares)
        print(f"copies={n:>3} windows={tot_w:>9} wall={wall:7.2f}s "
              f"share_ppm=[{min(shares)},{max(shares)}]", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
