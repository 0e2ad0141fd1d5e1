"""Dedup-family 100x stress harness (SCALE.md methodology, repeatable).

Replicates sf0.1 documents 100x in one of two worst-case topologies and
times dedup_clusters end-to-end (noop-equivalent count action):

    python scripts/stress_dedup.py identical   # 100 byte-identical copies
    python scripts/stress_dedup.py perturbed   # copy-distinct suffix token:
                                               # every doc gains 99 NEAR-dup
                                               # siblings (dense family)
    python scripts/stress_dedup.py perturbed --contract-off

Measured r6 numbers (local[32], single-shot, idle machine — concurrent
load inflates these badly): identical 13.4 s; perturbed 172 s (contract
on) / 197 s (off); r5 code measured 574-836 s on the same corpus before
connected_components materialized its edge list.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.operators.dedup import dedup_clusters  # noqa: E402
from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402


def main() -> int:
    topology = sys.argv[1] if len(sys.argv) > 1 else "perturbed"
    contract = "--contract-off" not in sys.argv
    copies_n = int(os.environ.get("SPARK_GRAFT_STRESS_COPIES", "100"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = ensure_engine_conf(get_spark("stress-dedup", master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(copies_n).select(F.col("id").alias("copy"))
    rep = docs.crossJoin(copies)
    if topology == "identical":
        big = rep.select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "text",
        )
    elif topology == "perturbed":
        big = rep.select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ", "text", F.concat(F.lit("v"), F.col("copy"))
            ).alias("text"),
        )
    else:
        raise SystemExit(f"unknown topology {topology!r}")
    big = big.repartition(64).localCheckpoint(eager=True)
    n = big.count()
    t0 = time.time()
    out = dedup_clusters(
        big, "text", "doc_id", threshold=0.5, contract_exact=contract
    )
    cnt = out.count()
    print(
        f"stress_dedup {topology} contract={'on' if contract else 'off'} "
        f"copies={copies_n}: rows_in={n} rows_out={cnt} "
        f"wall={time.time() - t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
