"""Chunk-dedup 100x stress (SCALE.md methodology, repeatable).

Replicates sf0.1 documents 100x and times chunk_dedup_stats end-to-end:

    python scripts/stress_chunk_dedup.py identical   # 100 byte-identical
                                                     # copies: EVERY chunk
                                                     # is cross-doc dup
    python scripts/stress_chunk_dedup.py perturbed   # per-copy suffix token
                                                     # (last chunk unique)

`identical` is the worst case for the shared-hash join-back (the shared
relation is as large as the distinct-chunk set and every occurrence
matches); `perturbed` adds 100 near-dup siblings per doc so the hash
groupBy sees maximal distinct keys. Either way the only fact-sized
shuffle carries (32-byte hash, doc_id, source).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.operators.dedup import chunk_dedup_stats  # noqa: E402
from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402


def main() -> int:
    topology = sys.argv[1] if len(sys.argv) > 1 else "identical"
    copies_n = int(os.environ.get("SPARK_GRAFT_STRESS_COPIES", "100"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = ensure_engine_conf(get_spark("stress-chunk", master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    copies = spark.range(copies_n).select(F.col("id").alias("copy"))
    rep = docs.crossJoin(copies)
    if topology == "identical":
        big = rep.select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "source", "text",
        )
    elif topology == "perturbed":
        big = rep.select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "source",
            F.concat_ws(
                " ", "text", F.concat(F.lit("v"), F.col("copy"))
            ).alias("text"),
        )
    else:
        raise SystemExit(f"unknown topology {topology!r}")
    big = big.repartition(64).localCheckpoint(eager=True)
    n = big.count()

    t0 = time.time()
    out = chunk_dedup_stats(big, chunk_words=8).collect()
    wall = time.time() - t0
    total = sum(r.n_chunks for r in out)
    dup = sum(r.n_dup_chunks for r in out)
    print(
        f"topology={topology} docs={n} groups={len(out)} "
        f"chunks={total} dup={dup} wall={wall:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
