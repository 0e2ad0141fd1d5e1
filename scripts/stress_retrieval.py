"""Retrieval-family 100x stress harness (SCALE.md methodology).

Replicates sf0.1 inputs 100x with offset ids and times the round-7
retrieval operators end-to-end (count action):

    python scripts/stress_retrieval.py maxsim   # embeddings x100 (200k vecs)
    python scripts/stress_retrieval.py bm25     # documents  x100 (500k docs)

Replication keeps the query side BOUNDED (3 queries / 3 terms) — the
production shape — so wall time should scale ~linearly with the corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "maxsim"
    copies_n = int(os.environ.get("SPARK_GRAFT_STRESS_COPIES", "100"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = ensure_engine_conf(
        get_spark("stress-retrieval", master="local[32]")
    )
    spark.sparkContext.setLogLevel("ERROR")
    copies = F.broadcast(
        spark.range(copies_n).select(F.col("id").alias("rep"))
    )

    if which == "maxsim":
        from gan_deeplearning4j_spark.operators.similarity import (
            maxsim_topk_fixed,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corpus = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "embedding",
        )
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        n = corpus.count()
        t0 = time.perf_counter()
        out = maxsim_topk_fixed(
            corpus, q, "embedding", "doc_id", "query_id"
        )
        rows = out.count()
        dt = time.perf_counter() - t0
        print(f"maxsim x{copies_n}: corpus={n} rows -> top-k rows={rows} "
              f"in {dt:.1f} s")
    elif which == "pca":
        from gan_deeplearning4j_spark.operators.similarity import (
            gram_power_eigvec,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        big = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        n = big.count()
        t0 = time.perf_counter()
        # the SAME operator the staged query certifies — no inline copy
        v, _peak = gram_power_eigvec(big, "embedding", "vec_id",
                                     dim=64, iters=3)
        rows = v.count()
        dt = time.perf_counter() - t0
        print(f"pca x{copies_n}: vectors={n} -> eigvec dims={rows} "
              f"in {dt:.1f} s")
    elif which == "bm25":
        from gan_deeplearning4j_spark.queries_r7 import bm25_int_topk_df

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        corpus = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
        )
        n = corpus.count()
        t0 = time.perf_counter()
        rows = bm25_int_topk_df(corpus).count()
        dt = time.perf_counter() - t0
        print(f"bm25 x{copies_n}: corpus={n} docs -> top rows={rows} "
              f"in {dt:.1f} s")
    else:
        raise SystemExit(f"unknown target {which!r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
