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
        # gram-matrix power iteration at 100x: the gram aggregate is the
        # only corpus-sized stage (one map-side-combinable shuffle of
        # (i, j, q_i*q_j) triples); iterations run on the 64x64 matrix
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        big = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        n = big.count()
        t0 = time.perf_counter()
        q = big.select(
            "vec_id",
            F.posexplode(
                F.expr("transform(embedding, e -> "
                       "cast(floor(cast(e as double) * 1024) as long))")
            ).alias("i0", "q"),
        ).select("vec_id", (F.col("i0") + 1).alias("i"), "q")
        qa = q.select("vec_id", F.col("i").alias("ai"),
                      F.col("q").alias("aq"))
        qb = q.select("vec_id", F.col("i").alias("bj"),
                      F.col("q").alias("bq"))
        g = (
            qa.join(qb, "vec_id")
            .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
            .agg(F.sum(F.col("aq") * F.col("bq")).cast("long").alias("g"))
            .localCheckpoint(eager=True)
        )
        v = spark.range(1, 65).select(
            F.col("id").alias("j"), F.lit(1000).cast("long").alias("v")
        )
        for _ in range(3):
            sv = (
                g.join(v, "j").groupBy("i")
                .agg(F.sum(F.col("g") * F.col("v")).cast("long")
                     .alias("s"))
            ).localCheckpoint(eager=True)
            peak = sv.agg(F.max(F.abs("s")).alias("m"))
            v = sv.crossJoin(F.broadcast(peak)).select(
                F.col("i").alias("j"),
                F.expr("s * 1000 div m").cast("long").alias("v"),
            )
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
