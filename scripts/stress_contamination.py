"""13-gram contamination stress (SCALE.md methodology, repeatable).

Replicates sf0.1 documents N times (default 40x = 200k docs, ~11M
tokens) with a per-copy suffix token — so every copy contributes its own
near-identical gram stream and the distinct-gram relation grows with the
corpus — and times the decontam join (the registered
``decontam_drop_plan`` shape) end-to-end at increasing corpus sizes,
comparing the STRING gram key against the 60-bit md5-fold HASH key the
query docstrings prescribe for 100 TB:

    python scripts/stress_contamination.py            # 10x / 20x / 40x
    SPARK_GRAFT_STRESS_COPIES=80 python scripts/stress_contamination.py

The benchmark split is doc_id % 10 == 7 as registered; copies keep their
source doc's split membership (doc_id = orig * copies + c preserves
nothing, so the split is re-derived from the ORIGINAL id to keep the
bench share at 10%). Reported per size: wall seconds for string-keyed vs
hash-keyed join, implicated-train-doc count (must be equal for both
keys at these sizes — the 60-bit fold's birthday bound is ~2^30
distinct grams, far above these corpora).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402

_N = 13


def _grams(df, key_expr):
    toks = df.select(
        "doc_id",
        F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                 lambda x: x != "").alias("t"),
    ).filter(F.size("t") >= _N)
    exploded = toks.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(1, size(t) - {_N - 1}),"
            f" i -> array_join(slice(t, i, {_N}), ' '))"
        )).alias("g"),
    )
    return exploded.select("doc_id", key_expr.alias("k")).distinct()


def _run(docs, key: str) -> tuple[float, int]:
    if key == "string":
        kexpr = F.col("g")
    else:  # 60-bit md5-fold (15 hex chars, int64-ANSI-safe house trick)
        kexpr = F.expr("CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT)")
    is_bench = F.col("orig_id") % 10 == 7
    bench = _grams(docs.filter(is_bench), kexpr).select("k").distinct()
    train = _grams(docs.filter(~is_bench), kexpr)
    t0 = time.perf_counter()
    n = (
        train.join(F.broadcast(bench), "k")
        .select("doc_id").distinct().count()
    )
    return time.perf_counter() - t0, n


def main() -> int:
    copies_max = int(os.environ.get("SPARK_GRAFT_STRESS_COPIES", "40"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = ensure_engine_conf(get_spark("stress-contam", master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    for copies in (copies_max // 4, copies_max // 2, copies_max):
        docs = (
            base.crossJoin(
                spark.range(copies).select(F.col("id").alias("c"))
            )
            .select(
                (F.col("doc_id") * copies + F.col("c")).alias("doc_id"),
                F.col("doc_id").alias("orig_id"),
                # per-copy suffix: every replica is a near-dup sibling,
                # its tail grams unique -> distinct grams grow with corpus
                F.concat_ws(" ", "text",
                            F.concat(F.lit("copytok"), F.col("c")))
                .alias("text"),
            )
            .localCheckpoint(eager=True)  # isolate gen cost from the join
        )
        n_docs = docs.count()
        for key in ("string", "hash"):
            secs, hits = _run(docs, key)
            print(f"copies={copies} docs={n_docs} key={key} "
                  f"implicated={hits} secs={secs:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
