"""Phase-level timing for the eager-iterative headliners (dedup_clusters,
pagerank_fixed_topk): their bench wall is construction-side (the
localCheckpoint rounds run inside fn()), so the per-query bench number
cannot say WHICH phase is hot. This script replays each query's pipeline
with a perf_counter around every materialization, on the bench session
shape (local[$SPARK_GRAFT_CPUS], sf0.1).

    python scripts/profile_iterative.py [pagerank|dedup|both] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from gan_deeplearning4j_spark.io import load_table
from gan_deeplearning4j_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, acc):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    acc.append((label, dt))
    return out


def profile_pagerank(spark, acc):
    from gan_deeplearning4j_spark.operators.graph import (
        PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    e = edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
    und = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    und_deg = t(
        "und_deg checkpoint (join+distinct+window)",
        lambda: und.withColumn(
            "deg", F.count("*").over(Window.partitionBy("s"))
        ).localCheckpoint(eager=True),
        acc,
    )
    nodes = t(
        "nodes checkpoint (distinct)",
        lambda: und_deg.select(F.col("s").alias("node")).distinct().localCheckpoint(
            eager=True
        ),
        acc,
    )
    n_nodes = t("nodes count", lambda: nodes.count(), acc)
    ranks = nodes.withColumn("rank", F.lit(PR_SCALE).cast("long"))
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    for i in range(3):
        contrib = und_deg.join(F.broadcast(ranks), und_deg.s == ranks.node).select(
            F.col("d"), F.expr("rank div deg").alias("c")
        )
        ranks = t(
            f"iter {i} checkpoint (bcast join + agg)",
            lambda c=contrib: c.groupBy("d")
            .agg(
                (
                    F.lit(base)
                    + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")
                ).alias("rank")
            )
            .select(F.col("d").alias("node"), "rank")
            .localCheckpoint(eager=True),
            acc,
        )
    t(
        "final topk (noop)",
        lambda: ranks.orderBy(F.desc("rank"), "node")
        .limit(20)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        acc,
    )
    print(f"  [pagerank n_nodes={n_nodes}]")


def profile_dedup(spark, acc):
    from gan_deeplearning4j_spark.operators.dedup import (
        minhash_features, minhash_lsh_candidates,
    )

    docs = load_table(spark, SF, "documents")
    text_col, id_col, threshold = "text", "doc_id", 0.5
    # contract_exact probe
    wt = Window.partitionBy(text_col)
    base = t(
        "contract probe checkpoint (text window)",
        lambda: docs.select(id_col, text_col)
        .withColumn("__rep", F.min(id_col).over(wt))
        .withColumn("__grp_n", F.count("*").over(wt))
        .localCheckpoint(eager=True),
        acc,
    )
    has_fam = t(
        "contract probe count",
        lambda: base.filter(F.col("__grp_n") > 1).limit(1).count(),
        acc,
    )
    print(f"  [dedup exact-dup families present: {bool(has_fam)}]")
    feats = t(
        "minhash_features checkpoint (Arrow pass)",
        lambda: minhash_features(docs, text_col, id_col, 32).localCheckpoint(
            eager=True
        ),
        acc,
    )
    cands = minhash_lsh_candidates(docs, text_col, id_col, 32, 8, features=feats)
    sh = feats.select(F.col(id_col).alias("__id"), "__sh")
    j = (
        cands
        .join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    verified = j.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
    e = verified.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    und = t(
        "und checkpoint (LSH cands + verify)",
        lambda: e.union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).localCheckpoint(eager=True),
        acc,
    )
    labels = t(
        "labels init checkpoint (distinct)",
        lambda: und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True),
        acc,
    )
    for i in range(20):
        nbr_min = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("__m"))
        )
        new_labels = t(
            f"cc round {i} checkpoint (join+agg+join)",
            lambda n=nbr_min: labels.join(n, "node", "left")
            .select(
                "node",
                F.least("comp", "__m").alias("comp"),
                (F.col("__m") < F.col("comp")).alias("__ch"),
            )
            .localCheckpoint(eager=True),
            acc,
        )
        changed = t(
            f"cc round {i} changed count",
            lambda n=new_labels: n.filter("__ch").limit(1).count(),
            acc,
        )
        labels = new_labels.drop("__ch")
        if changed == 0:
            break
    # membership/cluster-size tail (the query's final select)
    comp = labels
    wc = Window.partitionBy("comp")
    out = (
        comp.withColumn("cluster_size", F.count("*").over(wc))
        .select(
            F.col("node").alias(id_col),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
        )
    )
    t(
        "final tail (noop)",
        lambda: out.write.format("noop").mode("overwrite").save(),
        acc,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("profile-iterative", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    load_table(spark, SF, "lineitem").write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name, fn in (("pagerank", profile_pagerank), ("dedup", profile_dedup)):
        if which not in (name, "both"):
            continue
        for r in range(repeats):
            acc: list[tuple[str, float]] = []
            t0 = time.perf_counter()
            fn(spark, acc)
            wall = time.perf_counter() - t0
            print(f"== {name} repeat {r}: wall {wall:.3f}s")
            for label, dt in acc:
                print(f"   {dt:7.3f}s  {label}")
    spark.stop()


if __name__ == "__main__":
    main()
