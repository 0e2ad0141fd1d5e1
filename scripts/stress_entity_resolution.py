"""Entity-resolution stress harness (SCALE.md methodology).

Scales the ★entity_resolution_golden corpus Kx (default 10x over sf0.1 =
200k dirty records) the way a real master-data corpus grows — MORE
ENTITIES at the same dup rate, not fatter duplicate families — by
replicating the part table with the rep index woven into the brand
suffix. That keeps per-entity multiplicity constant while the blocking
keys fan out with the corpus, so candidate pairs should grow ~linearly.

The contrast case (``--hot``) replicates withOUT mutating the strings:
every copy lands in the SAME blocks, per-block cardinality grows Kx and
the block-keyed self-join goes quadratic — the classic ER blocking
failure mode. Run it at a small K to see the knee; the mitigation is
finer blocking keys or per-block caps (the staged hot_bucket_cap_audit
machinery).

    python scripts/stress_entity_resolution.py          # 10x, scaled blocks
    python scripts/stress_entity_resolution.py --hot    # 3x, hot blocks
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gan_deeplearning4j_spark.session import (  # noqa: E402
    ensure_engine_conf,
    get_spark,
)


def main() -> int:
    hot = "--hot" in sys.argv
    copies_n = int(os.environ.get("SPARK_GRAFT_STRESS_COPIES",
                                  "3" if hot else "10"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = ensure_engine_conf(get_spark("stress-er", master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")

    from gan_deeplearning4j_spark.queries_r10 import er_keyed, er_resolve

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n_base = part.count()
    copies = F.broadcast(spark.range(copies_n).select(F.col("id").alias("rep")))
    scaled = part.crossJoin(copies).select(
        (F.col("p_partkey") + F.col("rep") * (n_base + 1)).alias("p_partkey"),
        # scaled mode: the rep index is woven into the FIRST token (the
        # blocking axis), so block cardinality fans out Kx and per-block
        # size stays at the base level -> new entities, linear pairs.
        # hot mode: identical strings -> the same blocks swell Kx and the
        # block-keyed self-join goes quadratic.
        (F.col("p_name") if hot
         else F.concat(F.lit("v"), F.col("rep"), F.lit("-"), F.col("p_name"))
         ).alias("p_name"),
        "p_brand",
        "p_retailprice",
    )
    scaled.createOrReplaceTempView("part")

    # the SAME dirty/blocking SQL the registered query certifies — shared
    # via er_keyed so the measured pipeline cannot drift from the query
    keyed = er_keyed(spark).localCheckpoint(eager=True)
    n_rows = keyed.count()
    n_blocks, max_block = keyed.groupBy("bk").count().agg(
        F.count("*"), F.max("count")).collect()[0]

    t0 = time.time()
    # max_block=None: the stress harness deliberately measures past the
    # guard (hot mode EXISTS to characterize the quadratic knee the
    # default cap now refuses).
    out = er_resolve(keyed, max_block=None).collect()
    wall = time.time() - t0
    print(f"mode={'hot' if hot else 'scaled'} copies={copies_n} "
          f"rows={n_rows} blocks={n_blocks} max_block={max_block} "
          f"wall={wall:.1f}s top_cluster={out[0]['n_members'] if out else 0}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
