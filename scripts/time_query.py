"""Time one registered query the bench way (warm JVM + Python pool, noop
sink, forced GC, N isolated repeats, wall + exec-only split).

    python scripts/time_query.py <name> [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_deeplearning4j_spark.queries import REGISTRY  # noqa: E402
from gan_deeplearning4j_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    repeats = int(next((a for a in sys.argv[1:] if a.isdigit()), "5"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("time-query", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: parquet footers + python worker pool + codegen of this query
    spark.range(64).repartition(cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    import gc

    for name in names:
        q = REGISTRY[name]
        q.fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
        walls, execs = [], []
        for _ in range(repeats):
            gc.collect()
            spark.sparkContext._jvm.java.lang.System.gc()
            time.sleep(0.3)
            t0 = time.perf_counter()
            df = q.fn(spark, SF)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            walls.append(t2 - t0)
            execs.append(t2 - t1)
        walls.sort(), execs.sort()
        med = lambda xs: xs[len(xs) // 2] if len(xs) % 2 else (
            xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2  # noqa: E731
        print(
            f"{name}: wall med {med(walls):.3f} (min {walls[0]:.3f} max "
            f"{walls[-1]:.3f}) exec med {med(execs):.3f} (min {execs[0]:.3f})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
