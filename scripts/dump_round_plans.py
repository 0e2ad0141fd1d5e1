"""Dump per-headline-query formatted physical plans into plans/<round>/.

    python scripts/dump_round_plans.py r13 before [sf_dir] [query ...]

Writes plans/<round>/<query>_<tag>.txt for every headline query (or just
the named ones), so an optimization round can commit before/after plan
evidence per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_deeplearning4j_spark.plans.explain import formatted_plan  # noqa: E402
from gan_deeplearning4j_spark.queries import REGISTRY  # noqa: E402
from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    rnd, tag = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    names = rest or [n for n, q in REGISTRY.items() if q.headline]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    spark = ensure_engine_conf(get_spark("plan-dump", master="local[4]"))
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = REGISTRY[name]
        plan = formatted_plan(q.fn(spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {tag} ({sf_dir})\n\n{plan.strip()}\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
