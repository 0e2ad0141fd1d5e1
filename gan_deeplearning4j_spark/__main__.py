"""CLI entry point: run any registered query against a testdata directory.

    python -m gan_deeplearning4j_spark --list
    python -m gan_deeplearning4j_spark <query> [sf_dir] [--limit N]
    python -m gan_deeplearning4j_spark <query> --explain

Mirrors what the external driver does (vanilla session semantics are NOT
assumed: the engine session config is applied), so a user can run every
registered operator from a shell without writing PySpark.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gan_deeplearning4j_spark")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01",
        help="testdata scale-factor directory (default sf0.01)",
    )
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    ap.add_argument("--limit", type=int, default=20,
                    help="max rows to show (default 20)")
    args = ap.parse_args(argv)

    from .queries import REGISTRY

    if args.list or not args.query:
        for name, q in sorted(REGISTRY.items()):
            kind = "oracled" if q.oracle else "rows-only"
            print(f"{name:35s} [{kind}] {q.doc.split('.')[0][:80]}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2

    from .plans.explain import formatted_plan
    from .session import get_spark

    spark = get_spark("gan-dl4j-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    if args.explain:
        print(formatted_plan(df))
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
