"""Strict local replica of the driver's CORRECTNESS gate.

Runs every oracled query at sf0.01 (driver's sf) and compares Spark vs DuckDB
MORE strictly than tests/test_oracle_parity.py: exact dtypes (catches DuckDB
HUGEINT vs BIGINT), exact values (catches ulp drift that a 9-sig-digit
stringification would hide). Usage:

    python scripts/check_parity.py [query ...]   # default: all oracled
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from gan_deeplearning4j_spark.io import TABLES
from gan_deeplearning4j_spark.queries import REGISTRY
from gan_deeplearning4j_spark.session import ensure_engine_conf, get_spark

SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    names = sys.argv[1:] or [n for n, q in REGISTRY.items() if q.oracle]
    spark = ensure_engine_conf(get_spark())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed = []
    for name in names:
        q = REGISTRY[name]
        if not q.oracle:
            print(f"SKIP  {name} (no oracle)")
            continue
        try:
            sdf = canon(q.fn(spark, SF_DIR).toPandas())
            odf = canon(con.sql(q.oracle).df())
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            continue
        problems = []
        if list(sdf.columns) != list(odf.columns):
            problems.append(f"cols {list(sdf.columns)} vs {list(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        else:
            for c in sdf.columns:
                s, o = sdf[c], odf[c]
                if str(s.dtype) != str(o.dtype):
                    problems.append(f"dtype[{c}] {s.dtype} vs {o.dtype}")
                    continue
                if s.dtype == object:
                    neq = (s.astype(str) != o.astype(str))
                else:
                    neq = ~((s == o) | (s.isna() & o.isna()))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    problems.append(
                        f"value[{c}] row {i}: {s.iloc[i]!r} vs {o.iloc[i]!r} "
                        f"({int(neq.sum())} diffs)"
                    )
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
        else:
            print(f"ok    {name} ({len(sdf)} rows)")

    print(f"\n{len(names) - len(failed)}/{len(names)} strict-match")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
