"""Round-start testdata schema-drift probe (VERDICT r3 item 4).

The driver regenerates /root/testdata each round and has already shipped the
events ``ts`` column under three different physical types (TIMESTAMP(NANOS)
read as long, TIMESTAMP, TIMESTAMP_NTZ) — drift that burned five driver
window slots in r2 before ``io.load_events`` grew physical-schema detection.
This probe makes any future drift fail fast in pytest instead of in the
driver window: it pins every table's LOADED (post-normalization) schema and
exercises every loader end-to-end at the test scale factor.
"""

from __future__ import annotations

import pytest

from gan_deeplearning4j_spark.io import TABLES, load_table

# The schema each loader must present to queries — the engine's normalized
# contract, independent of how the parquet writer encoded the data.  A drift
# in the physical file either normalizes away (events ts variants) or fails
# here with a diff showing exactly what moved.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        # Spark 4 reads isAdjustedToUTC=false parquet timestamps as NTZ
        # (spark.sql.parquet.inferTimestampNTZ.enabled default); NTZ-vs-LTZ
        # comparisons coerce through the session tz on BOTH sides, so query
        # semantics are tz-independent — only events.ts is normalized (to
        # LTZ + ts_nanos) because downstream window/unix_micros math needs it
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("ts_nanos", "bigint"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("table", TABLES)
def test_loaded_schema_and_scan(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == EXPECTED[table], (
        f"testdata schema drift on '{table}': loader now presents {got}"
    )
    # a full-scan action: catches value-level read errors (bad logical
    # types, ANSI cast failures), not just metadata mismatches
    assert df.count() > 0


def test_events_ts_nanos_consistent(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # ts is micro-precision truncation of ts_nanos in every physical-schema
    # generation (integer div — tolerant of a future nanos-as-long return)
    bad = ev.filter(
        F.expr("ts_nanos div 1000") != F.unix_micros("ts")
    ).count()
    assert bad == 0
