"""Physical-layout tests: bucketed tables join with zero shuffle; time
partitioning prunes directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gan_deeplearning4j_spark.io import load_table
from gan_deeplearning4j_spark.plans.explain import plan_tree
from gan_deeplearning4j_spark.sources.layouts import (
    write_bucketed,
    write_time_partitioned,
)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    import uuid

    tag = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"t_orders_{tag}", f"t_lineitem_{tag}"
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, t_orders, ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        t_lineitem, ["o_orderkey"], 8, ["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # small test tables would auto-broadcast; force the sort-merge path
        # the bucketing is designed for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table(t_orders)
        b = spark.table(t_lineitem)
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
        tree = plan_tree(joined)
        assert "SortMergeJoin" in tree, tree
        # bucketed SMJ: sort allowed, but no Exchange below the join
        join_part = tree.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, tree
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_time_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path, "ts", "day")
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("__pt") == "2024-01-05")
    tree = plan_tree(one_day)
    got = one_day.count()
    full = back.count()
    assert 0 < got < full
    # the partition filter must appear as PartitionFilters, not a post-scan Filter
    from gan_deeplearning4j_spark.plans.explain import formatted_plan

    assert "PartitionFilters" in formatted_plan(one_day)
