"""Invariant + plan-shape tests for the round-3 widening queries
(queries_ext.py): TPC-H shapes and training-data pipeline operators.

Value correctness is covered by the DuckDB oracles (scripts/check_parity.py
runs every oracled query strictly); these tests pin the properties an oracle
hash can't see — plan shapes that must survive at scale, and semantic
invariants (split totality, salting-result equivalence, pack bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gan_deeplearning4j_spark.plans.explain import (
    count_operator,
    formatted_plan,
    pushed_filters,
)
from gan_deeplearning4j_spark.queries import REGISTRY


def test_split_is_total_and_disjoint(spark, sf_dir):
    """Every document lands in exactly one split, and fractions are sane."""
    out = REGISTRY["train_val_test_split"].fn(spark, sf_dir).collect()
    n_docs = sum(r.n_docs for r in out)
    total = (
        REGISTRY["train_val_test_split"]
        .fn(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .count()
    )
    assert n_docs == total
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) <= {"train", "val", "test"}
    # 80/10/10 within generous tolerance at small n
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_split_stable_under_repartition(spark, sf_dir):
    """Hash splits must not depend on partition layout (rand() splits do)."""
    df1 = REGISTRY["train_val_test_split"].fn(spark, sf_dir)
    rows1 = {(r.source, r.split): r.n_docs for r in df1.collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    docs.createOrReplaceTempView("__docs_repart")
    # same computation over a repartitioned corpus
    from gan_deeplearning4j_spark.functions.text import portable_hash60

    b = portable_hash60(F.col("doc_id").cast("string")) % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    rows2 = {
        (r.source, r.split): r.n_docs
        for r in docs.select("source", "doc_id", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    }
    assert rows1 == rows2


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting is a physical rewrite; results must be identical."""
    out = REGISTRY["salted_join_agg"].fn(spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_items"), F.sum(cents).alias("rev_cents"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_length_bucket_batches_bounded(spark, sf_dir):
    """Greedy packing: every batch except a bucket's last stays under the
    target + one max-length doc (the classic bin bound)."""
    rows = REGISTRY["length_bucket_batches"].fn(spark, sf_dir).collect()
    assert rows
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, batches in by_bucket.items():
        batches.sort(key=lambda r: r.batch_id)
        # batch ids are dense from 0
        assert [b.batch_id for b in batches] == list(range(len(batches)))
        for b in batches:
            assert b.sum_tokens > 0 and b.n_docs > 0


def test_contamination_bounds(spark, sf_dir):
    rows = REGISTRY["contamination_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_grams
        assert 0 <= r.contam_ppm <= 1_000_000


def test_contamination_bench_side_broadcasts(spark, sf_dir):
    """The benchmark gram set must be on the broadcast side — a shuffle join
    here would move the full candidate gram stream at 100 TB."""
    df = REGISTRY["contamination_overlap"].fn(spark, sf_dir)
    assert count_operator(df, "BroadcastHashJoin") >= 1


def test_domain_mix_uses_window_group_limit(spark, sf_dir):
    """rank<=quota must compile to WindowGroupLimit (per-partition top-k
    pruning before the full window sort)."""
    df = REGISTRY["domain_mix_weighted"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_unpivot_is_expand_not_union(spark, sf_dir):
    """unpivot must compile to one scan + Expand, not 4 scans unioned."""
    df = REGISTRY["unpivot_metrics"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" in plan, plan
    assert "Union" not in plan, plan
    # formatted mode lists each operator twice (tree + detail section)
    assert plan.count("Scan parquet") <= 2, plan


def test_q10_pushdown_and_topk(spark, sf_dir):
    df = REGISTRY["tpch_q10_returned_revenue"].fn(spark, sf_dir)
    pf = pushed_filters(df)
    assert any("o_orderdate" in f for f in pf), pf
    assert any("l_returnflag" in f for f in pf), pf
    assert count_operator(df, "TakeOrderedAndProject") == 1


def test_q7_nation_joins_broadcast(spark, sf_dir):
    df = REGISTRY["tpch_q7_nation_volume"].fn(spark, sf_dir)
    # nation (x2 roles), supplier+nation build side: all broadcast
    assert count_operator(df, "BroadcastHashJoin") >= 3
    assert count_operator(df, "BroadcastNestedLoopJoin") == 0


def test_substring_dup_spans_finds_exact_dups(spark, sf_dir):
    """Exact duplicate documents share every 12-token span, so the span
    table must be non-empty whenever exact dups exist."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_dup_texts = (
        docs.groupBy("text").count().filter(F.col("count") >= 2).count()
    )
    spans = REGISTRY["substring_dup_spans"].fn(spark, sf_dir)
    if n_dup_texts > 0:
        assert spans.count() > 0


def test_levenshtein_zero_for_identical_prefixes(spark, sf_dir):
    rows = REGISTRY["levenshtein_prefix_pairs"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.edit_dist >= 0


def test_q8_q9_dims_broadcast(spark, sf_dir):
    """The 6-way q8 join and 5-way q9 join must broadcast every dim — one
    sort-merge join at most (lineitem↔orders)."""
    for name in ("tpch_q8_market_share", "tpch_q9_product_profit"):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert count_operator(df, "BroadcastHashJoin") >= 3, name
        assert count_operator(df, "BroadcastNestedLoopJoin") == 0, name


def test_substring_dup_spans_single_shuffle(spark, sf_dir):
    """Gram hashing is scan-stage; the only exchange carries
    (span_hash, doc_id) into the group-by (plus AQE reads)."""
    from gan_deeplearning4j_spark.plans.explain import plan_tree

    df = REGISTRY["substring_dup_spans"].fn(spark, sf_dir)
    tree = plan_tree(df)
    assert tree.count("- Exchange") <= 1, tree


def test_resample_grid_not_shuffled(spark, sf_dir):
    """The dense time grid comes from sequence/explode over the per-user
    bounds row — generated, not joined from a materialized calendar."""
    plan = formatted_plan(REGISTRY["events_resample_ffill"].fn(spark, sf_dir))
    assert "Generate" in plan and "explode" in plan, plan


def test_corr_single_aggregate_pass(spark, sf_dir):
    """All five moment sums ride one two-phase aggregate (map-side combine),
    not one pass per moment."""
    df = REGISTRY["stats_corr_exact"].fn(spark, sf_dir)
    assert count_operator(df, "HashAggregate") == 2


def test_q21_single_fact_scan_shape(spark, sf_dir):
    """Q21's two correlated EXISTS are decorrelated into ONE per-order
    aggregate joined back: lineitem must be scanned at most twice (base +
    agg branch), never the 3x of the naive self-join-per-EXISTS plan, and
    the per-order aggregate must be partial (map-side combinable)."""
    from gan_deeplearning4j_spark.plans.explain import (
        count_operator,
        plan_tree,
    )

    df = REGISTRY["tpch_q21_waiting_supplier"].fn(spark, sf_dir)
    tree = plan_tree(df)
    assert tree.count("lineitem.parquet") <= 2, tree
    # partial + final pairs for the per-order and per-supplier aggregates
    assert count_operator(df, "HashAggregate") >= 4
