"""Round-6 additions: oracle promotions for the remaining rows-only
operator families (the round-5 verdict's item 4).

Every query here is a hash-grade DuckDB-oracled TWIN or GUARANTEE-BRACKET
for an operator that previously had only rows-only driver evidence:

- ``ivf_fixed_topk`` / ``lsh_fixed_topk``: exact-int64 twins of the float
  ``ivf_topk`` / ``lsh_bucketed_topk`` ANN paths, in the
  ``pq_fixed_topk`` evidence pattern (all math replayed from shared
  literals, so the oracle hash-matches bit for bit).
- ``approx_quantile_bracket`` / ``approx_distinct_bracket`` /
  ``hll_merge_bracket`` / ``heavy_hitters_guarantee``: the sketch output
  is checked IN-ENGINE against its published error guarantee and only the
  deterministic exact values + the boolean verdict are emitted — so the
  DuckDB oracle (exact values + TRUE) hash-matches exactly when the
  sketch honors its contract.  Same evidence pattern as
  ``histogram_quantile_sketch``'s bucket brackets.

All brackets use integer cross-multiplied thresholds (no float quantile
boundaries) so the verdict bit cannot flip on ulp differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.money import cents_nonneg

from .queries import _t, register

# ---------------------------------------------------------------------------
# Fixed-point ANN twins (IVF flat + hyperplane LSH)
# ---------------------------------------------------------------------------

_EMB_DIM = 64
_ANN_NQ = 4          # queries = vec_id < 4, same convention as pq_fixed_topk
_ANN_K = 5


def _ivf_fixed_oracle(dim: int = _EMB_DIM, n_centroids: int = 8,
                      nprobe: int = 3, k: int = _ANN_K,
                      nq: int = _ANN_NQ) -> str | None:
    """DuckDB replica of ivf_topk_fixed: coarse centroids inlined as BIGINT
    literals; assignment, probe selection and the exact in-list scan all in
    int64, mirroring the Spark kernel term-for-term."""
    try:
        from .operators.similarity import (
            FIXED_POINT_SCALE,
            ivfpq_fixed_reference,
        )

        coarse, _ = ivfpq_fixed_reference(dim=dim, n_centroids=n_centroids)
    except Exception:
        return None
    cc_rows = ",\n      ".join(
        f"({cid}, [{', '.join(str(v) for v in cent)}]::BIGINT[])"
        for cid, cent in enumerate(coarse)
    )
    return f"""
    WITH cc(cid, cent) AS (VALUES
      {cc_rows}),
    v AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * {FIXED_POINT_SCALE}.0) AS BIGINT)) AS xq
          FROM embeddings),
    cd AS (SELECT v.vec_id, cc.cid,
                  CAST(list_sum(list_transform(range(1, {dim}+1),
                       i -> (v.xq[i]-cc.cent[i])*(v.xq[i]-cc.cent[i])))
                       AS BIGINT) AS d
           FROM v CROSS JOIN cc),
    assign AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY d, cid) AS rn
                 FROM cd) WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d, cid) AS rn
                FROM cd WHERE vec_id < {nq}) WHERE rn <= {nprobe}),
    dist AS (SELECT p.query_id, a.vec_id,
                    CAST(list_sum(list_transform(range(1, {dim}+1),
                         i -> (qv.xq[i]-cv.xq[i])*(qv.xq[i]-cv.xq[i])))
                         AS BIGINT) AS l2_fixed
             FROM probe p
             JOIN assign a ON a.cid = p.cid
             JOIN v qv ON qv.vec_id = p.query_id
             JOIN v cv ON cv.vec_id = a.vec_id)
    SELECT query_id, vec_id, l2_fixed FROM (
      SELECT query_id, vec_id, l2_fixed,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY l2_fixed, vec_id) AS rn
      FROM dist) WHERE rn <= {k}
    """


@register(
    "ivf_fixed_topk",
    oracle=_ivf_fixed_oracle(),
    doc="IVF-Flat ANN top-k, fixed-point form (FAISS IVFFlat architecture: "
        "coarse inverted lists prune the scan, probed lists re-rank by "
        "EXACT full-vector distance — no PQ compression); all math in the "
        "floor(x*2^20) int64 domain so coarse assignment, probe selection "
        "and the in-list squared-L2 scan are engine-exact and the DuckDB "
        "oracle (coarse centroids inlined as BIGINT literals) hash-matches. "
        "Carries the hard correctness evidence for the float ivf_topk "
        "(recall-pinned in tests, rows-only by nature). Scale shape: one "
        "map-side Arrow pass assigns + scores (centroids ride in the "
        "closure), queries touch nprobe/n_centroids of the corpus, raw "
        "vectors never shuffle",
)
def q_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk_fixed

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_fixed(
        emb, q, "embedding", "vec_id", "query_id", dim=_EMB_DIM, k=_ANN_K
    )


def _lsh_fixed_oracle(dim: int = _EMB_DIM, bits: int = 16, bands: int = 4,
                      k: int = _ANN_K, nq: int = _ANN_NQ) -> str:
    """DuckDB replica of lsh_topk_fixed: the small-int hyperplanes inlined
    as literals, sign bits packed little-endian into band values, candidates
    = any shared (band, value), exact int64 L2 re-rank."""
    from .operators.similarity import FIXED_POINT_SCALE, lsh_plane_ints

    bw = bits // bands
    p_rows = ",\n      ".join(
        f"({b}, [{', '.join(str(v) for v in pl)}]::BIGINT[])"
        for b, pl in enumerate(lsh_plane_ints(dim, bits))
    )
    return f"""
    WITH p(b, pl) AS (VALUES
      {p_rows}),
    v AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * {FIXED_POINT_SCALE}.0) AS BIGINT)) AS xq
          FROM embeddings),
    bits AS (SELECT v.vec_id, p.b,
                    CASE WHEN list_sum(list_transform(range(1, {dim}+1),
                              i -> v.xq[i]*p.pl[i])) >= 0
                         THEN 1 ELSE 0 END AS bit
             FROM v CROSS JOIN p),
    bands AS (SELECT vec_id, b // {bw} AS g,
                     CAST(SUM(bit << (b % {bw})) AS BIGINT) AS val
              FROM bits GROUP BY vec_id, b // {bw}),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id
             FROM bands q JOIN bands c ON c.g = q.g AND c.val = q.val
             WHERE q.vec_id < {nq}),
    dist AS (SELECT cand.query_id, cand.vec_id,
                    CAST(list_sum(list_transform(range(1, {dim}+1),
                         i -> (qv.xq[i]-cv.xq[i])*(qv.xq[i]-cv.xq[i])))
                         AS BIGINT) AS l2_fixed
             FROM cand
             JOIN v qv ON qv.vec_id = cand.query_id
             JOIN v cv ON cv.vec_id = cand.vec_id)
    SELECT query_id, vec_id, l2_fixed FROM (
      SELECT query_id, vec_id, l2_fixed,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY l2_fixed, vec_id) AS rn
      FROM dist) WHERE rn <= {k}
    """


@register(
    "lsh_fixed_topk",
    oracle=_lsh_fixed_oracle(),
    doc="Hyperplane-LSH candidate top-k, fixed-point form (Charikar "
        "STOC'02 sign-random-projection over banded buckets): vectors "
        "quantize via floor(x*2^20), the 16 hyperplanes are shared "
        "small-int literals, candidates share >=1 of 4 band values, exact "
        "int64 squared-L2 re-rank — every step engine-exact, so the DuckDB "
        "oracle hash-matches. Carries the hard correctness evidence for "
        "the float lsh_bucketed_topk / embedding_neardup_lsh family "
        "(recall-pinned in tests). Scale shape: signature is one integer "
        "dgemm per Arrow batch (the float path's profiled kernel), bounded "
        "query set rides in the closure, only candidate (id, dist) rows "
        "ever shuffle",
)
def q_lsh_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import lsh_topk_fixed

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk_fixed(
        emb, q, "embedding", "vec_id", "query_id", dim=_EMB_DIM, k=_ANN_K
    )


# ---------------------------------------------------------------------------
# Sketch guarantee brackets (approx_percentile / HLL / freqItems)
# ---------------------------------------------------------------------------

@register(
    "approx_quantile_bracket",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ), r AS (
      SELECT l_returnflag, c,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c) AS r
      FROM c
    ), n AS (
      SELECT l_returnflag, COUNT(*) AS n FROM c GROUP BY l_returnflag
    ), k AS (
      SELECT l_returnflag, n,
             GREATEST(1, (48 * n) // 100)           AS lo50r,
             LEAST(n, (52 * n + 99) // 100)         AS hi50r,
             GREATEST(1, (88 * n) // 100)           AS lo90r,
             LEAST(n, (92 * n + 99) // 100)         AS hi90r
      FROM n
    )
    SELECT l_returnflag,
           MIN(CASE WHEN r.r = k.lo50r THEN r.c END) AS lo50_c,
           MIN(CASE WHEN r.r = k.hi50r THEN r.c END) AS hi50_c,
           TRUE AS within50,
           MIN(CASE WHEN r.r = k.lo90r THEN r.c END) AS lo90_c,
           MIN(CASE WHEN r.r = k.hi90r THEN r.c END) AS hi90_c,
           TRUE AS within90
    FROM r JOIN k USING (l_returnflag)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_percentile guarantee bracket — the oracle promotion for the "
        "rows-only approx_quantiles: per return flag, the sketch p50/p90 of "
        "price-cents (accuracy=100, relative-rank error <= 1/100) is "
        "checked IN-ENGINE against the exact order statistics at ranks "
        "(p +/- 2*eps)*N (integer cross-multiplied, 2x guarantee slop), and "
        "only the deterministic exact bracket values + the boolean verdict "
        "are emitted — hash-match iff the sketch honors its published "
        "contract. Scale: the sketch side is the mergeable 100 TB path; "
        "the exact rank side is the audit-scale twin (per-group sort), "
        "same cost class as the quantiles exact query",
)
def q_approx_quantile_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("c")
    r = li.withColumn("r", F.row_number().over(w))
    n = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    k = n.select(
        "l_returnflag", "n",
        F.greatest(F.lit(1).cast("long"),
                   F.expr("(48 * n) div 100")).alias("lo50r"),
        F.least(F.col("n"), F.expr("(52 * n + 99) div 100")).alias("hi50r"),
        F.greatest(F.lit(1).cast("long"),
                   F.expr("(88 * n) div 100")).alias("lo90r"),
        F.least(F.col("n"), F.expr("(92 * n + 99) div 100")).alias("hi90r"),
    )
    brackets = (
        r.join(k, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("r") == F.col("lo50r"), F.col("c")))
            .alias("lo50_c"),
            F.min(F.when(F.col("r") == F.col("hi50r"), F.col("c")))
            .alias("hi50_c"),
            F.min(F.when(F.col("r") == F.col("lo90r"), F.col("c")))
            .alias("lo90_c"),
            F.min(F.when(F.col("r") == F.col("hi90r"), F.col("c")))
            .alias("hi90_c"),
        )
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(c, 0.5D, 100)").alias("a50"),
        F.expr("approx_percentile(c, 0.9D, 100)").alias("a90"),
    )
    return (
        brackets.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "lo50_c", "hi50_c",
            F.col("a50").between(F.col("lo50_c"), F.col("hi50_c"))
            .alias("within50"),
            "lo90_c", "hi90_c",
            F.col("a90").between(F.col("lo90_c"), F.col("hi90_c"))
            .alias("within90"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_distinct_bracket",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           TRUE AS within_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++) guarantee bracket — the oracle "
        "promotion for the rows-only approx_distinct: per return flag, the "
        "rsd=0.02 sketch estimate is checked IN-ENGINE against the exact "
        "distinct count at a 5-sigma + slack tolerance "
        "(10*|approx - exact| <= exact + 50, pure integer math) and only "
        "the exact counts + boolean verdicts are emitted. HLL++ is "
        "deterministic for a dataset (fixed hash), so the verdict is "
        "layout-stable (perturbation sweeps re-check). Scale: both sides "
        "are two-phase aggregates; the sketch side never expands",
)
def q_approx_distinct_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("asup"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (F.abs(F.col("ap") - F.col("exact_parts")) * 10
         <= F.col("exact_parts") + 50).alias("within_parts"),
        "exact_supps",
        (F.abs(F.col("asup") - F.col("exact_supps")) * 10
         <= F.col("exact_supps") + 50).alias("within_supps"),
    ).orderBy("l_returnflag")


@register(
    "heavy_hitters_guarantee",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
           TRUE AS in_candidates
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > 66
    ORDER BY user_id
    """,
    doc="freqItems (Karp-Shenker-Papadimitriou one-pass counters) "
        "no-false-negative guarantee — the oracle promotion for the "
        "rows-only heavy_hitters_approx: every user with EXACT event count "
        "> 66 must appear in the sketch's candidate array (support is set "
        "to 66.5/N so the KSP counter budget ceil(N/66.5) guarantees "
        "exactly cnt >= 67 recall). The output is the exact heavy set + "
        "the membership verdict; candidate false POSITIVES (which ARE "
        "layout-dependent) never reach the output, so the hash is stable "
        "under repartitioning. The testdata per-user frequencies straddle "
        "66 at EVERY sf (min/median/max 45/66/99 at sf0.1) so the set is "
        "non-trivial both ways at every scale. Scale: one KSP pass + one "
        "exact two-phase count; the N-lookup is a columnar count",
)
def q_heavy_hitters_guarantee(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    n = ev.count()
    support = max(66.5 / n, 1e-4)
    cands = ev.stat.freqItems(["user_id"], support=support).select(
        F.col("user_id_freqItems").alias("cands")
    )
    heavy = (
        ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 66)
    )
    return (
        heavy.crossJoin(F.broadcast(cands))
        .select(
            "user_id", "cnt",
            F.array_contains(F.col("cands"), F.col("user_id"))
            .alias("in_candidates"),
        )
        .orderBy("user_id")
    )


@register(
    "hll_merge_bracket",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           TRUE AS within
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="DataSketches HLL union guarantee bracket — the oracle promotion "
        "for the rows-only hll_mergeable_daily_users: per event type, "
        "daily hll_sketch_agg sketches are hll_union_agg-merged and the "
        "estimate checked IN-ENGINE against the exact distinct-user count "
        "at 5%% + slack tolerance (20*|est - exact| <= exact + 20, integer "
        "math; default lgK=12 gives ~1.6%% rsd so 5%% is >3 sigma and the "
        "sketch hash is data-deterministic). Output = exact count, day "
        "count, verdict. Scale: the sketch side is THE 100 TB rollup "
        "pattern — daily partitions pre-aggregate a few-KB sketch, any "
        "range distinct-count is a union, never a fact re-scan",
)
def q_hll_merge_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)")
        .alias("est"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (F.abs(F.col("est") - F.col("exact_users")) * 20
             <= F.col("exact_users") + 20).alias("within"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-6 tail slots (window math: exactly 2 new oracled queries keep the
# never-green prefix at 50 = the driver window).  Two genuinely new query
# CLASSES, not variations: greedy sequence packing (the LLM-pipeline op
# that length_bucket_batches/doc_chunking do NOT cover) and recursive
# hierarchy explosion (BOM / org-chart rollup).
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per training bin


@register(
    "greedy_pack_bins",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT source, doc_id,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  x -> x != '')) AS BIGINT) AS tok,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    pack AS (
      SELECT source, rn, tok, 1::BIGINT AS bin_id, tok AS acc
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.source, t.rn, t.tok,
             CASE WHEN p.acc + t.tok > {_PACK_BUDGET}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.acc + t.tok > {_PACK_BUDGET}
                  THEN t.tok ELSE p.acc + t.tok END
      FROM pack p JOIN toks t ON t.source = p.source AND t.rn = p.rn + 1
    ),
    bins AS (SELECT source, bin_id,
                    CAST(COUNT(*) AS BIGINT) AS bin_docs,
                    CAST(SUM(tok) AS BIGINT) AS bin_tokens
             FROM pack GROUP BY source, bin_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_docs) AS BIGINT) AS n_docs,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens,
           CAST(SUM(bin_tokens) AS BIGINT) * 1000000
             // (COUNT(*) * {_PACK_BUDGET}) AS fill_ppm
    FROM bins GROUP BY source
    """,
    doc="Greedy sequence packing: docs are packed in doc_id order into "
        "fixed 256-token training bins per source shard (a doc longer than "
        "the budget gets a bin of its own); per-source bin count, token "
        "totals and fill ratio. The greedy scan is inherently sequential "
        "WITHIN a shard, so the shard is the parallelism unit — "
        "applyInPandas per source, one shuffle on the shard key, bins "
        "never leave the worker. Oracle replays the identical greedy "
        "recurrence as a DuckDB recursive CTE. At 100 TB the pattern "
        "holds: thousands of shards pack independently; no driver-side "
        "state, no global sort. LLM-pipeline op the brief calls 'pack'; "
        "complements length_bucket_batches (static bucketing) and "
        "doc_chunking (splitting)",
)
def q_greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.filter(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.length(t) > 0,
        )).cast("long").alias("tok"),
    )
    budget = _PACK_BUDGET

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        bins = []  # (bin_docs, bin_tokens)
        acc, ndocs = 0, 0
        for tok in pdf["tok"]:
            if ndocs > 0 and acc + tok > budget:
                bins.append((ndocs, acc))
                acc, ndocs = 0, 0
            acc += tok
            ndocs += 1
        if ndocs:
            bins.append((ndocs, acc))
        total = sum(b[1] for b in bins)
        # summary computed IN the packer: one output row per group, so the
        # whole query has a single exchange (a post-packer groupBy would
        # re-shuffle — FlatMapGroupsInPandas output reports no partitioning)
        return pd.DataFrame({
            "source": [pdf["source"].iloc[0]],
            "n_bins": [len(bins)],
            "n_docs": [sum(b[0] for b in bins)],
            "total_tokens": [total],
            "max_bin_tokens": [max(b[1] for b in bins)],
            "fill_ppm": [total * 1000000 // (len(bins) * budget)],
        })

    return toks.groupBy("source").applyInPandas(
        pack,
        "source string, n_bins long, n_docs long, total_tokens long, "
        "max_bin_tokens long, fill_ppm long",
    )


@register(
    "bom_explosion_rollup",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT p_partkey AS part,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cost_c
      FROM part
    ),
    h AS (
      SELECT part, part AS root, 0::BIGINT AS depth, cost_c
      FROM p WHERE part < 10
      UNION ALL
      SELECT c.part, h.root, h.depth + 1, c.cost_c
      FROM p c JOIN h ON c.part // 10 = h.part AND c.part >= 10
    )
    SELECT root,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           CAST(SUM(cost_c) AS BIGINT) AS total_cost_c
    FROM h GROUP BY root
    """,
    doc="Recursive hierarchy explosion (bill-of-materials / org-chart "
        "class): a forest is derived over part (parent = partkey DIV 10, "
        "roots < 10) and each root's subtree is exploded level by level — "
        "an iterative equi-join loop with per-level localCheckpoint "
        "materialization (the connected_components/pagerank machinery "
        "shape), terminating when a frontier is empty, so depth is "
        "data-driven, not hard-coded (sf0.01 is 4 levels, sf0.1 is 5). "
        "Rollup = count/max-depth/integer-cents cost sum per root. Oracle "
        "is the textbook WITH RECURSIVE walk. Scale: each level is one "
        "shuffle-on-parent equi-join over the remaining edge set — O(depth) "
        "jobs; when depth can be adversarial the star-contraction engine "
        "(connected_components(mode='logn'), operators/dedup.py — O(log^2 "
        "n) rounds regardless of diameter, equivalence-pinned) is the "
        "drop-in upgrade. No driver-side fact data: loop control reads "
        "only take(1) emptiness per level",
)
def q_bom_explosion_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part"),
        cents_nonneg(F.col("p_retailprice")).alias("cost_c"),
    )
    edges = part.where(F.col("part") >= 10).select(
        "part", F.expr("part DIV 10").alias("parent"), "cost_c"
    )
    frontier = part.where(F.col("part") < 10).select(
        "part",
        F.col("part").alias("root"),
        F.lit(0).cast("long").alias("depth"),
        "cost_c",
    ).localCheckpoint()
    levels = [frontier]
    for _ in range(40):  # safety bound; real stop is the empty frontier
        nxt = (
            edges.join(
                frontier.select(F.col("part").alias("parent"),
                                "root", "depth"),
                "parent",
            )
            .select("part", "root",
                    (F.col("depth") + F.lit(1).cast("long")).alias("depth"),
                    "cost_c")
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        levels.append(nxt)
        frontier = nxt
    union = reduce(DataFrame.unionByName, levels)
    return union.groupBy("root").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.max("depth").cast("long").alias("max_depth"),
        F.sum("cost_c").cast("long").alias("total_cost_c"),
    )
