"""Round-13 staged queries — written during round 12.

Same staging pattern as queries_r7..r14 (see their module docstrings): new
queries written after the round-12 live flips stay behind
``SPARK_GRAFT_R15=1`` until CORRECTNESS_r12 lands and round 13 makes
registration unconditional.

Wave focus: the last unexercised Spark 4 surfaces (the SQL:2023
``regr_*`` linear-regression aggregate family, ``mode()``/``median``/
``percentile_disc`` WITHIN GROUP, bitwise aggregates, ``approx_top_k``,
``grouping()``/``grouping_id()`` over ROLLUP, the ``xpath_*``/``from_xml``
XML lane) plus two embedding-infrastructure audits a 100 TB vector
pipeline runs before committing storage formats (int8 quantization error,
Matryoshka truncation drift).

Name-sweep note: a first draft carried ``variant_props_extract`` and
``neardup_threshold_sweep`` — both DROPPED on the pre-registration grep
(the round-5 registry already pins the VARIANT lane and the threshold
sweep under exactly those names; re-registering would have silently
no-op'd and read as padding).

Local verification (identical gates to registered queries):

    SPARK_GRAFT_R15=1 python scripts/driver_replica.py <names...>
    SPARK_GRAFT_R15=1 python scripts/check_parity.py <names...>
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.money import cents_nonneg

from .queries import _t

STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str | None = None, headline: bool = False,
           doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        STAGED[name] = (fn, oracle, headline, doc)
        return fn
    return deco


def register_all() -> None:
    """Register the staged queries — idempotent by fn identity;
    raises on a name collision with a DIFFERENT query (see queries_r7)."""
    from .queries import REGISTRY, register

    for name, (fn, oracle, headline, doc) in STAGED.items():
        if name in REGISTRY:
            if REGISTRY[name].fn is fn:
                continue  # repeat register_all() under both import orders
            raise ValueError(
                f"register_all: staged query name {name!r} already "
                "registered by a different module — a silent skip would "
                "ship the OLD query under this wave's name"
            )
        register(name, oracle=oracle, headline=headline, doc=doc)(fn)


def _agree_or_both_undefined(cmp: "F.Column", native: "F.Column",
                             closed: "F.Column") -> "F.Column":
    """NULL-safe bracket verdict: the within-tolerance comparison, except
    that a group whose closed form is undefined (NULL — e.g. a
    constant-column group zeroes the variance and non-ANSI division
    yields NULL, in Spark AND DuckDB 1.0 alike) counts as agreeing iff
    the native aggregate is ALSO undefined (NULL or NaN). Without this,
    the comparison itself goes NULL on a degenerate corpus while the
    oracle emits literal TRUE, failing the hash even though the native
    is behaving correctly."""
    return F.coalesce(
        cmp, closed.isNull() & (native.isNull() | F.isnan(native))
    )


# ---------------------------------------------------------------------------
# regr_* linear-regression aggregates, guarantee-bracketed against the
# exact-integer-moment closed form
# ---------------------------------------------------------------------------

@_stage(
    "regr_native_bracket",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_discount * 10000) AS BIGINT) AS y
      FROM lineitem
    ), mo AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM p GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy,
           CAST(floor(((n * sxy - sx * sy) * 1.0 /
                       (n * sxx - sx * sx)) * 1000000000) AS BIGINT)
             AS slope_e9,
           TRUE AS slope_ok,
           CAST(floor(((sy - ((n * sxy - sx * sy) * 1.0 /
                              (n * sxx - sx * sx)) * sx) / n) * 1000000)
                AS BIGINT) AS icept_e6,
           TRUE AS icept_ok
    FROM mo ORDER BY l_returnflag
    """,
    doc="SQL:2023 regr_* linear-regression aggregates (regr_slope / "
        "regr_intercept / regr_count), guarantee-bracketed against the "
        "exact closed form: x = quantity (small int), y = discount in "
        "basis points (int), so every moment sum (n, sx, sy, sxy, sxx) "
        "is an EXACT int64 and the closed-form slope/intercept is one "
        "identical double expression per engine (int->double casts and "
        "double *,-,/ are correctly-rounded IEEE — bit-equal across "
        "engines; the Spearman/Welch house rule). Spark's native "
        "regr_slope uses an incremental co-moment accumulation whose "
        "rounding is ORDER-dependent, so the native value is emitted "
        "only as a verdict (within 1e-9 of the closed form, scaled to "
        "the statistic's natural magnitude sd_y/sd_x — NOT to the "
        "near-zero closed value, which would collapse the tolerance; "
        "the bracket the perturbation sweeps re-check under shuffle3); "
        "the hashed columns are the deterministic moments + closed "
        "forms. Scale: one map-side-combinable moment pass; the native "
        "aggregate rides the same pass.",
)
def q_regr_native_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("y"),
    )
    mo = p.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        # syy feeds only the verdict tolerance scale, never the hash
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.expr("regr_slope(CAST(y AS DOUBLE), CAST(x AS DOUBLE))")
        .alias("nslope"),
        F.expr("regr_intercept(CAST(y AS DOUBLE), CAST(x AS DOUBLE))")
        .alias("nicept"),
    )
    closed_slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * F.lit(1.0)
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    closed_icept = (
        (F.col("sy") - closed_slope * F.col("sx")) / F.col("n")
    )
    # Verdict tolerances scale to each statistic's NATURAL magnitude
    # (sd_y/sd_x for slope, sd_y*(1+|mean_x|/sd_x) for intercept), not to
    # the possibly-near-zero closed value itself — quantity vs discount is
    # essentially uncorrelated, so |closed_slope| is tiny and a
    # closed-value-relative tolerance would collapse to ~absolute 1e-15
    # and flip on accumulation order (ADVICE r12). The 1e-12 additive
    # floor keeps a degenerate constant-column group from zeroing the
    # scale entirely.
    sd_x = (
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
               * F.lit(1.0)) / F.col("n")
    )
    sd_y = (
        F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
               * F.lit(1.0)) / F.col("n")
    )
    mean_x_abs = F.abs(F.col("sx") * F.lit(1.0) / F.col("n"))
    return mo.select(
        "l_returnflag", "n", "sx", "sy",
        F.floor(closed_slope * 1e9).cast("long").alias("slope_e9"),
        _agree_or_both_undefined(
            F.abs(F.col("nslope") - closed_slope)
            <= F.lit(1e-9) * (sd_y / sd_x) + F.lit(1e-12),
            F.col("nslope"), closed_slope,
        ).alias("slope_ok"),
        F.floor(closed_icept * 1e6).cast("long").alias("icept_e6"),
        _agree_or_both_undefined(
            F.abs(F.col("nicept") - closed_icept)
            <= F.lit(1e-9) * sd_y * (F.lit(1.0) + mean_x_abs / sd_x)
            + F.lit(1e-12),
            F.col("nicept"), closed_icept,
        ).alias("icept_ok"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# mode() / median / percentile_disc WITHIN GROUP
# ---------------------------------------------------------------------------

@_stage(
    "mode_median_family",
    oracle="""
    WITH p AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ), cnt AS (
      SELECT l_returnflag, q, CAST(COUNT(*) AS BIGINT) AS c
      FROM p GROUP BY 1, 2
    ), mx AS (
      SELECT l_returnflag, MAX(c) AS mode_count
      FROM cnt GROUP BY l_returnflag
    ), st AS (
      SELECT l_returnflag,
             CAST(median(q) * 10 AS BIGINT) AS median_qty_x10,
             CAST(quantile_disc(q, 0.5) AS BIGINT) AS p50_disc
      FROM p GROUP BY l_returnflag
    )
    SELECT s.l_returnflag, m.mode_count, TRUE AS mode_in_argmax,
           s.median_qty_x10, s.p50_disc
    FROM st s JOIN mx m USING (l_returnflag)
    ORDER BY s.l_returnflag
    """,
    doc="The SQL:2023 inverse-distribution trio over integer quantities, "
        "tie-safely bracketed: mode() WITHIN GROUP returned OPPOSITE "
        "tied values in two probes (a literal-values session picked the "
        "order-LAST tied value; the corpus run picked the order-FIRST — "
        "found when sf0.001 has quantities 43/47 tied at count 53), so "
        "the native mode VALUE never reaches the hash. The output "
        "carries the exact max multiplicity (tie-invariant) plus the "
        "verdict that the native mode's own count equals it (membership "
        "in the argmax set — the heavy_hitters_approx lesson applied to "
        "an exact aggregate with unspecified tie order). median "
        "(interpolated — exact in doubles for ints, emitted x10 so the "
        ".5 midpoints stay integral) and percentile_disc(0.5) WITHIN "
        "GROUP (the discrete order statistic, always an actual data "
        "value — DuckDB twin quantile_disc) hash directly. Scale: mode "
        "over a bounded value domain collapses to a tiny (group, value) "
        "count relation; the heavy pass is one map-side-combinable "
        "count.",
)
def q_mode_median_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    native = p.groupBy("l_returnflag").agg(
        F.expr("mode() WITHIN GROUP (ORDER BY q)").cast("long")
        .alias("mode_qty"),
        F.expr("CAST(median(q) * 10 AS BIGINT)").alias("median_qty_x10"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY q)"
               " AS BIGINT)").alias("p50_disc"),
    )
    cnt = p.groupBy("l_returnflag", "q").agg(
        F.count("*").cast("long").alias("c")
    )
    mx = cnt.groupBy("l_returnflag").agg(
        F.max("c").cast("long").alias("mode_count")
    )
    return (
        native
        .join(cnt.withColumnRenamed("q", "mode_qty"),
              ["l_returnflag", "mode_qty"])
        .join(mx, "l_returnflag")
        .select(
            "l_returnflag", "mode_count",
            (F.col("c") == F.col("mode_count")).alias("mode_in_argmax"),
            "median_qty_x10", "p50_disc",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# bitwise aggregates
# ---------------------------------------------------------------------------

@_stage(
    "bitwise_agg_audit",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(bit_and(c_custkey) AS BIGINT) AS key_and,
           CAST(bit_or(c_custkey) AS BIGINT) AS key_or,
           CAST(bit_xor(c_custkey) AS BIGINT) AS key_xor
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Bitwise aggregate family (bit_and / bit_or / bit_xor) — the "
        "flag-mask rollup surface (permission masks, feature flags, "
        "set-membership checksums: xor over a key set is the classic "
        "order-free reconciliation digest, the scalar cousin of "
        "★table_content_digest). Exact int64 semantics in both engines. "
        "Scale: all three are commutative-associative single-value "
        "states — perfectly map-side combinable, byte-sized partials.",
)
def q_bitwise_agg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    return (
        cu.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("bit_and(c_custkey)").cast("long").alias("key_and"),
            F.expr("bit_or(c_custkey)").cast("long").alias("key_or"),
            F.expr("bit_xor(c_custkey)").cast("long").alias("key_xor"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# approx_top_k with an exactness bracket (distinct domain << sketch budget)
# ---------------------------------------------------------------------------

@_stage(
    "approx_topk_bracket",
    oracle="""
    WITH cnt AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    )
    SELECT q, c, TRUE AS in_sketch
    FROM cnt ORDER BY c DESC, q LIMIT 5
    """,
    doc="approx_top_k (Spark 4's frequent-items sketch aggregate) with "
        "an exactness bracket: over a bounded value domain (quantity, "
        "~50 distinct) the sketch's default 10k tracked items make its "
        "counts EXACT — the output emits the exact top-5 (count desc, "
        "value tiebreak) plus the verdict that each (item, exact_count) "
        "appears in the sketch result; sketch-side ordering of tied "
        "counts never reaches the hash (membership is checked on "
        "(item, count) pairs, the heavy_hitters_approx lesson). At "
        "100 TB the same aggregate runs over unbounded domains where it "
        "is genuinely approximate — the bounded-domain run is the "
        "correctness pin. k=60 exceeds the ~50-value domain so the "
        "sketch returns every value (no rank-boundary tie can evict an "
        "exact-top item). Scale: one sketch pass, mergeable partials.",
)
def q_approx_topk_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(F.col("l_quantity").cast("long").alias("q"))
    # k=60 >= the ~50-value domain: the sketch returns EVERY value with
    # its exact count, so tied counts at any rank boundary can never
    # push an exact-top item out of the sketch result
    sketch = q.agg(
        F.expr("approx_top_k(q, 60)").alias("tk")
    ).select(
        F.expr("transform(tk, e -> named_struct('q', CAST(e.item AS"
               " BIGINT), 'c', CAST(e.count AS BIGINT)))").alias("tk")
    )
    exact = (
        q.groupBy("q").agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), "q").limit(5)
    )
    return (
        exact.crossJoin(F.broadcast(sketch))
        .select(
            "q", "c",
            F.array_contains(
                F.col("tk"), F.struct(F.col("q"), F.col("c"))
            ).alias("in_sketch"),
        )
        .orderBy(F.desc("c"), "q")
    )


# ---------------------------------------------------------------------------
# int8 symmetric quantization audit over embeddings (exact integer math)
# ---------------------------------------------------------------------------

@_stage(
    "embedding_int8_quant_audit",
    oracle="""
    WITH xq AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))
               AS v
      FROM embeddings
    ), per AS (
      SELECT vec_id, label,
             list_max(list_transform(v, e -> abs(e))) AS amax,
             v
      FROM xq
    ), err AS (
      SELECT vec_id, label, amax,
             list_max(list_transform(v,
               e -> abs(127 * e - ((127 * e) // amax) * amax))) AS max_e
      FROM per WHERE amax > 0
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MAX(max_e * 1000000 // (127 * amax)) AS BIGINT)
             AS worst_ppm,
           CAST(SUM(max_e * 1000000 // (127 * amax)) // COUNT(*) AS BIGINT)
             AS avg_ppm
    FROM err GROUP BY label ORDER BY label
    """,
    doc="Int8 symmetric-quantization error audit — the storage-format "
        "decision every 100 TB vector store makes (4x smaller, how much "
        "recall risk?): vectors quantize via the engine-invariant "
        "floor(x * 2^20) fixed point, per-vector scale = max |component|, "
        "int8 code = (127 * x) // scale (truncating div — identical "
        "semantics in Spark div and DuckDB //), and the reported error "
        "is the exact reconstruction residual |127x - q*scale| "
        "normalized to ppm of full scale, summarized per label (worst / "
        "average). All integer — hash-exact across engines. Scale: pure "
        "scan-side higher-order expressions, one small grouped "
        "aggregate; nothing shuffles but the per-label summary.",
)
def q_embedding_int8_quant_audit(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    v = F.expr(
        "transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))"
    )
    per = emb.select(
        "vec_id", "label", v.alias("v")
    ).select(
        "vec_id", "label", "v",
        F.expr("array_max(transform(v, e -> abs(e)))").alias("amax"),
    ).filter(F.col("amax") > 0)
    err = per.select(
        "label", "amax",
        F.expr(
            "array_max(transform(v,"
            " e -> abs(127 * e - ((127 * e) div amax) * amax)))"
        ).alias("max_e"),
    )
    return (
        err.groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.max(F.expr("max_e * 1000000 div (127 * amax)"))
            .cast("long").alias("worst_ppm"),
            F.expr("sum(max_e * 1000000 div (127 * amax)) div count(*)")
            .cast("long").alias("avg_ppm"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation drift (cosine at 16/64 dims, fixed point)
# ---------------------------------------------------------------------------

@_stage(
    "matryoshka_truncation_audit",
    oracle="""
    WITH xq AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))
               AS v
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
      FROM xq a JOIN xq b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 10 = 0
    ), dots AS (
      SELECT id_a, id_b,
             list_sum(list_transform(range(1, 17),
               i -> va[i] * vb[i])) AS dot16,
             list_sum(list_transform(range(1, 17),
               i -> va[i] * va[i])) AS na16,
             list_sum(list_transform(range(1, 17),
               i -> vb[i] * vb[i])) AS nb16,
             list_sum(list_transform(range(1, 65),
               i -> va[i] * vb[i])) AS dot64,
             list_sum(list_transform(range(1, 65),
               i -> va[i] * va[i])) AS na64,
             list_sum(list_transform(range(1, 65),
               i -> vb[i] * vb[i])) AS nb64
      FROM pairs
    ), cosd AS (
      SELECT id_a, id_b,
             CAST(floor(dot16 / sqrt(CAST(na16 AS DOUBLE)
                                     * CAST(nb16 AS DOUBLE)) * 1000000)
                  AS BIGINT) AS cos16_e6,
             CAST(floor(dot64 / sqrt(CAST(na64 AS DOUBLE)
                                     * CAST(nb64 AS DOUBLE)) * 1000000)
                  AS BIGINT) AS cos64_e6
      FROM dots
    )
    SELECT id_a, id_b, cos16_e6, cos64_e6,
           abs(cos64_e6 - cos16_e6) AS drift_e6
    FROM cosd
    ORDER BY drift_e6 DESC, id_a LIMIT 20
    """,
    doc="Matryoshka-truncation drift audit — the dimension-reduction "
        "decision (store 16 of 64 dims, 4x cheaper ANN: how much does "
        "pairwise cosine move?): for a deterministic pair sample "
        "(vec_id % 10 == 0 paired with its successor), cosine at the "
        "16-dim prefix vs the full 64 dims, top-20 worst drifts. Math "
        "is the house fixed-point recipe: floor(x*2^20) int64 "
        "components, exact integer dot/norms (bounded by 64 * (2^20 * "
        "0.5)^2 << 2^63), then ONE identical double expression per "
        "engine (int->double casts, *, /, sqrt are all correctly-rounded "
        "IEEE — bit-equal cross-engine; only transcendentals drift), "
        "floored to e6. Scale: the pair sample is a self-join on a "
        "computed key (vec_id+1) — at 100 TB the sample is a hash-mod "
        "of the id space and the join stays co-partitioned on vec_id.",
)
def q_matryoshka_truncation_audit(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    xq = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))"
        ).alias("v"),
    )
    a = xq.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = xq.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
    )
    pairs = a.join(b, "id_a")

    def dot(x, y, n):
        return F.expr(
            f"aggregate(zip_with(slice({x}, 1, {n}), slice({y}, 1, {n}),"
            f" (p, q) -> p * q), 0L, (acc, e) -> acc + e)"
        )

    dots = pairs.select(
        "id_a", "id_b",
        dot("va", "vb", 16).alias("dot16"),
        dot("va", "va", 16).alias("na16"),
        dot("vb", "vb", 16).alias("nb16"),
        dot("va", "vb", 64).alias("dot64"),
        dot("va", "va", 64).alias("na64"),
        dot("vb", "vb", 64).alias("nb64"),
    )
    cos16 = F.floor(
        F.col("dot16")
        / F.sqrt(F.col("na16").cast("double") * F.col("nb16").cast("double"))
        * 1000000
    ).cast("long")
    cos64 = F.floor(
        F.col("dot64")
        / F.sqrt(F.col("na64").cast("double") * F.col("nb64").cast("double"))
        * 1000000
    ).cast("long")
    return (
        dots.select(
            "id_a", "id_b",
            cos16.alias("cos16_e6"), cos64.alias("cos64_e6"),
        )
        .withColumn("drift_e6", F.abs(F.col("cos64_e6") - F.col("cos16_e6")))
        .orderBy(F.desc("drift_e6"), "id_a")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# grouping() / grouping_id() over ROLLUP — which aggregation level is this
# row? (the subtotal-disambiguation surface a NULL-coalescing report needs)
# ---------------------------------------------------------------------------

@_stage(
    "grouping_id_rollup_audit",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
           COALESCE(l_linestatus, 'ALL') AS lstat,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rflag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_lstat,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY gid, rflag, lstat
    """,
    doc="grouping() / grouping_id() over ROLLUP — the subtotal-level "
        "disambiguation surface: a rolled-up report cannot tell a REAL "
        "NULL group from a subtotal row by looking at the key columns, "
        "so SQL exposes grouping flags (1 = this column is aggregated "
        "away) and the packed grouping_id bitmask. Spark's zero-arg "
        "grouping_id() and DuckDB's GROUPING_ID(cols...) agree when the "
        "argument list is the full ROLLUP column list in order (probed). "
        "The rollup/cube/grouping-sets AGGREGATION shapes are pinned "
        "since r3 (★cube_agg etc.); this entry pins the grouping "
        "FUNCTIONS, which those queries never emitted. Scale: ROLLUP is "
        "one expand + one map-side-combinable aggregate; the flag "
        "columns are free metadata of the expand.",
)
def q_grouping_id_rollup_audit(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rflag"),
            F.grouping("l_linestatus").cast("long").alias("g_lstat"),
            F.expr("grouping_id()").cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(cents_nonneg(F.col("l_extendedprice")))
            .cast("long").alias("cents"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("lstat"),
            "g_rflag", "g_lstat", "gid", "n_rows", "cents",
        )
        .orderBy("gid", "rflag", "lstat")
    )


# ---------------------------------------------------------------------------
# xpath_* / from_xml: the XML extraction lane (round-trip identity oracle)
# ---------------------------------------------------------------------------

@_stage(
    "xml_xpath_extract",
    oracle="""
    SELECT o_orderpriority AS pri,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_via_xpath,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_open_via_xpath,
           CAST(COUNT(*) AS BIGINT) AS n_struct_match
    FROM orders GROUP BY o_orderpriority ORDER BY pri
    """,
    doc="XML extraction lane (xpath_long / xpath_string / from_xml — the "
        "third semi-structured format next to JSON and VARIANT): each "
        "order is serialized scan-side into an XML fragment "
        "(<o><c>cents</c><s>status</s></o>), then read BACK through "
        "xpath_long (typed numeric path), xpath_string, and from_xml "
        "(schema-declared struct), and the per-priority aggregates of "
        "the extracted values must equal the direct column aggregates — "
        "a round-trip identity oracle (DuckDB has no XML engine, so the "
        "oracle aggregates the source columns; equality proves "
        "serialize -> parse -> extract is lossless, which is exactly "
        "what an XML-ingest pipeline needs pinned). n_struct_match "
        "counts rows where from_xml's struct agrees with both xpath "
        "extractions. Scale: all three extractors are scan-side JVM "
        "expressions — no shuffle beyond the final aggregate; at 100 TB "
        "the XML parse cost dominates and is embarrassingly parallel.",
)
def q_xml_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><c>"),
        cents_nonneg(F.col("o_totalprice")).cast("string"),
        F.lit("</c><s>"), F.col("o_orderstatus"), F.lit("</s></o>"),
    )
    parsed = o.select(
        "o_orderpriority",
        F.expr(
            "xpath_long(concat('<o><c>',"
            " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING),"
            " '</c><s>', o_orderstatus, '</s></o>'), '/o/c')"
        ).alias("cents_x"),
        F.expr(
            "xpath_string(concat('<o><c>',"
            " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING),"
            " '</c><s>', o_orderstatus, '</s></o>'), '/o/s')"
        ).alias("status_x"),
        F.from_xml(xml, "c BIGINT, s STRING").alias("st"),
    )
    return (
        parsed.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents_x").cast("long").alias("cents_via_xpath"),
            F.count_if(F.col("status_x") == "O").cast("long")
            .alias("n_open_via_xpath"),
            F.count_if(
                (F.col("st.c") == F.col("cents_x"))
                & (F.col("st.s") == F.col("status_x"))
            ).cast("long").alias("n_struct_match"),
        )
        .orderBy("pri")
    )


# ---------------------------------------------------------------------------
# corr / covar_pop / stddev_pop, bracketed against exact-moment closed forms
# ---------------------------------------------------------------------------

@_stage(
    "corr_covar_bracket",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_discount * 10000) AS BIGINT) AS y
      FROM lineitem
    ), mo AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(floor((n * sxy - sx * sy) * 1.0 /
                      (sqrt((n * sxx - sx * sx) * 1.0) *
                       sqrt((n * syy - sy * sy) * 1.0)) * 1000000000)
                AS BIGINT) AS corr_e9,
           TRUE AS corr_ok,
           CAST(floor((n * sxy - sx * sy) * 1.0 / n / n * 1000000)
                AS BIGINT) AS covar_pop_e6,
           TRUE AS covar_ok,
           CAST(floor(sqrt((n * syy - sy * sy) * 1.0) / n * 1000000)
                AS BIGINT) AS stddev_pop_y_e6,
           TRUE AS stddev_ok
    FROM mo ORDER BY l_returnflag
    """,
    doc="Pearson correlation / population covariance / population stddev "
        "natives, bracketed against exact-moment closed forms — the "
        "regr_native_bracket recipe applied to the OTHER SQL statistics "
        "family (corr, covar_pop, stddev_pop are distinct aggregate "
        "implementations in Spark, each with its own order-dependent "
        "incremental accumulation): x = quantity, y = discount bp, so "
        "all six moments are exact int64 (< 2^53, so the int->double "
        "casts are lossless) and the closed forms are one identical IEEE "
        "expression per engine (sqrt/divide correctly rounded). Native "
        "values surface only as verdicts with magnitude-scaled 1e-9 "
        "tolerances (1.0 for bounded corr, sd_x*sd_y for covariance, "
        "the statistic itself for stddev — never the near-cancelling "
        "closed value). Scale: one map-side-combinable moment pass "
        "carries everything.",
)
def q_corr_covar_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("y"),
    )
    mo = p.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.corr(F.col("y").cast("double"), F.col("x").cast("double"))
        .alias("ncorr"),
        F.covar_pop(F.col("y").cast("double"), F.col("x").cast("double"))
        .alias("ncovar"),
        F.stddev_pop(F.col("y").cast("double")).alias("nstd"),
    )
    c_num = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * F.lit(1.0)
    )
    closed_corr = c_num / (
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
               * F.lit(1.0))
        * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                 * F.lit(1.0))
    )
    closed_covar = c_num / F.col("n") / F.col("n")
    closed_std = (
        F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
               * F.lit(1.0)) / F.col("n")
    )
    # Tolerances scale to each statistic's natural magnitude (corr is
    # bounded in [-1,1] so scale 1; covariance scales as sd_x*sd_y;
    # stddev scales as itself) — NOT to the near-cancelling closed value,
    # which is ~0 for uncorrelated quantity/discount and would collapse
    # the tolerance to ~1e-15 absolute (ADVICE r12). 1e-12 floor guards
    # a degenerate constant-column group.
    sd_x = (
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
               * F.lit(1.0)) / F.col("n")
    )
    return mo.select(
        "l_returnflag", "n",
        F.floor(closed_corr * 1e9).cast("long").alias("corr_e9"),
        _agree_or_both_undefined(
            F.abs(F.col("ncorr") - closed_corr) <= F.lit(1e-9),
            F.col("ncorr"), closed_corr,
        ).alias("corr_ok"),
        F.floor(closed_covar * 1e6).cast("long").alias("covar_pop_e6"),
        _agree_or_both_undefined(
            F.abs(F.col("ncovar") - closed_covar)
            <= F.lit(1e-9) * sd_x * closed_std + F.lit(1e-12),
            F.col("ncovar"), closed_covar,
        ).alias("covar_ok"),
        F.floor(closed_std * 1e6).cast("long").alias("stddev_pop_y_e6"),
        _agree_or_both_undefined(
            F.abs(F.col("nstd") - closed_std)
            <= F.lit(1e-9) * closed_std + F.lit(1e-12),
            F.col("nstd"), closed_std,
        ).alias("stddev_ok"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# histogram_numeric: the streaming adaptive-bin sketch, invariant bracket
# ---------------------------------------------------------------------------

@_stage(
    "histogram_numeric_bracket",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           LEAST(CAST(8 AS BIGINT), CAST(COUNT(DISTINCT c) AS BIGINT))
             AS n_bins,
           TRUE AS weights_sum_to_n,
           TRUE AS centroids_in_range,
           TRUE AS centroids_sorted
    FROM p GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="histogram_numeric (the Ben-Haim/Tom-Tov streaming histogram "
        "behind Hive/Spark's adaptive binning) graded by its INVARIANTS "
        "— centroid positions are merge-order-dependent, so the values "
        "never reach the hash; what the sketch guarantees regardless of "
        "layout is (a) total weight is conserved through merges (sum of "
        "bin weights == exact row count: integer-valued doubles < 2^53 "
        "add exactly), (b) every centroid is a convex combination of "
        "data points, hence inside [min, max] of the column, (c) "
        "centroids are emitted sorted. The exact-binning twin is "
        "★width_bucket_histogram (fixed bounds); this entry pins the "
        "ADAPTIVE sketch a profiling pass uses when bounds are unknown. "
        "Scale: mergeable fixed-size state (8 bins), one "
        "map-side-combinable pass.",
)
def q_histogram_numeric_bracket(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
    )
    agg = p.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("histogram_numeric(c, 8)").alias("h"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
    )
    return agg.select(
        "l_returnflag", "n",
        F.size("h").cast("long").alias("n_bins"),
        (F.expr("aggregate(h, 0.0D, (a, b) -> a + b.y)")
         == F.col("n").cast("double")).alias("weights_sum_to_n"),
        # 1-cent epsilon: a centroid is a double-precision weighted mean
        # of in-range points and can land 1 ulp outside [min, max] on a
        # degenerate layout; the invariant graded is "convex combination
        # of the data", not bit-exact clamping (ADVICE r12)
        F.expr(
            "forall(h, b -> CAST(b.x AS DOUBLE) >= CAST(lo AS DOUBLE) - 1.0"
            " AND CAST(b.x AS DOUBLE) <= CAST(hi AS DOUBLE) + 1.0)"
        ).alias("centroids_in_range"),
        F.expr(
            "aggregate(slice(h, 2, size(h)),"
            " named_struct('prev', CAST(h[0].x AS DOUBLE), 'ok', true),"
            " (st, b) -> named_struct('prev', CAST(b.x AS DOUBLE),"
            "   'ok', st.ok AND CAST(b.x AS DOUBLE) >= st.prev),"
            " st -> st.ok)"
        ).alias("centroids_sorted"),
    ).orderBy("l_returnflag")


# Round-13 flip: SELF-register unconditionally at the module bottom (the
# queries_r7 pattern — both import orders work because queries.py only
# IMPORTS this module and never touches its attributes).
register_all()
