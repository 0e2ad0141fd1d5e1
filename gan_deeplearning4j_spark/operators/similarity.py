"""Similarity search over embedding columns (north-star scope).

Brute-force cosine top-k as the exact baseline; LSH-bucketed (random
hyperplane) and IVF (centroid-probe) variants as the scale paths.

Scale design (100 TB / billions of vectors):
- Brute force: query side broadcast (queries ≪ corpus), corpus scanned once,
  per-group top-k heap via row_number — no global sort, no collect.
- Hyperplane LSH: signature is a 32-bit sign pattern; corpus bucketed by
  signature prefix, queries probe their own bucket (+ optional multi-probe) —
  turns O(N·Q) into O(bucket·Q).
- IVF: coarse centroids (deterministically sampled), corpus partitioned by
  nearest centroid; query probes nprobe nearest lists. Centroid table is
  broadcast; assignment is a map-side argmin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine_similarity, dot


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    query_id: str, k: int = 10, round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus → per-query heap."""
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    q = queries.select(F.col(query_id), as_double(F.col(vec_col)).alias("__qv"))
    sim = cosine_similarity(F.col("__cv"), F.col("__qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id, id_col, sim.alias("cos_sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hyperplane_signature(vec: Column, dim: int, bits: int = 16) -> Column:
    """Sign pattern against `bits` pseudo-random hyperplanes. The hyperplane
    matrix is derived deterministically from (bit, dim) via a hash — no RNG
    state to ship."""
    def plane(b: int) -> Column:
        comps = [
            F.element_at(vec, i + 1)
            * ((F.lit((hash((b, i)) % 2000) / 1000.0) - 1.0))
            for i in range(dim)
        ]
        s = comps[0]
        for c in comps[1:]:
            s = s + c
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))

    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig * 2 + plane(b)
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    query_id: str, dim: int, k: int = 10, bits: int = 12,
) -> DataFrame:
    """Approximate top-k: only compare vectors sharing the hyperplane-sign
    bucket. Recall grows with multi-probe (not implemented round 1)."""
    c = corpus.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__sig", hyperplane_signature(F.col("__cv"), dim, bits))
    q = queries.select(
        F.col(query_id),
        as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__sig", hyperplane_signature(F.col("__qv"), dim, bits))
    joined = c.join(F.broadcast(q), "__sig")
    scored = joined.select(
        query_id, id_col,
        cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_neardup(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact form: every (id_a < id_b)
    pair with round(cosine, round_to) >= threshold.

    This is the oracle baseline (quadratic — DuckDB-checkable at small sf).
    The scale path is ``embedding_neardup_lsh``: same output contract, but
    candidates come from banded hyperplane-LSH buckets so the pair join is
    bucket-local instead of all-pairs.
    """
    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"))
    sim = F.round(cosine_similarity(F.col("__va"), F.col("__vb")), round_to)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_bits(vec: Column, dim: int, bits: int = 16) -> Column:
    """Array of sign bits (0/1) against `bits` deterministic pseudo-random
    hyperplanes — the banded form of ``hyperplane_signature``."""
    def plane(b: int) -> Column:
        comps = [
            F.element_at(vec, i + 1)
            * ((F.lit((hash((b, i)) % 2000) / 1000.0) - 1.0))
            for i in range(dim)
        ]
        s = comps[0]
        for c in comps[1:]:
            s = s + c
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))

    return F.array(*[plane(b) for b in range(bits)])


def embedding_neardup_lsh(
    df: DataFrame, vec_col: str, id_col: str, dim: int,
    threshold: float = 0.4, bands: int = 4, rows_per_band: int = 4,
    round_to: int = 6, max_bucket: int = 10_000,
) -> DataFrame:
    """Banded hyperplane-LSH near-dup: vectors sharing ANY band of sign bits
    become candidates; candidates get the exact cosine verify.

    Same output contract as ``embedding_neardup`` (recall < 1 by design —
    banding sets the recall/cost point: P(candidate) = 1-(1-p^r)^b where
    p = 1 - angle/pi). Scale shape mirrors MinHash LSH: the join key is
    (band_id, band_val) — a shuffle on buckets, never an all-pairs product;
    ``max_bucket`` caps degenerate buckets (e.g. all-zero vectors).
    """
    bits = bands * rows_per_band
    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v"))
    sig = v.withColumn("__bits", hyperplane_bits(F.col("__v"), dim, bits))
    banded = sig.select(
        id_col, "__v",
        F.posexplode(
            F.array(*[
                # pack the band's bits into one int join key
                F.aggregate(
                    F.slice("__bits", b * rows_per_band + 1, rows_per_band),
                    F.lit(0), lambda acc, x: acc * 2 + x,
                )
                for b in range(bands)
            ])
        ).alias("band_id", "band_val"),
    )
    sized = banded.withColumn(
        "__bs", F.count("*").over(Window.partitionBy("band_id", "band_val"))
    ).filter(F.col("__bs") <= max_bucket).drop("__bs")
    a = sized.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"),
        "band_id", "band_val",
    )
    b = sized.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"),
        "band_id", "band_val",
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.round(cosine_similarity(F.col("__va"), F.col("__vb")), round_to)
    return (
        cand.select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    query_id: str, k: int = 10, n_centroids: int = 16, nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: assign corpus to coarse centroids once, then
    each query searches only its nprobe nearest inverted lists.

    Scale shape: centroid table broadcast (tiny); corpus assignment is one
    map-side argmin (no shuffle); the probe join keys on centroid_id so a
    query touches nprobe/n_centroids of the corpus.
    """
    assigned, cents = ivf_assign(corpus, vec_col, id_col, n_centroids)
    q = queries.select(F.col(query_id), as_double(F.col(vec_col)).alias("__qv"))
    # nprobe nearest centroids per query
    qc = q.crossJoin(F.broadcast(cents)).select(
        query_id, "__qv", "centroid_id",
        cosine_similarity(F.col("__qv"), F.col("__cent")).alias("__cs"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.desc("__cs"), F.col("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, "__qv", "centroid_id")
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        query_id, id_col,
        cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_assign(corpus: DataFrame, vec_col: str, id_col: str,
               n_centroids: int = 16, sample_stride: int = 37) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: centroids = deterministic sample of corpus rows
    (id % stride pattern), assignment = argmax cosine against the broadcast
    centroid table. Returns (assigned_corpus, centroids)."""
    cents = (
        corpus.filter((F.col(id_col) % sample_stride) == 0)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("__cent"),
        )
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    scored = c.crossJoin(F.broadcast(cents)).select(
        id_col, "__cv", "centroid_id",
        cosine_similarity(F.col("__cv"), F.col("__cent")).alias("__cs"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cs"), F.col("centroid_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "__cv", "centroid_id")
    )
    return assigned, cents
