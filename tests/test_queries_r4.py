"""Tests for the round-4 widening queries (queries_r4.py).

Oracle parity for these runs in tests/test_oracle_parity.py /
scripts/check_parity.py like every oracled query; here we pin the
properties the DuckDB hash check can NOT see: physical plan shapes
(no-shuffle sampling, broadcast prefilter), algebraic equivalence of the
scalable forms to their quadratic definitions, and agreement of the
fixed-point covariance with numpy float math.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gan_deeplearning4j_spark.queries import REGISTRY


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_priority_sample_is_shuffle_free_topk(spark, sf_dir):
    df = REGISTRY["priority_sample_topk"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # local top-k per partition, driver merge
    pdf = df.toPandas()
    assert len(pdf) == 200
    # priorities are the sample's sort key and strictly positive
    assert (pdf["priority"] > 0).all()
    assert list(pdf["priority"]) == sorted(pdf["priority"], reverse=True)


def test_skyline_matches_quadratic_definition(spark, sf_dir):
    sky = REGISTRY["skyline_parts"].fn(spark, sf_dir).toPandas()
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100, 0)
            .cast("long")
            .alias("price_c"),
            F.col("p_size").cast("long").alias("p_size"),
        )
        .toPandas()
    )
    pts = p[["price_c", "p_size"]].to_numpy()
    dominated = np.zeros(len(p), dtype=bool)
    for k, (pr, sz) in enumerate(pts):
        dom = (
            (pts[:, 0] <= pr)
            & (pts[:, 1] >= sz)
            & ((pts[:, 0] < pr) | (pts[:, 1] > sz))
        )
        dominated[k] = dom.any()
    expect = set(p.loc[~dominated, "p_partkey"])
    assert set(sky["p_partkey"]) == expect
    assert len(sky) == len(expect)


def test_skyline_prefilter_is_broadcast(spark, sf_dir):
    plan = _plan(REGISTRY["skyline_parts"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # bucket-bound join never shuffles part


def test_scd2_islands_cover_stream_and_nest(spark, sf_dir):
    df = REGISTRY["scd2_user_state"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # islands partition the stream: per-user event counts add up
    per_user = df.groupby("user_id")["n_events"].sum()
    expect = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    assert per_user.sort_index().equals(expect.sort_index().astype(per_user.dtype))
    # intervals nest: valid_to of island k == valid_from of island k+1
    for _, g in df.sort_values(["user_id", "island"]).groupby("user_id"):
        froms = g["valid_from_us"].to_numpy()
        tos = g["valid_to_us"].to_numpy()
        assert (tos[:-1] == froms[1:]).all()
        assert tos[-1] == -1
        # islands really are maximal runs: adjacent islands change type
        types = g["event_type"].to_numpy()
        assert (types[:-1] != types[1:]).all()


def test_segment_bitmask_single_shuffle_per_agg(spark, sf_dir):
    df = REGISTRY["segment_bitmask_counts"].fn(spark, sf_dir)
    pdf = df.toPandas()
    assert (pdf["mask"] > 0).all() and (pdf["mask"] < 32).all()
    # n_types is the popcount of the mask
    assert (
        pdf["n_types"] == pdf["mask"].map(lambda m: bin(int(m)).count("1"))
    ).all()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert pdf["n_users"].sum() == ev.select("user_id").distinct().count()


def test_zscore_outliers_match_float_definition(spark, sf_dir):
    out = (
        REGISTRY["zscore_outlier_counts"].fn(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        mu, sd = g["c"].mean(), g["c"].std(ddof=0)
        n_float = int((abs(g["c"] - mu) > 2 * sd).sum())
        assert out.loc[et, "n"] == len(g)
        # exact integer test equals the float definition away from ties
        assert abs(int(out.loc[et, "n_outliers"]) - n_float) <= 1


def test_covariance_pairs_match_numpy(spark, sf_dir):
    out = REGISTRY["covariance_pairs_exact"].fn(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    X = np.stack(emb["embedding"].to_numpy())[:, :8].astype("float64")
    Xq = np.floor(X * 1048576)  # the same fixed-point grid
    cov = np.cov(Xq.T, bias=True) / 1099511627776.0
    for _, r in out.iterrows():
        got = r["cov_ppb"] / 1e9
        want = cov[int(r["i"]), int(r["j"])]
        assert abs(got - want) < 2e-9


def test_covariance_is_single_aggregate(spark, sf_dir):
    plan = _plan(REGISTRY["covariance_pairs_exact"].fn(spark, sf_dir))
    # one partial + one final aggregate; no join, no window
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_equi_depth_boundaries_are_percentile_disc(spark, sf_dir):
    out = (
        REGISTRY["equi_depth_boundaries"].fn(spark, sf_dir)
        .toPandas()
        .set_index("o_orderpriority")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    o["price_c"] = (o["o_totalprice"] * 100).round().astype("int64")
    for pri, g in o.groupby("o_orderpriority"):
        v = np.sort(g["price_c"].to_numpy())
        n = len(v)
        for q, col in ((0.25, "q25_c"), (0.5, "q50_c"), (0.75, "q75_c")):
            disc = v[int(np.ceil(q * n)) - 1]  # percentile_disc lower bound
            assert out.loc[pri, col] == disc, (pri, col)
        assert out.loc[pri, "n"] == n


def test_group_sample_k_stable_under_repartition(spark, sf_dir):
    base = REGISTRY["group_sample_k"].fn(spark, sf_dir).toPandas()
    # membership is a pure function of doc_id — layout can't change it
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    docs.createOrReplaceTempView("___tmp_docs")
    from gan_deeplearning4j_spark.functions.text import portable_hash60
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy(
        portable_hash60(F.col("doc_id").cast("string")), "doc_id"
    )
    again = (
        docs.select(
            "source", "doc_id",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .toPandas()
    )
    assert set(zip(base["source"], base["doc_id"])) == set(
        zip(again["source"], again["doc_id"])
    )
    assert (base.groupby("source").size() == 5).all()


def test_centroid_similarity_matches_numpy(spark, sf_dir):
    out = REGISTRY["centroid_similarity"].fn(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    Xq = np.floor(X * 1048576)
    labels = sorted(emb["label"].unique())
    cent = {
        lab: Xq[emb["label"].to_numpy() == lab].mean(axis=0) for lab in labels
    }
    for _, r in out.iterrows():
        want = float(cent[r["i"]] @ cent[r["j"]]) / 1099511627776.0
        got = r["dot_ppb"] / 1e9
        assert abs(got - want) < 2e-9, (r["i"], r["j"])
    # all unordered pairs present exactly once
    assert len(out) == len(labels) * (len(labels) - 1) // 2


def test_cms_estimates_dominate_exact_counts(spark, sf_dir):
    out = REGISTRY["cms_heavy_hitters"].fn(spark, sf_dir).toPandas()
    # CMS guarantee: estimate >= exact always (only over-counts on collision)
    assert (out["estimate"] >= out["exact"]).all()
    assert (out["overshoot"] == out["estimate"] - out["exact"]).all()
    # the sketch grid must stay fixed-size: d*w cells max
    from gan_deeplearning4j_spark.queries_r4 import _CMS_D, _CMS_W
    ev = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert _CMS_D * _CMS_W == 1024  # documented sketch footprint


def test_kneser_ney_matches_reference_formula(spark, sf_dir):
    out = REGISTRY["kneser_ney_bigram_lm"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    from collections import Counter, defaultdict
    c12 = Counter()
    for t in docs["text"]:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
    c1 = defaultdict(int)
    nf = defaultdict(int)
    npre = defaultdict(int)
    for (a, b), c in c12.items():
        c1[a] += c
        nf[a] += 1
        npre[b] += 1
    bt = len(c12)
    for _, r in out.iterrows():
        a, b, c = r["w1"], r["w2"], int(r["c12"])
        assert c12[(a, b)] == c and c >= 5
        want = (4 * c - 3) * 1000000 // (4 * c1[a]) + (
            (3 * nf[a] * 1000000) // (4 * c1[a])
        ) * npre[b] // bt
        assert int(r["p_kn_ppm"]) == want
        # a probability: positive, at most 1
        assert 0 < want <= 1000000


def test_running_balance_matches_pandas_fold(spark, sf_dir):
    out = (
        REGISTRY["running_balance_clamped"].fn(spark, sf_dir)
        .toPandas().set_index("user_id")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    ev["d"] = np.where(
        ev["event_type"].isin(["purchase", "signup"]), ev["c"], -ev["c"]
    )
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        bal = 0
        for d in g["d"]:
            bal = max(bal + int(d), 0)
        assert int(out.loc[uid, "balance_c"]) == bal
        assert int(out.loc[uid, "n_events"]) == len(g)
    # the clamp must actually bind somewhere, or the test proves nothing
    plain = ev.groupby("user_id")["d"].sum()
    assert (out["balance_c"].sort_index().to_numpy()
            != plain.sort_index().clip(lower=0).to_numpy()).any()


def test_kn_doc_surprisal_orders_quality(spark, sf_dir):
    out = REGISTRY["kn_doc_surprisal"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    # every doc with >= 1 bigram scores; surprisal is positive
    n_scorable = (docs["text"].str.count(" ") >= 1).sum()
    assert len(out) == n_scorable
    assert (out["total_surprisal_e6"] > 0).all()
    # mean = floor(total/n) exactly
    import math as _m
    assert all(
        int(r["mean_surprisal_e6"])
        == _m.floor(r["total_surprisal_e6"] / r["n_bigrams"])
        for _, r in out.iterrows()
    )


def test_seasonality_profile_covers_all_events(spark, sf_dir):
    out = REGISTRY["seasonality_profile"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert out["n"].sum() == ev.count()
    assert out["dow"].between(1, 7).all() and out["hod"].between(0, 23).all()
    assert len(out) <= 168
    # floor-div mean
    assert (out["mean_c"] == out["sum_c"] // out["n"]).all()


def test_seasonal_naive_backtest_matches_pandas(spark, sf_dir):
    out = (
        REGISTRY["seasonal_naive_backtest"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size().rename("n").reset_index()
    )
    import pandas as pd
    lag = daily.copy()
    lag["d"] = lag["d"] + pd.Timedelta(days=7)
    j = daily.merge(lag, on=["event_type", "d"], suffixes=("", "_prev"))
    for et, g in j.groupby("event_type"):
        err = (g["n"] - g["n_prev"]).abs()
        assert int(out.loc[et, "n_days"]) == len(g)
        assert int(out.loc[et, "sum_abs_err"]) == int(err.sum())
        assert int(out.loc[et, "mae_ppk"]) == int(err.sum()) * 1000 // len(g)


def test_chi_square_matches_float_formula(spark, sf_dir):
    out = REGISTRY["chi_square_independence"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    ct = docs.groupby(["source", "lang"]).size().unstack(fill_value=0)
    obs = ct.to_numpy().astype("float64")
    n = obs.sum()
    expect = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    mask = expect > 0
    chi2 = float((((obs - expect) ** 2 / expect)[mask]).sum())
    got = out["chi2_e6"].iloc[0] / 1e6
    # per-cell floor loses < n_cells * 1e-6 * N/ (R*C) ~ well under 0.01
    assert abs(got - chi2) < 0.01
    assert out["n"].iloc[0] == int(n)


def test_market_basket_lift_matches_definition(spark, sf_dir):
    out = REGISTRY["market_basket_lift"].fn(spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    b = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_baskets = b["l_orderkey"].nunique()
    c1 = b.groupby("l_partkey").size()
    from collections import Counter
    pair = Counter()
    for _, g in b.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"])
        for x in range(len(ps)):
            for y in range(x + 1, len(ps)):
                if ps[x] != ps[y]:
                    pair[(ps[x], ps[y])] += 1
    for _, r in out.iterrows():
        p1, p2, c12 = int(r["p1"]), int(r["p2"]), int(r["c12"])
        assert pair[(p1, p2)] == c12 and c12 >= 3
        assert int(r["conf_ppm"]) == c12 * 1000000 // c1[p1]
        assert int(r["lift_ppm"]) == (
            c12 * n_baskets * 1000000 // (c1[p1] * c1[p2])
        )


def test_gini_bounds_and_pandas_agreement(spark, sf_dir):
    out = (
        REGISTRY["gini_revenue_by_nation"].fn(spark, sf_dir)
        .toPandas().set_index("c_nationkey")
    )
    assert out["gini_ppm"].between(0, 1000000).all()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    rev = j.groupby(["c_nationkey", "o_custkey"])["cents"].sum().reset_index()
    for nk, g in rev.groupby("c_nationkey"):
        x = g.sort_values(["cents", "o_custkey"])["cents"].to_numpy()
        n = len(x)
        i = np.arange(1, n + 1, dtype=object)
        gini = (2 * int((i * x).sum()) - (n + 1) * int(x.sum())) * 1000000 // (
            n * int(x.sum())
        )
        assert int(out.loc[nk, "gini_ppm"]) == gini
        assert int(out.loc[nk, "n_customers"]) == n


def test_linear_attribution_credit_reconciles(spark, sf_dir):
    out = REGISTRY["linear_attribution"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    assert len(out) == (ev["event_type"] == "purchase").sum()
    # exact reconciliation: k * credit + residual == 1e6 for every purchase
    k = out["n_touches"].to_numpy()
    total = k * out["credit_ppm"].to_numpy() + out["residual_ppm"].to_numpy()
    assert (total == 1000000).all()
    assert (out.loc[out["n_touches"] == 0, "residual_ppm"] == 1000000).all()


def test_hamilton_allocation_reconciles_exactly(spark, sf_dir):
    out = REGISTRY["budget_allocation_hamilton"].fn(spark, sf_dir).toPandas()
    assert out["alloc_ppm"].sum() == 1000000  # the whole point
    # monotone: bigger revenue never gets a smaller allocation than a
    # strictly smaller revenue (Hamilton is rank-preserving)
    s = out.sort_values("x").reset_index(drop=True)
    assert (s["alloc_ppm"].diff().dropna() >= -1).all()
    # each allocation within 1 unit of the exact proportional share
    tot = out["x"].sum()
    for _, r in out.iterrows():
        exact = r["x"] * 1000000 / tot
        assert abs(r["alloc_ppm"] - exact) < 1


def test_session_pattern_match_replays_python_regex(spark, sf_dir):
    import re
    out = (
        REGISTRY["session_pattern_match"].fn(spark, sf_dir)
        .toPandas().set_index("user_id")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    sym = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        path = "".join(sym.get(t, "e") for t in g["event_type"])
        assert out.loc[uid, "n_events"] == len(path)
        assert out.loc[uid, "engaged_purchase"] == int(
            re.search("v[vc]*c[vc]*p", path) is not None
        )
        assert out.loc[uid, "quick_buys"] == len(re.findall("cp", path))


def test_ses_backtest_matches_python_fold(spark, sf_dir):
    out = (
        REGISTRY["ses_forecast_backtest"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size()
    )
    for et in out.index:
        xs = daily.loc[et].sort_index().to_list()
        lv, sae = xs[0], 0
        for x in xs[1:]:
            sae += abs(x - lv)
            lv = (x + 3 * lv) // 4
        assert int(out.loc[et, "level_final"]) == lv
        assert int(out.loc[et, "sum_abs_err"]) == sae
        assert int(out.loc[et, "mae_ppk"]) == sae * 1000 // (len(xs) - 1)


def test_winsorized_mean_is_robust_and_exact(spark, sf_dir):
    out = (
        REGISTRY["winsorized_mean_price"].fn(spark, sf_dir)
        .toPandas().set_index("o_orderpriority")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    o["c"] = (o["o_totalprice"] * 100).round().astype("int64")
    for pri, g in o.groupby("o_orderpriority"):
        v = np.sort(g["c"].to_numpy())
        n = len(v)
        lo = v[int(np.ceil(0.05 * n)) - 1]
        hi = v[int(np.ceil(0.95 * n)) - 1]
        assert out.loc[pri, "p05_c"] == lo and out.loc[pri, "p95_c"] == hi
        wm = int(np.clip(g["c"], lo, hi).sum()) // n
        assert int(out.loc[pri, "wmean_c"]) == wm
        # clamping must move the mean (tails exist in this data)
        assert wm != int(g["c"].sum()) // n


def test_benford_covers_all_orders(spark, sf_dir):
    out = REGISTRY["benford_first_digit"].fn(spark, sf_dir).toPandas()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert len(out) == 9
    assert out["n"].sum() == o.filter("o_totalprice > 0").count()
    assert (out["exp_ppm"].to_numpy() == np.array(
        [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
    )).all()
    assert (
        out["dev_ppm"] == (out["obs_ppm"] - out["exp_ppm"]).abs()
    ).all()


def test_max_concurrency_matches_brute_force(spark, sf_dir):
    out = (
        REGISTRY["max_concurrency_daily"].fn(spark, sf_dir)
        .toPandas().set_index("day")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["us"] = ev["ts"].astype("int64") // 1000
    ev = ev.sort_values(["user_id", "us", "event_id"])
    # rebuild sessions (30-min gap) in pandas
    iv = []
    for uid, g in ev.groupby("user_id"):
        start = prev = None
        for u in g["us"]:
            if start is None:
                start = prev = u
            elif u - prev > 1_800_000_000:
                iv.append((start, prev))
                start = prev = u
            else:
                prev = u
        iv.append((start, prev))
    # no session crosses a UTC day boundary in this data (plan assumption)
    for s, e in iv:
        assert s // 86_400_000_000 == e // 86_400_000_000
    # brute-force sweep per day
    from collections import defaultdict
    bydate = defaultdict(list)
    for s, e in iv:
        bydate[s // 86_400_000_000].append((s, e))
    for day, ivs in bydate.items():
        pts = sorted(
            [(s, 0, 1) for s, _ in ivs] + [(e + 1, 1, -1) for _, e in ivs]
        )
        live = best = 0
        for _, _, d in pts:
            live += d
            best = max(best, live)
        assert int(out.loc[day, "max_concurrent"]) == best


def test_emd_matches_numpy_cdf_integral(spark, sf_dir):
    out = REGISTRY["emd_drift_matrix"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    groups = {s: np.sort(g["n_chars"].to_numpy())
              for s, g in docs.groupby("source")}
    import itertools
    checked = 0
    for (sa, va), (sb, vb) in itertools.combinations(
        sorted(groups.items()), 2
    ):
        vals = np.unique(np.concatenate([va, vb]))
        fa = np.searchsorted(va, vals, side="right") / len(va)
        fb = np.searchsorted(vb, vals, side="right") / len(vb)
        emd = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(vals)))
        row = out[(out["sa"] == sa) & (out["sb"] == sb)]
        assert len(row) == 1
        got = row["emd_milli"].iloc[0] / 1000
        assert abs(got - emd) < 1e-3 + 1e-9 * emd
        checked += 1
    assert checked == len(out)
    # identity sanity: EMD is symmetric-positive; zero only for identical
    assert (out["emd_milli"] >= 0).all()


def test_incremental_merge_equals_direct_aggregate(spark, sf_dir):
    out = (
        REGISTRY["incremental_agg_merge"].fn(spark, sf_dir)
        .toPandas().sort_values("o_orderpriority").reset_index(drop=True)
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    o["c"] = (o["o_totalprice"] * 100).round().astype("int64")
    direct = (
        o.groupby("o_orderpriority")["c"]
        .agg(n="count", sum_c="sum", min_c="min", max_c="max")
        .reset_index()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert (out["n"].to_numpy() == direct["n"].to_numpy()).all()
    assert (out["sum_c"].to_numpy() == direct["sum_c"].to_numpy()).all()
    assert (out["min_c"].to_numpy() == direct["min_c"].to_numpy()).all()
    assert (out["max_c"].to_numpy() == direct["max_c"].to_numpy()).all()


def test_ols_trend_matches_numpy(spark, sf_dir):
    out = (
        REGISTRY["ols_trend_daily"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(day=ev["ts"].astype("int64") // 1000 // 86_400_000_000)
        .groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    for et, g in daily.groupby("event_type"):
        x, y = g["day"].to_numpy("float64"), g["y"].to_numpy("float64")
        slope = np.polyfit(x, y, 1)[0]
        got = out.loc[et, "slope_ppm"] / 1e6
        assert abs(got - slope) < 2e-6, et
        assert out.loc[et, "n_days"] == len(g)


def test_mann_whitney_matches_brute_force(spark, sf_dir):
    out = REGISTRY["mann_whitney_u"].fn(spark, sf_dir).toPandas().iloc[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    a = docs.loc[docs["source"] == "src1", "n_chars"].to_numpy()
    b = docs.loc[docs["source"] == "src2", "n_chars"].to_numpy()
    # U = #(a>b) + 0.5*#(a==b); doubled: 2U
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    u2 = 2 * gt + eq
    assert int(out["u2_a"]) == u2
    assert int(out["u2_b"]) == 2 * len(a) * len(b) - u2
    assert int(out["auc_ppm"]) == u2 * 1000000 // (2 * len(a) * len(b))
    assert int(out["na"]) == len(a) and int(out["nb"]) == len(b)


def test_token_fertility_ratios_consistent(spark, sf_dir):
    out = REGISTRY["token_fertility_by_lang"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert out["n_docs"].sum() == len(docs)
    for _, r in out.iterrows():
        g = docs[docs["lang"] == r["lang"]]
        n_tok = g["text"].str.count(" ").sum() + len(g)
        n_chr = g["text"].str.len().sum()
        assert r["total_tokens"] == n_tok
        assert r["chars_per_token_ppk"] == n_chr * 1000 // n_tok
        assert r["tokens_per_kchar"] == n_tok * 1000 // n_chr


def test_ks_matches_numpy(spark, sf_dir):
    out = REGISTRY["ks_drift_matrix"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    groups = {s: np.sort(g["n_chars"].to_numpy())
              for s, g in docs.groupby("source")}
    import itertools
    for (sa, va), (sb, vb) in itertools.combinations(
        sorted(groups.items()), 2
    ):
        vals = np.unique(np.concatenate([va, vb]))
        fa = np.searchsorted(va, vals, side="right") / len(va)
        fb = np.searchsorted(vb, vals, side="right") / len(vb)
        ks = float(np.abs(fa - fb).max())
        row = out[(out["sa"] == sa) & (out["sb"] == sb)]
        got = row["ks_ppm"].iloc[0] / 1e6
        assert abs(got - ks) < 1e-6 + 1e-9


def test_bloom_guarantees(spark, sf_dir):
    out = REGISTRY["bloom_membership_check"].fn(spark, sf_dir).toPandas().iloc[0]
    # the defining guarantee: no false negatives, ever
    assert out["n_false_negative"] == 0
    assert out["n_maybe"] >= out["n_actual"]
    # and it actually filters: FP rate under 50% at this load factor
    negatives = out["n_probes"] - out["n_actual"]
    if negatives:
        assert out["n_false_positive"] / negatives < 0.5


def test_naive_bayes_learns_training_distribution(spark, sf_dir):
    out = REGISTRY["naive_bayes_confusion"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert out["n_docs"].sum() == len(docs)
    acc = out.loc[out["lang"] == out["predicted"], "n_docs"].sum() / len(docs)
    majority = docs["lang"].value_counts().iloc[0] / len(docs)
    # training-set accuracy must beat the majority-class baseline
    assert acc > majority, (acc, majority)


def test_join_skew_profile_matches_pandas(spark, sf_dir):
    out = REGISTRY["join_skew_profile"].fn(spark, sf_dir).toPandas().iloc[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    c = li.groupby("l_suppkey").size().sort_values().to_numpy()
    n = len(c)
    assert out["n_keys"] == n and out["n_rows"] == c.sum()
    assert out["max_rows_per_key"] == c.max()
    assert out["p50_rows_per_key"] == c[int(np.ceil(0.5 * n)) - 1]
    assert out["p99_rows_per_key"] == c[int(np.ceil(0.99 * n)) - 1]
    assert out["skew_ratio_ppk"] == int(c.max()) * n * 1000 // int(c.sum())


def test_conversion_latency_matches_pandas(spark, sf_dir):
    out = (
        REGISTRY["conversion_latency_quartiles"].fn(spark, sf_dir)
        .toPandas().iloc[0]
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["us"] = ev["ts"].astype("int64") // 1000
    fv = ev[ev["event_type"] == "view"].groupby("user_id")["us"].min()
    fp = ev[ev["event_type"] == "purchase"].groupby("user_id")["us"].min()
    j = fv.to_frame("v").join(fp.to_frame("p"), how="inner")
    lat = np.sort(((j["p"] - j["v"]) // 1_000_000)[j["p"] >= j["v"]].to_numpy())
    n = len(lat)
    assert out["n_converted"] == n
    for q, col in ((0.25, "q25_s"), (0.5, "q50_s"), (0.75, "q75_s")):
        assert out[col] == lat[int(np.ceil(q * n)) - 1]


def test_phrase_search_matches_python(spark, sf_dir):
    out = (
        REGISTRY["phrase_search_positional"].fn(spark, sf_dir)
        .toPandas().set_index("doc_id")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    found = {}
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        hits = [i + 1 for i, (x, y) in enumerate(zip(toks, toks[1:]))
                if x == "fast" and y == "table"]
        if hits:
            found[r["doc_id"]] = (len(hits), hits[0])
    assert set(out.index) == set(found)
    for d, (n, first) in found.items():
        assert out.loc[d, "n_occurrences"] == n
        assert out.loc[d, "first_pos"] == first


def test_mad_matches_numpy(spark, sf_dir):
    out = (
        REGISTRY["mad_robust_scale"].fn(spark, sf_dir)
        .toPandas().set_index("l_returnflag")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    li["x"] = (li["l_extendedprice"] * 100).round().astype("int64")
    for rf, g in li.groupby("l_returnflag"):
        v = np.sort(g["x"].to_numpy())
        med = v[int(np.ceil(0.5 * len(v))) - 1]  # percentile_disc lower
        d = np.sort(np.abs(g["x"].to_numpy() - med))
        mad = d[int(np.ceil(0.5 * len(d))) - 1]
        assert out.loc[rf, "med_c"] == med
        assert out.loc[rf, "mad_c"] == mad


def test_acf7_matches_numpy(spark, sf_dir):
    out = (
        REGISTRY["acf_daily_lag7"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size().rename("y").reset_index()
    )
    import pandas as pd
    lag = daily.copy()
    lag["d"] = lag["d"] + pd.Timedelta(days=7)
    j = daily.merge(lag, on=["event_type", "d"], suffixes=("", "_l"))
    for et, g in j.groupby("event_type"):
        r = np.corrcoef(g["y"], g["y_l"])[0, 1]
        got = out.loc[et, "acf7_ppm"] / 1e6
        assert abs(got - r) < 2e-6
        assert out.loc[et, "n_pairs"] == len(g)


def test_diversified_topk_plan_and_cap(spark, sf_dir):
    df = REGISTRY["diversified_topk"].fn(spark, sf_dir)
    plan = _plan(df)
    # per-group cap pushed to the map side; global top-k without a sort
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan
    pdf = df.toPandas()
    assert len(pdf) == 100
    assert pdf.groupby("o_custkey").size().max() <= 3


def test_markov_rows_normalize(spark, sf_dir):
    out = REGISTRY["markov_transition_matrix"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # transitions = events - users (each user contributes n_i - 1 pairs)
    n_trans = ev.count() - ev.select("user_id").distinct().count()
    assert out["n"].sum() == n_trans
    # ppm rows sum to <= 1e6 and within |types| of it (floor loss)
    rowsum = out.groupby("cur")["p_ppm"].sum()
    assert ((rowsum <= 1000000) & (rowsum > 1000000 - len(out))).all()


def test_cusum_equals_clamped_fold(spark, sf_dir):
    out = (
        REGISTRY["cusum_drift_alarms"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size()
    )
    for et in out.index:
        xs = daily.loc[et].sort_index().to_list()
        mu = sum(xs) // len(xs)
        s = maxs = alarms = 0
        for x in xs:
            s = max(0, s + (x - mu))       # the textbook recurrence
            maxs = max(maxs, s)
            alarms += int(s > mu)
        assert int(out.loc[et, "max_cusum"]) == maxs
        assert int(out.loc[et, "n_alarm_days"]) == alarms
        assert int(out.loc[et, "n_days"]) == len(xs)


def test_resample_linear_interpolates_exactly(spark, sf_dir):
    out = REGISTRY["events_resample_linear"].fn(spark, sf_dir).toPandas()
    # grid endpoints are known; interior gaps interpolate between neighbors
    assert (out["interpolated"].isin([0, 1])).all()
    got_interp = out[out["interpolated"] == 1]
    assert len(got_interp) > 0
    # spot-verify per user with pandas
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev[ev["user_id"] < 40]
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    ev["h"] = ev["ts"].astype("int64") // 1000 // 3_600_000_000
    hourly = ev.groupby(["user_id", "h"])["c"].sum()
    for uid in sorted(set(out["user_id"]))[:5]:
        known = hourly.loc[uid]
        sub = out[out["user_id"] == uid].sort_values("bar_us")
        hs = sub["bar_us"].to_numpy() // 3_600_000_000
        ks = np.sort(known.index.to_numpy())
        for h, v, flag in zip(hs, sub["value_c"], sub["interpolated"]):
            if flag == 0:
                assert v == known.loc[h]
            else:
                ph = ks[ks < h].max()
                nh = ks[ks > h].min()
                pv, nv = int(known.loc[ph]), int(known.loc[nh])
                want = (pv * (nh - h) + nv * (h - ph)) // (nh - ph)
                assert v == want


def test_quantile_mapping_matches_inverse_cdf(spark, sf_dir):
    out = (
        REGISTRY["quantile_mapping_calibration"].fn(spark, sf_dir)
        .toPandas().set_index("v")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    a = np.sort(docs.loc[docs["source"] == "src1", "n_chars"].to_numpy())
    b = np.sort(docs.loc[docs["source"] == "src2", "n_chars"].to_numpy())
    for v in np.unique(b):
        # fraction of src2 <= v, then smallest src1 value at >= that CDF.
        # Integer ceil: float q*len(a) can land one ulp above an exact
        # integer and shift the index (the bug class this engine's
        # cross-multiplied integer keys exist to avoid)
        kb = int(np.searchsorted(b, v, side="right"))
        idx = -(-kb * len(a) // len(b)) - 1
        assert out.loc[v, "mapped_u"] == a[idx], v
    # mapping is monotone non-decreasing
    m = out.sort_index()["mapped_u"].to_numpy()
    assert (np.diff(m) >= 0).all()


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """Unbounded-full-vocabulary training pin (kept after the rows-only
    registry entry `bpe_train_merges` was retired in r9: the hash-grade
    twin trains on a bounded top-60 vocab, so this test is what still
    exercises the whole-corpus vocabulary path)."""
    from gan_deeplearning4j_spark.operators.bpe import train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, _ = train_bpe(spark, docs, n_merges=10)
    out = [(int(r), l, rr, int(c)) for r, l, rr, c in merges]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    from collections import Counter
    words = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                words[w] += 1
    sym = {w: list(w) for w in words}
    ref = []
    for rank in range(10):
        pc = Counter()
        for w, f in words.items():
            s = sym[w]
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        (l, r), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        ref.append((rank, l, r, c))
        for w in sym:
            s, acc, pend = sym[w], [], None
            for ch in s:
                if pend is not None and pend == l and ch == r:
                    acc.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        acc.append(pend)
                    pend = ch
            if pend is not None:
                acc.append(pend)
            sym[w] = acc
    assert out == ref


def test_bpe_tokenize_stats_match_python(spark, sf_dir):
    """Per-language fertility over the trainer's own final symbol table
    on the unbounded vocabulary (kept after the rows-only registry entry
    `bpe_tokenize_stats` was retired in r9; the hash-grade twin
    `bpe_tokenize_fertility_fixed` covers the real apply_bpe path under
    a DuckDB oracle, this pins the trainer-syms variant)."""
    from gan_deeplearning4j_spark.operators.bpe import train_bpe

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, syms = train_bpe(spark, docs_df, n_merges=10)
    vocab = syms.select("word", F.size("syms").alias("n_sub"))
    wl = docs_df.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    out = (
        wl.join(F.broadcast(vocab), "word")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .select(
            "lang", "n_words", "n_subwords",
            F.expr("n_subwords * 1000 div n_words").alias(
                "subwords_per_word_ppk"
            ),
        )
        .toPandas().set_index("lang")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    from collections import Counter
    words = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                words[w] += 1
    sym = {w: list(w) for w in words}
    for _ in range(10):
        pc = Counter()
        for w, f in words.items():
            s = sym[w]
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        (l, r), _c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w in sym:
            s, acc, pend = sym[w], [], None
            for ch in s:
                if pend is not None and pend == l and ch == r:
                    acc.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        acc.append(pend)
                    pend = ch
            if pend is not None:
                acc.append(pend)
            sym[w] = acc
    nsub = {w: len(s) for w, s in sym.items()}
    for lang, g in docs.groupby("lang"):
        n_words = n_subwords = 0
        for t in g["text"]:
            for w in t.split(" "):
                if w:
                    n_words += 1
                    n_subwords += nsub[w]
        assert int(out.loc[lang, "n_words"]) == n_words
        assert int(out.loc[lang, "n_subwords"]) == n_subwords
        assert int(out.loc[lang, "subwords_per_word_ppk"]) == (
            n_subwords * 1000 // n_words
        )


def test_bpe_driver_finish_matches_distributed(spark, sf_dir):
    """The driver-side finish (collect-once when the type table is small)
    must be byte-identical to the distributed Catalyst-fold rounds — same
    merge table, same final symbolized vocabulary."""
    from gan_deeplearning4j_spark.operators.bpe import train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    m_local, syms_local = train_bpe(spark, docs, n_merges=6)
    m_dist, syms_dist = train_bpe(
        spark, docs, n_merges=6, driver_finish_rows=0
    )
    assert m_local == m_dist
    a = sorted(
        (r["word"], r["freq"], tuple(r["syms"]))
        for r in syms_local.collect()
    )
    b = sorted(
        (r["word"], r["freq"], tuple(r["syms"]))
        for r in syms_dist.collect()
    )
    assert a == b


def test_bpe_control_char_corpus(spark):
    """Corpus tokens containing \\x01 (the old in-band pair delimiter)
    must train correctly on both paths — the pair is carried as a
    struct<l,r>, never re-parsed from a delimited string."""
    from gan_deeplearning4j_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        [("a\x01b a\x01b a\x01b xy xy",), ("xy a\x01b qq\x01 qq\x01",)],
        "text string",
    )
    m_dist, _ = train_bpe(spark, docs, n_merges=3, driver_finish_rows=0)
    m_local, _ = train_bpe(spark, docs, n_merges=3)
    assert m_dist == m_local
    # ('a','\x01') and ('\x01','b') tie at count 4; the (left, right)
    # ascending tie-break picks ('\x01','b') — '\x01' sorts below 'a'
    assert m_dist[0][1:] == ("\x01", "b", 4)


def test_anova_f_close_to_scipy_formula(spark, sf_dir):
    out = REGISTRY["anova_f_oneway"].fn(spark, sf_dir).toPandas().iloc[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    groups = [g["n_chars"].to_numpy("float64")
              for _, g in docs.groupby("source")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    mean = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - mean) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = out["f_ppm"] / 1e6
    # milli-scaled per-group floors keep relative error ~1e-6
    assert abs(got - f) / f < 1e-5
    assert out["n"] == n and out["k"] == k


def test_haar_energy_matches_numpy(spark, sf_dir):
    out = (
        REGISTRY["haar_energy_daily"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 1000 // 86_400_000_000
    d0 = ev["day"].min()
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day").size()
        # dense series over observed day indexes (absent day = 0)
        idx = daily.index.to_numpy() - d0
        y = np.zeros(idx.max() + 1, dtype="int64")
        y[idx] = daily.to_numpy()
        energies = []
        cur = y
        for _ in range(3):
            if len(cur) % 2:
                cur = np.append(cur, 0)
            a, b = cur[0::2], cur[1::2]
            energies.append(int(((a - b) ** 2).sum()))
            cur = a + b
        assert int(out.loc[et, "e1"]) == energies[0]
        assert int(out.loc[et, "e2"]) == energies[1]
        assert int(out.loc[et, "e3"]) == energies[2]


def test_runs_test_matches_python(spark, sf_dir):
    out = (
        REGISTRY["runs_test_randomness"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size()
    )
    for et in out.index:
        y = daily.loc[et].sort_index().to_numpy()
        v = np.sort(y)
        med = v[int(np.ceil(0.5 * len(v))) - 1]
        above = (y > med).astype(int)
        runs = 1 + int((above[1:] != above[:-1]).sum())
        assert int(out.loc[et, "n_days"]) == len(y)
        assert int(out.loc[et, "n_above"]) == int(above.sum())
        assert int(out.loc[et, "n_runs"]) == runs


def test_ccf_symmetry_with_acf_discipline(spark, sf_dir):
    out = REGISTRY["ccf_lead_lag"].fn(spark, sf_dir).toPandas()
    assert len(out) == 15
    assert set(out["lag"]) == set(range(-7, 8))
    # replay lag 0 and one nonzero lag in pandas
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size().rename("y").reset_index()
    )
    import pandas as pd
    a = daily[daily["event_type"] == "click"][["d", "y"]]
    b = daily[daily["event_type"] == "purchase"][["d", "y"]]
    for lag in (0, 3, -5):
        bb = b.copy()
        bb["d"] = bb["d"] - pd.Timedelta(days=lag)
        j = a.merge(bb, on="d", suffixes=("_x", "_z"))
        r = np.corrcoef(j["y_x"], j["y_z"])[0, 1]
        row = out[out["lag"] == lag].iloc[0]
        assert abs(row["ccf_ppm"] / 1e6 - r) < 2e-6
        assert row["n_pairs"] == len(j)


def test_datacard_fields_consistent(spark, sf_dir):
    out = REGISTRY["dataset_datacard"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert out["n_docs"].sum() == len(docs)
    for _, r in out.iterrows():
        g = docs[docs["source"] == r["source"]]
        assert r["total_chars"] == g["n_chars"].sum()
        v = np.sort(g["n_chars"].to_numpy())
        assert r["median_chars"] == v[int(np.ceil(0.5 * len(v))) - 1]
        uniq = g["text"].str.strip().str.lower().nunique()
        assert r["dup_rate_ppm"] == (len(g) - uniq) * 1000000 // len(g)
        top = g["lang"].value_counts()
        # ties broken by lang name ascending
        best = min(
            top.items(), key=lambda kv: (-kv[1], kv[0])
        )
        assert r["top_lang"] == best[0]
        assert r["top_lang_ppm"] == best[1] * 1000000 // len(g)


def test_trending_movers_semantics(spark, sf_dir):
    out = REGISTRY["trending_movers"].fn(spark, sf_dir).toPandas()
    assert len(out) <= 40
    assert set(out["status"]) <= {"entered", "dropped", "moved"}
    assert (out.loc[out["status"] == "entered", "n_first"] >= 0).all()
    # entered rows have rank_delta = 21 - r2 > 0; dropped have < 0
    assert (out.loc[out["status"] == "entered", "rank_delta"] > 0).all()
    assert (out.loc[out["status"] == "dropped", "rank_delta"] < 0).all()


def test_hierarchical_share_reconciles(spark, sf_dir):
    out = REGISTRY["hierarchical_share"].fn(spark, sf_dir).toPandas()
    # per-region shares sum to ~1e6 (floor loss < nations per region)
    for region, g in out.groupby("region"):
        s = g["share_of_region_ppm"].sum()
        assert 1000000 - len(g) < s <= 1000000
        assert g["region_share_ppm"].nunique() == 1
    # region shares sum to ~1e6
    rs = out.drop_duplicates("region")["region_share_ppm"].sum()
    assert 1000000 - 5 < rs <= 1000000


def test_discounted_ltv_bounds_and_exactness(spark, sf_dir):
    out = REGISTRY["discounted_cohort_ltv"].fn(spark, sf_dir).toPandas()
    assert (out["disc_ltv_c"] <= out["raw_ltv_c"]).all()
    # replay in python
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["wk"] = ev["ts"].astype("int64") // 1000 // 604_800_000_000
    w0 = ev.groupby("user_id")["wk"].min()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["c"] = (p["value"] * 100).round().astype("int64")
    p["w0"] = p["user_id"].map(w0)
    p["k"] = p["wk"] - p["w0"]
    byk = p.groupby(["w0", "k"])["c"].sum()
    for cw, g in byk.groupby(level=0):
        raw = int(g.sum())
        disc = sum(
            int(v) * 9 ** int(k) // 10 ** int(k)
            for (_, k), v in g.items()
        )
        row = out[out["cohort_week"] == cw].iloc[0]
        assert row["raw_ltv_c"] == raw and row["disc_ltv_c"] == disc


def test_sprt_matches_python_walk(spark, sf_dir):
    out = (
        REGISTRY["sprt_purchase_rate"].fn(spark, sf_dir)
        .toPandas().set_index("user_id")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev[ev["event_type"].isin(["purchase", "click"])]
    UP, DN, B = 182321, -223144, 2944438
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        s = 0
        decided_at, decision = -1, "continue"
        for i, et in enumerate(g["event_type"], start=1):
            s += UP if et == "purchase" else DN
            if decided_at == -1 and (s >= B or s <= -B):
                decided_at = i
                decision = "accept_h1" if s >= B else "accept_h0"
        assert int(out.loc[uid, "n_obs"]) == len(g)
        assert int(out.loc[uid, "decided_at"]) == decided_at, uid
        assert out.loc[uid, "decision"] == decision, uid


def test_lpa_differs_from_connected_components(spark, sf_dir):
    out = REGISTRY["lpa_communities"].fn(spark, sf_dir).toPandas()
    # sizes positive, communities labeled by member node ids
    assert (out["n_members"] >= 1).all()
    # python replay of 3 synchronous rounds
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    b = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter, defaultdict
    pair = Counter()
    for _, g in b.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    adj = defaultdict(list)
    for (u, v), w in pair.items():
        if w >= 2:
            adj[u].append(v)
            adj[v].append(u)
    lbl = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n in adj:
            cnt = Counter(lbl[m] for m in adj[n])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        lbl = new
    sizes = Counter(lbl.values())
    want = sorted(
        ((c, n) for c, n in sizes.items()),
        key=lambda cn: (-cn[1], cn[0]),
    )[:50]
    got = list(zip(out["community"], out["n_members"]))
    assert got == want


def _copurchase_graph(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    b = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter, defaultdict
    pair = Counter()
    for _, g in b.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (u, v), w in pair.items():
        if w >= 2:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def test_clustering_coefficient_matches_python(spark, sf_dir):
    out = (
        REGISTRY["clustering_coefficient"].fn(spark, sf_dir)
        .toPandas().set_index("node")
    )
    adj = _copurchase_graph(spark, sf_dir)
    rows = []
    for n, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        nl = sorted(nbrs)
        t = sum(
            1
            for i in range(len(nl))
            for j in range(i + 1, len(nl))
            if nl[j] in adj[nl[i]]
        )
        rows.append((n, d, t, t * 2000000 // (d * (d - 1))))
    want = sorted(rows, key=lambda r: (-r[3], r[0]))[:50]
    got = [
        (n, int(r["degree"]), int(r["n_triangles"]), int(r["clustering_ppm"]))
        for n, r in out.iterrows()
    ]
    assert got == want


def test_assortativity_matches_numpy(spark, sf_dir):
    out = REGISTRY["degree_assortativity"].fn(spark, sf_dir).toPandas().iloc[0]
    adj = _copurchase_graph(spark, sf_dir)
    xs, zs = [], []
    for u, nbrs in adj.items():
        for v in nbrs:
            xs.append(len(adj[u]))
            zs.append(len(adj[v]))
    r = np.corrcoef(xs, zs)[0, 1]
    assert out["n_directed_edges"] == len(xs)
    assert abs(out["assortativity_ppm"] / 1e6 - r) < 2e-6


def test_langid_eval_identities(spark, sf_dir):
    out = REGISTRY["langid_eval_metrics"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out["support"].sum() == docs.count()
    for _, r in out.iterrows():
        assert r["tp"] <= min(r["support"], max(r["pred_n"], r["tp"]))
        if r["pred_n"]:
            assert r["precision_ppm"] == r["tp"] * 1000000 // r["pred_n"]
        assert r["recall_ppm"] == r["tp"] * 1000000 // r["support"]
        assert r["f1_ppm"] == r["tp"] * 2000000 // (
            r["pred_n"] + r["support"]
        )


def test_dedup_shift_bounds(spark, sf_dir):
    out = REGISTRY["dedup_distribution_shift"].fn(spark, sf_dir).toPandas().iloc[0]
    assert out["n_after"] <= out["n_before"]
    assert out["emd_milli"] >= 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    uniq = docs["text"].str.strip().str.lower().nunique()
    assert out["n_after"] == uniq


def test_filter_impact_reconciles(spark, sf_dir):
    out = REGISTRY["filter_impact_report"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out["n_docs"].sum() == docs.count()
    s = out["doc_share_ppm"].sum()
    assert 1000000 - len(out) < s <= 1000000
    cs = out["char_share_ppm"].sum()
    assert 1000000 - len(out) < cs <= 1000000


def test_kaplan_meier_matches_lifelines_style_python(spark, sf_dir):
    out = REGISTRY["kaplan_meier_survival"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["us"] = ev["ts"].astype("int64") // 1000
    first = ev.groupby("user_id")["us"].min()
    buys = ev[ev["event_type"] == "purchase"].groupby("user_id")["us"].min()
    h = ev["us"].max()
    lifes = []
    for uid, f0 in first.items():
        if uid in buys.index:
            lifes.append(((buys[uid] - f0) // 86_400_000_000, 1))
        else:
            lifes.append(((h - f0) // 86_400_000_000, 0))
    from collections import Counter
    d_at = Counter()
    rem_at = Counter()
    for t, died in lifes:
        rem_at[t] += 1
        if died:
            d_at[t] += 1
    n = len(lifes)
    s = 1000000
    removed = 0
    want = []
    for t in sorted(rem_at):
        at_risk = n - removed
        if d_at[t] > 0:
            s = s * (at_risk - d_at[t]) // at_risk
            want.append((t, d_at[t], at_risk, s))
        removed += rem_at[t]
    got = [
        (int(r["t_days"]), int(r["d"]), int(r["n_at_risk"]), int(r["s_ppm"]))
        for _, r in out.iterrows()
    ]
    assert got == want
    # survival is non-increasing and within [0, 1e6]
    sv = out["s_ppm"].to_numpy()
    assert (np.diff(sv) <= 0).all() and sv.max() <= 1000000


def test_simpson_diversity_bounds(spark, sf_dir):
    out = REGISTRY["simpson_diversity"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert out["n_docs"].sum() == len(docs)
    assert out["simpson_ppm"].between(0, 1000000).all()
    for _, r in out.iterrows():
        g = docs[docs["source"] == r["source"]]["lang"].value_counts()
        N = g.sum()
        D = sum(int(x) * (int(x) - 1) for x in g) * 1000000 // (N * (N - 1))
        assert r["simpson_ppm"] == D and r["n_langs"] == len(g)


def test_frequent_triples_match_python(spark, sf_dir):
    out = REGISTRY["frequent_triples"].fn(spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    b = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter
    import itertools
    tri = Counter()
    for _, g in b.groupby("l_orderkey"):
        for t in itertools.combinations(sorted(set(g["l_partkey"])), 3):
            tri[t] += 1
    want = sorted(
        ((t, c) for t, c in tri.items() if c >= 2),
        key=lambda tc: (-tc[1], tc[0]),
    )[:50]
    got = [
        ((int(r["p1"]), int(r["p2"]), int(r["p3"])), int(r["support"]))
        for _, r in out.iterrows()
    ]
    assert got == want


def test_holt_matches_python_fold(spark, sf_dir):
    out = (
        REGISTRY["holt_forecast_backtest"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.floor("D"))
        .groupby(["event_type", "d"]).size()
    )
    for et in out.index:
        xs = daily.loc[et].sort_index().to_list()
        def tdiv(a, b):  # truncation toward zero == Spark div / DuckDB //
            return -((-a) // b) if a < 0 else a // b

        lv, tr, sae = xs[0], 0, 0
        for x in xs[1:]:
            fc = lv + tr
            sae += abs(x - fc)
            new_lv = tdiv(x + 3 * fc, 4)
            new_tr = tdiv((x - lv) + 3 * tr, 4)
            lv, tr = new_lv, new_tr
        assert int(out.loc[et, "level_final"]) == lv
        assert int(out.loc[et, "trend_final"]) == tr
        assert int(out.loc[et, "sum_abs_err"]) == sae
        assert int(out.loc[et, "mae_ppk"]) == sae * 1000 // (len(xs) - 1)


def test_wilson_ci_brackets_point_estimate(spark, sf_dir):
    out = REGISTRY["wilson_ci_purchase_share"].fn(spark, sf_dir).toPandas()
    assert (out["lo_ppm"] <= out["p_ppm"]).all()
    assert (out["hi_ppm"] >= out["p_ppm"] - 1).all()
    assert (out["lo_ppm"] >= 0).all() and (out["hi_ppm"] <= 1000000).all()
    # spot check one row against the formula
    import math as _m
    r = out.iloc[0]
    x, n = float(r["x"]), float(r["n"])
    z = 1.96
    lo = (x + z*z/2 - z*_m.sqrt(x*(n-x)/n + z*z/4)) / (n + z*z)
    assert abs(r["lo_ppm"] / 1e6 - lo) < 2e-6


def test_lorenz_curve_properties(spark, sf_dir):
    out = REGISTRY["lorenz_concentration"].fn(spark, sf_dir).toPandas()
    assert len(out) == 10
    # monotone increasing to exactly 1e6 at the full population
    shares = out.sort_values("top_decile")["revenue_share_ppm"].to_numpy()
    assert (np.diff(shares) >= 0).all()
    assert shares[-1] == 1000000
    # concave: top deciles contribute disproportionately
    assert shares[0] >= 100000  # top 10% hold at least 10%
    # pandas replay of decile boundaries
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    o["c"] = (o["o_totalprice"] * 100).round().astype("int64")
    rev = o.groupby("o_custkey")["c"].sum().sort_values(ascending=False)
    n, tot = len(rev), int(rev.sum())
    cx = rev.cumsum().to_numpy()
    for _, r in out.iterrows():
        k = max(i + 1 for i in range(n) if (i + 1) * 10 <= n * r["top_decile"])
        assert r["n_customers"] == k
        assert r["revenue_share_ppm"] == int(cx[k - 1]) * 1000000 // tot


def test_vocab_growth_matches_prefix_distincts(spark, sf_dir):
    out = (
        REGISTRY["vocab_growth_curve"].fn(spark, sf_dir)
        .toPandas().set_index("decile")
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .toPandas().sort_values("doc_id")
    )
    nd = len(docs)
    for dec in range(1, 11):
        cutoff = nd * dec // 10
        prefix = docs[docs["doc_id"] <= cutoff]
        vocab = set()
        n_tok = 0
        for t in prefix["text"]:
            ws = t.split(" ")
            n_tok += len(ws)
            vocab.update(ws)
        assert int(out.loc[dec, "vocab_size"]) == len(vocab)
        assert int(out.loc[dec, "n_tokens"]) == n_tok
    # sub-linear growth: vocabulary grows slower than tokens
    v = out.sort_index()
    assert v["vocab_size"].iloc[-1] < v["n_tokens"].iloc[-1]


def test_audience_overlap_matches_sets(spark, sf_dir):
    out = REGISTRY["audience_overlap_matrix"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    segs = {
        t: set(g["user_id"]) for t, g in ev.groupby("event_type")
    }
    import itertools
    for ta, tb in itertools.combinations(sorted(segs), 2):
        both = len(segs[ta] & segs[tb])
        row = out[(out["ta"] == ta) & (out["tb"] == tb)]
        if both == 0:
            assert row.empty
            continue
        r = row.iloc[0]
        union = len(segs[ta] | segs[tb])
        assert r["n_both"] == both
        assert r["n_a"] == len(segs[ta]) and r["n_b"] == len(segs[tb])
        assert r["jaccard_ppm"] == both * 1000000 // union


def test_peak_load_matches_pandas(spark, sf_dir):
    out = REGISTRY["events_peak_load"].fn(spark, sf_dir).toPandas().iloc[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    m = (ev["ts"].astype("int64") // 1000 // 60_000_000).value_counts()
    v = np.sort(m.to_numpy())
    assert out["n_active_minutes"] == len(m)
    assert out["peak_epm"] == v.max()
    assert out["p50_epm"] == v[int(np.ceil(0.5 * len(v))) - 1]
    assert out["p99_epm"] == v[int(np.ceil(0.99 * len(v))) - 1]


def test_repeat_purchase_interval_matches_pandas(spark, sf_dir):
    out = (
        REGISTRY["repeat_purchase_interval"].fn(spark, sf_dir)
        .toPandas().iloc[0]
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["us"] = p["ts"].astype("int64") // 1000
    gaps = []
    for _, g in p.sort_values(["us", "event_id"]).groupby("user_id"):
        us = g["us"].to_numpy()
        gaps.extend(((us[1:] - us[:-1]) // 3_600_000_000).tolist())
    v = np.sort(np.array(gaps))
    assert out["n_gaps"] == len(v)
    for q, col in ((0.25, "q25_h"), (0.5, "q50_h"), (0.75, "q75_h")):
        assert out[col] == v[int(np.ceil(q * len(v))) - 1]


def test_warehouse_digest_detects_any_change(spark, sf_dir):
    out = (
        REGISTRY["warehouse_digest"].fn(spark, sf_dir)
        .toPandas().set_index("tbl")
    )
    assert len(out) == 10
    # row counts match the raw files
    for t in out.index:
        n = spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        assert out.loc[t, "n_rows"] == n
    # digest sensitivity: recomputing over a mutated copy changes it
    from gan_deeplearning4j_spark.functions.text import portable_hash60
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    ser = F.concat_ws(
        "|", F.col("r_regionkey").cast("string"),
        F.col("r_name").cast("string"),
    )
    base = r.agg(
        (F.sum(portable_hash60(ser).cast("decimal(38,0)"))
         % F.lit(9007199254740993).cast("decimal(38,0)")).cast("long")
    ).collect()[0][0]
    assert base == out.loc["region", "digest"]
    mutated = r.withColumn(
        "r_name",
        F.when(F.col("r_regionkey") == 0, F.lit("XX"))
        .otherwise(F.col("r_name")),
    )
    ser2 = F.concat_ws(
        "|", F.col("r_regionkey").cast("string"),
        F.col("r_name").cast("string"),
    )
    changed = mutated.agg(
        (F.sum(portable_hash60(ser2).cast("decimal(38,0)"))
         % F.lit(9007199254740993).cast("decimal(38,0)")).cast("long")
    ).collect()[0][0]
    assert changed != base


def test_engagement_rollup_consistency(spark, sf_dir):
    out = REGISTRY["engagement_rollup"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 1000 // 86_400_000_000
    dau = ev.groupby("day")["user_id"].nunique()
    assert len(out) == len(dau)
    for _, r in out.iterrows():
        assert r["dau"] == dau[r["day"]]
        wk = ev[ev["day"] // 7 == r["day"] // 7]["user_id"].nunique()
        mo = ev[ev["day"] // 28 == r["day"] // 28]["user_id"].nunique()
        assert r["wau"] == wk and r["mau"] == mo
        assert r["stickiness_ppm"] == r["dau"] * 1000000 // r["mau"]
    assert (out["dau"] <= out["wau"]).all() and (out["wau"] <= out["mau"]).all()


def test_power_user_curve_totals(spark, sf_dir):
    out = REGISTRY["power_user_curve"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 1000 // 86_400_000_000
    per = ev.groupby("user_id")["day"].nunique()
    assert out["n_users"].sum() == len(per)
    from collections import Counter
    want = Counter(per.values)
    for _, r in out.iterrows():
        assert want[r["active_days"]] == r["n_users"]


def test_new_vs_returning_reconciles_with_dau(spark, sf_dir):
    out = REGISTRY["new_vs_returning_daily"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 1000 // 86_400_000_000
    dau = ev.groupby("day")["user_id"].nunique()
    for _, r in out.iterrows():
        assert r["new_users"] + r["returning_users"] == dau[r["day"]]
    # total new users over all days == total distinct users
    assert out["new_users"].sum() == ev["user_id"].nunique()


def test_session_duration_quartiles_match_pandas(spark, sf_dir):
    out = (
        REGISTRY["session_duration_quartiles"].fn(spark, sf_dir)
        .toPandas().iloc[0]
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["us"] = ev["ts"].astype("int64") // 1000
    durs = []
    for _, g in ev.sort_values(["us", "event_id"]).groupby("user_id"):
        start = prev = None
        for u in g["us"]:
            if start is None:
                start = prev = u
            elif u - prev > 1_800_000_000:
                durs.append((prev - start) // 1_000_000)
                start = prev = u
            else:
                prev = u
        durs.append((prev - start) // 1_000_000)
    v = np.sort(np.array(durs))
    assert out["n_sessions"] == len(v)
    for q, col in ((0.25, "q25_s"), (0.5, "q50_s"), (0.75, "q75_s")):
        assert out[col] == v[int(np.ceil(q * len(v))) - 1]


def test_cross_source_duplication_finds_planted_dups(spark, sf_dir):
    # the corpus has no cross-source exact dups; the driver row is an
    # agreed-empty — plant some to prove the mechanism
    out = REGISTRY["cross_source_duplication"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    fp = docs.assign(t=docs["text"].str.strip().str.lower())
    expected_pairs = sum(
        n * (n - 1) // 2
        for n in fp.groupby("t")["source"].nunique()
        if n > 1
    )
    assert out["n_shared"].sum() == expected_pairs

    # planted: copy three texts from src1 into src2/src3 and rerun inline
    from gan_deeplearning4j_spark.functions.text import portable_hash60
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src1 = base.filter(F.col("source") == "src1").limit(3)
    planted = base.unionByName(
        src1.withColumn("source", F.lit("src2")).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    ).unionByName(
        src1.limit(1).withColumn("source", F.lit("src3")).withColumn(
            "doc_id", F.col("doc_id") + 2000000
        )
    )
    d = planted.select(
        "source",
        portable_hash60(F.lower(F.trim(F.col("text")))).alias("fp"),
    ).distinct()
    a, b = d.alias("a"), d.alias("b")
    got = (
        a.join(
            b,
            (F.col("b.fp") == F.col("a.fp"))
            & (F.col("b.source") > F.col("a.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .toPandas()
        .set_index(["src_a", "src_b"])["n_shared"].to_dict()
    )
    assert got[("src1", "src2")] == 3
    assert got[("src1", "src3")] == 1
    assert got[("src2", "src3")] == 1


def test_fulfillment_latency_matches_pandas(spark, sf_dir):
    out = (
        REGISTRY["fulfillment_latency_quartiles"].fn(spark, sf_dir)
        .toPandas().set_index("o_orderpriority")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    first = li.groupby("l_orderkey")["l_shipdate"].min()
    j = o.join(first.rename("ship0"), on="o_orderkey", how="inner")
    j["lat_d"] = (
        (j["ship0"].astype("int64") - j["o_orderdate"].astype("int64"))
        // 1000 // 86_400_000_000
    )
    for pri, g in j.groupby("o_orderpriority"):
        v = np.sort(g["lat_d"].to_numpy())
        n = len(v)
        assert out.loc[pri, "n_orders"] == n
        assert out.loc[pri, "q50_d"] == v[int(np.ceil(0.5 * n)) - 1]
        assert out.loc[pri, "p95_d"] == v[int(np.ceil(0.95 * n)) - 1]
