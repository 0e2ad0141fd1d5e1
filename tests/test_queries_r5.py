"""Round-5 query pins: python replays and statistical sanity for the
queries_r5 additions (the DuckDB hash parity itself is covered by
tests/test_oracle_parity.py / scripts/driver_replica.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gan_deeplearning4j_spark.queries import REGISTRY


def test_gan_grid_inference_fixed_matches_python_forward(spark, sf_dir):
    """The mapInPandas distributed forward pass equals a plain-python
    integer replay of the same literal network over the same grid."""
    from gan_deeplearning4j_spark.queries_r5 import (
        _GRID_SIDE,
        _Z_SCALE,
        _gan_fixed_ints,
    )

    out = (
        REGISTRY["gan_grid_inference_fixed"].fn(spark, sf_dir)
        .toPandas().set_index("grid_id").sort_index()
    )
    w1, b1, w2, b2 = _gan_fixed_ints()
    s = _GRID_SIDE
    step = 2.0 / (s - 1)
    for gid in range(s * s):
        gi, gj = gid // s, gid % s
        ziq = int(np.floor((-1.0 + gi * step) * _Z_SCALE))
        zjq = int(np.floor((-1.0 + gj * step) * _Z_SCALE))
        h = [
            max(0, w1[0][j] * ziq + w1[1][j] * zjq + b1[j])
            for j in range(len(b1))
        ]
        px = [
            sum(w2[j][k] * h[j] for j in range(len(h))) + b2[k]
            for k in range(len(b2))
        ]
        assert int(out.loc[gid, "px0_q"]) == px[0], gid
        assert int(out.loc[gid, "px1_q"]) == px[1], gid


def test_hll_estimate_within_theory_error(spark):
    """1024 registers → ~3.25% theoretical std error; assert the estimate
    lands within 4 sigma of the exact distinct count (event_id is unique
    per row, so exact == row count). Pinned at sf0.01 — the smallest SF
    whose cardinality (10k) clears the raw-estimator regime (2.5m); below
    that HLL needs the ln-based linear-counting correction the oracle
    deliberately omits (see the query doc)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT event_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    assert exact >= 2.5 * 1024  # raw-estimator regime precondition
    est = (
        REGISTRY["hll_registers_exact"].fn(spark, sf)
        .collect()[0]["est_events"]
    )
    assert abs(est - exact) / exact < 4 * 1.04 / np.sqrt(1024)


def test_theil_sen_matches_numpy_replay(spark, sf_dir):
    out = REGISTRY["theil_sen_slope_daily"].fn(spark, sf_dir).collect()[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sel = orders[
        (orders["o_orderdate"] >= "1996-01-01")
        & (orders["o_orderdate"] < "1996-03-01")
    ].copy()
    sel["cents"] = (sel["o_totalprice"] * 100).round().astype(np.int64)
    sel["day"] = (
        sel["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    d = sel.groupby("day")["cents"].sum().sort_index()
    days = d.index.to_numpy()
    cents = d.to_numpy()
    # python // floors; replicate the engines' trunc-toward-zero division
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            num = int(cents[j] - cents[i]) * 1000
            den = int(days[j] - days[i])
            q = abs(num) // den
            slopes.append(q if num >= 0 else -q)
    slopes.sort()
    n = len(slopes)
    assert out["n_pairs"] == n
    assert out["median_slope_mc"] == slopes[(n + 1) // 2 - 1]


def test_mann_kendall_matches_numpy_replay(spark, sf_dir):
    out = REGISTRY["mann_kendall_trend"].fn(spark, sf_dir).collect()[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sel = orders[
        (orders["o_orderdate"] >= "1996-01-01")
        & (orders["o_orderdate"] < "1996-03-01")
    ].copy()
    sel["cents"] = (sel["o_totalprice"] * 100).round().astype(np.int64)
    sel["day"] = (
        sel["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    d = sel.groupby("day")["cents"].sum().sort_index().to_numpy()
    n = len(d)
    s = sum(
        int(np.sign(d[j] - d[i]))
        for i in range(n) for j in range(i + 1, n)
    )
    _, counts = np.unique(d, return_counts=True)
    tie = sum(int(t) * (t - 1) * (2 * t + 5) for t in counts if t > 1)
    assert out["n_days"] == n
    assert out["s_stat"] == s
    assert out["var18"] == n * (n - 1) * (2 * n + 5) - tie


def test_spearman_matches_scipy_formula(spark, sf_dir):
    out = (
        REGISTRY["spearman_corr_by_lang"].fn(spark, sf_dir)
        .toPandas().set_index("lang")
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["n_tok"] = docs["text"].str.split(" ").str.len()
    for lang, g in docs.groupby("lang"):
        rx = g["n_chars"].rank(method="average")
        ry = g["n_tok"].rank(method="average")
        rho = np.corrcoef(rx, ry)[0, 1]
        got = out.loc[lang, "rho_ppm"] / 1e6
        assert abs(got - rho) < 2e-6, lang


def test_welch_t_matches_scipy_formula(spark, sf_dir):
    out = REGISTRY["welch_t_sources"].fn(spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    a = docs.loc[docs["source"] == "src0", "n_chars"].to_numpy(np.float64)
    b = docs.loc[docs["source"] == "src1", "n_chars"].to_numpy(np.float64)
    t = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert out["n1"] == len(a) and out["n2"] == len(b)
    assert abs(out["t_ppm"] / 1e6 - t) < 2e-6


def test_gopher_rule_audit_counts(spark, sf_dir):
    out = (
        REGISTRY["gopher_rule_audit"].fn(spark, sf_dir)
        .toPandas().set_index("source")
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs["text"].str.split(" ")
    docs["n_tok"] = toks.str.len()
    docs["alpha"] = docs["text"].str.replace(" ", "", regex=False).str.len()
    docs["stop"] = toks.apply(lambda t: sum(1 for x in t if x in ("the", "a")))
    r_len = docs["n_tok"].between(20, 100000)
    r_word = (100 * docs["alpha"] >= 300 * docs["n_tok"]) & (
        100 * docs["alpha"] <= 1000 * docs["n_tok"]
    )
    r_stop = 100 * docs["stop"] >= 2 * docs["n_tok"]
    for src, g in docs.groupby("source"):
        assert out.loc[src, "n_docs"] == len(g)
        assert out.loc[src, "pass_len"] == int(r_len[g.index].sum())
        assert out.loc[src, "pass_wordlen"] == int(r_word[g.index].sum())
        assert out.loc[src, "pass_stop"] == int(r_stop[g.index].sum())
        assert out.loc[src, "keep"] == int(
            (r_len[g.index] & r_word[g.index] & r_stop[g.index]).sum()
        )


def test_ols_multi_cramer_matches_numpy_lstsq(spark, sf_dir):
    out = REGISTRY["ols_multi_cramer"].fn(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev[ev["event_type"] == "purchase"].copy()
    h = p["ts"].dt.hour.to_numpy(np.float64)
    d = (
        (p["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days + 4
    ).to_numpy() % 7
    y = (p["value"] * 100).round().to_numpy(np.float64)
    X = np.column_stack([np.ones_like(h), h, d.astype(np.float64)])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert out["n"] == len(p)
    for got, want in zip(
        (out["b0_ppm"], out["b_hour_ppm"], out["b_dow_ppm"]), beta
    ):
        assert abs(got / 1e6 - want) < 1e-4, (got, want)


def test_pit_join_never_leaks_future_state(spark, sf_dir):
    """Property pin: recomputing with pandas merge_asof (backward) gives
    the same per-state totals — i.e. each purchase saw only the state
    change at-or-before its own timestamp."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    st = ev[ev["event_type"].isin(["signup", "error"])][
        ["user_id", "ts", "event_type"]
    ].rename(columns={"event_type": "state"})
    p = ev[ev["event_type"] == "purchase"][["user_id", "ts", "value"]]
    m = pd.merge_asof(
        p.sort_values("ts"), st.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
    ).dropna(subset=["state"])
    m["cents"] = (m["value"] * 100).round().astype(np.int64)
    want = m.groupby("state")["cents"].agg(["count", "sum"])
    out = (
        REGISTRY["pit_state_feature_join"].fn(spark, sf_dir)
        .toPandas().set_index("state")
    )
    for state in want.index:
        assert out.loc[state, "n_purchases"] == want.loc[state, "count"]
        assert out.loc[state, "cents"] == want.loc[state, "sum"]


def test_mom_revenue_change_replay(spark, sf_dir):
    out = (
        REGISTRY["mom_revenue_change"].fn(spark, sf_dir)
        .toPandas().set_index("mon").sort_index()
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["mon"] = (
        orders["o_orderdate"].dt.year * 12 + orders["o_orderdate"].dt.month - 1
    )
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype(np.int64)
    m = orders.groupby("mon")["cents"].sum().sort_index()
    prev = None
    for mon, cents in m.items():
        assert out.loc[mon, "cents"] == cents
        if prev is None:
            assert pd.isna(out.loc[mon, "delta_ppm"])
        else:
            num = (int(cents) - prev) * 1000000
            q = abs(num) // prev
            assert out.loc[mon, "delta_ppm"] == (q if num >= 0 else -q)
        prev = int(cents)


def test_contrastive_negatives_deterministic_and_complete(spark, sf_dir):
    """Every doc except per-bucket ring tails appears exactly once as an
    anchor; repeated runs are identical (hash order, not rand())."""
    out1 = (
        REGISTRY["contrastive_negative_pairs"].fn(spark, sf_dir).toPandas()
    )
    out2 = (
        REGISTRY["contrastive_negative_pairs"].fn(spark, sf_dir).toPandas()
    )
    pd.testing.assert_frame_equal(out1, out2)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # each of the 64 buckets drops exactly its last ring element (tails
    # may be fewer than 64 if a bucket is empty at tiny SF)
    n_anchors = out1["n"].sum()
    assert len(docs) - 64 <= n_anchors < len(docs)


def test_kwic_window_clips_and_centers(spark, sf_dir):
    out = REGISTRY["kwic_context_window"].fn(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")
    assert len(out) > 0
    for _, r in out.iterrows():
        toks = docs.loc[r["doc_id"], "text"].split(" ")
        pos = int(r["pos"])  # 1-based first occurrence
        assert toks[pos - 1] == "spark"
        lo = max(1, pos - 2)
        hi = min(len(toks), pos + 2)
        assert r["context"] == " ".join(toks[lo - 1:hi])


def test_int8_quantization_error_matches_numpy(spark, sf_dir):
    out = (
        REGISTRY["int8_quantization_error"].fn(spark, sf_dir)
        .toPandas().set_index("label")
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    for label, g in emb.groupby("label"):
        sse = 0
        for e in g["embedding"]:
            x = np.asarray(e, dtype=np.float32).astype(np.float64)
            m = np.abs(x).max()
            if m == 0:
                continue
            # np.round is banker's; replicate SQL half-away-from-zero
            q = np.floor(np.abs(x) * 127.0 / m + 0.5) * np.sign(x)
            err = x - q * m / 127.0
            sse += int(np.floor(err * err * (2.0 ** 40)).sum())
        assert out.loc[label, "n_vecs"] == len(g)
        assert out.loc[label, "sse_q40"] == sse, label


def test_neardup_sweep_monotone_and_consistent(spark, sf_dir):
    """Pair counts must be non-increasing in the threshold, and the 0.5
    row must equal the jaccard_neardup_pairs ground-truth pair count."""
    out = (
        REGISTRY["neardup_threshold_sweep"].fn(spark, sf_dir)
        .toPandas().set_index("thr_permille").sort_index()
    )
    n = out["n_pairs"].to_numpy()
    assert (np.diff(n) <= 0).all()
    gt = REGISTRY["jaccard_neardup_pairs"].fn(spark, sf_dir).count()
    assert int(out.loc[500, "n_pairs"]) == gt


def test_shard_balance_audit_sums(spark, sf_dir):
    out = REGISTRY["shard_balance_audit"].fn(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert out["n_docs"].sum() == len(docs)
    assert out["sum_chars"].sum() == docs["n_chars"].sum()
    assert len(out) <= 16
    # share column is exactly n*16e6 div total
    total = len(docs)
    for _, r in out.iterrows():
        assert r["load_ppm_x16"] == r["n_docs"] * 16000000 // total


def test_variant_extract_agrees_with_from_json_lane(spark, sf_dir):
    """The VARIANT lane must agree with the schema-declared from_json
    lane on the same field (two engine paths, one answer)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = (
        REGISTRY["variant_props_extract"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    b = (
        ev.withColumn("k", F.from_json("props", "k BIGINT")["k"])
        .groupBy("event_type")
        .agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
        .toPandas().set_index("event_type")
    )
    for et in b.index:
        assert a.loc[et, "min_k"] == b.loc[et, "mn"]
        assert a.loc[et, "max_k"] == b.loc[et, "mx"]


def test_try_divide_nulls_match_planted_zero_divisors(spark, sf_dir):
    out = (
        REGISTRY["try_arithmetic_report"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for et, g in ev.groupby("event_type"):
        assert out.loc[et, "n_divzero"] == int((g["user_id"] % 5 == 0).sum())


def test_rolling_7d_matches_pandas_window(spark, sf_dir):
    out = (
        REGISTRY["rolling_7d_active_users"].fn(spark, sf_dir)
        .toPandas().set_index("day").sort_index()
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = (
        ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    du = ev[["day", "user_id"]].drop_duplicates()
    for day in out.index:
        want = du[(du["day"] >= day - 6) & (du["day"] <= day)][
            "user_id"
        ].nunique()
        assert out.loc[day, "active_7d"] == want, day


def test_histogram_sketch_brackets_exact_quantiles(spark, sf_dir):
    """Each sketch bucket must CONTAIN the exact quantile (bucket error
    is bounded by construction, never off by a bucket)."""
    out = REGISTRY["histogram_quantile_sketch"].fn(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    cents = (li["l_extendedprice"] * 100).round().astype(np.int64)
    for q, col in ((0.5, "p50_bucket"), (0.9, "p90_bucket"),
                   (0.99, "p99_bucket")):
        exact = np.sort(cents)[int(np.ceil(q * len(cents))) - 1]
        assert out[col] == exact // 50000, (q, out[col], exact // 50000)


def test_regex_extract_all_counts(spark, sf_dir):
    import re

    out = (
        REGISTRY["regex_extract_all_stats"].fn(spark, sf_dir).toPandas()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter
    c = Counter()
    for t in docs["text"]:
        c.update(re.findall(r"\b(s[a-z]{3,})\b", t))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = list(zip(out["term"], out["n"]))
    assert got == want


def test_union_by_name_null_fill(spark, sf_dir):
    out = (
        REGISTRY["union_by_name_mixed"].fn(spark, sf_dir)
        .toPandas().set_index("o_orderpriority")
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    f = orders[orders["o_orderstatus"] == "F"]
    o = orders[orders["o_orderstatus"] == "O"]
    for prio in out.index:
        nf = int((f["o_orderpriority"] == prio).sum())
        no = int((o["o_orderpriority"] == prio).sum())
        assert out.loc[prio, "n"] == nf + no
        assert out.loc[prio, "n_flagged"] == no  # only the O branch flags
        want_cents = int(
            (f.loc[f["o_orderpriority"] == prio, "o_totalprice"] * 100)
            .round().astype(np.int64).sum()
        )
        assert out.loc[prio, "cents_sum"] == want_cents  # O branch is NULL


def test_max_by_deterministic_argmax(spark, sf_dir):
    out = (
        REGISTRY["max_by_customer_order"].fn(spark, sf_dir)
        .toPandas().set_index("o_custkey")
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sel = orders[orders["o_custkey"] < 200].copy()
    sel["cents"] = (sel["o_totalprice"] * 100).round().astype(np.int64)
    for ck, g in sel.groupby("o_custkey"):
        top = g.sort_values(
            ["cents", "o_orderkey"], ascending=False
        ).iloc[0]
        assert out.loc[ck, "top_orderkey"] == top["o_orderkey"]
        assert out.loc[ck, "top_cents"] == top["cents"]


def test_date_spine_counts(spark, sf_dir):
    out = REGISTRY["date_spine_fill_gaps"].fn(spark, sf_dir).collect()[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    days = orders["o_orderdate"].dt.normalize()
    span = (days.max() - days.min()).days + 1
    assert out["n_days"] == span
    assert out["n_gap_days"] == span - days.nunique()
    assert out["total_cents"] == int(
        (orders["o_totalprice"] * 100).round().astype(np.int64).sum()
    )


def test_cogroup_reconcile_matches_pandas(spark, sf_dir):
    out = (
        REGISTRY["cogroup_order_event_match"].fn(spark, sf_dir)
        .toPandas().set_index("user_id")
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    o = orders[orders["o_custkey"] < 200].copy()
    e = ev[ev["user_id"] < 200].copy()
    o["day"] = o["o_orderdate"].dt.normalize()
    e["day"] = e["ts"].dt.normalize()
    keys = set(o["o_custkey"]) | set(e["user_id"])
    assert set(out.index) == keys
    for uid in sorted(keys)[:50]:
        og = o[o["o_custkey"] == uid]
        eg = e[e["user_id"] == uid]
        assert out.loc[uid, "n_orders"] == len(og)
        assert out.loc[uid, "n_events"] == len(eg)
        pairs = len(og[["day"]].merge(eg[["day"]], on="day"))
        assert out.loc[uid, "n_same_day_pairs"] == pairs


def test_decile_lift_reconciles(spark, sf_dir):
    out = (
        REGISTRY["decile_lift_table"].fn(spark, sf_dir)
        .toPandas().sort_values("decile")
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = (
        (ev["value"] * 100).round().astype(np.int64)
        .groupby(ev["user_id"]).sum()
    )
    assert out["n_users"].sum() == len(cents)
    assert out["sum_cents"].sum() == cents.sum()
    # decile 0 holds the biggest spenders: lift must be monotone
    # non-increasing and decile 0 strictly above average
    lifts = out["lift_ppm"].to_numpy()
    assert (np.diff(lifts) <= 0).all()
    assert lifts[0] > 1_000_000


def test_pmi_lift_matches_python_counts(spark, sf_dir):
    out = REGISTRY["pmi_top_pairs"].fn(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter
    uni, pair = Counter(), Counter()
    for t in docs["text"]:
        ws = t.split(" ")
        uni.update(ws)
        pair.update(zip(ws, ws[1:]))
    total = sum(uni.values())
    rows = []
    for (a, b), n_ab in pair.items():
        if n_ab >= 20:
            lift = int(np.floor(n_ab * float(total)
                                / (uni[a] * float(uni[b])) * 1e6))
            rows.append((a, b, n_ab, lift))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = rows[:15]
    got = list(zip(out["a"], out["b"], out["n_ab"], out["lift_ppm"]))
    assert got == want


def test_bounce_rate_reconciles_with_sessionize(spark, sf_dir):
    """Bounce sessions + multi-event sessions == sessionize's session
    count, and every ppm figure is exactly n_bounces*1e6 div n."""
    out = REGISTRY["session_bounce_rate_daily"].fn(spark, sf_dir).toPandas()
    sess = REGISTRY["sessionize"].fn(spark, sf_dir).toPandas()
    assert out["n_sessions"].sum() == len(sess)
    assert out["n_bounces"].sum() == int((sess["n_events"] == 1).sum())
    for _, r in out.iterrows():
        assert r["bounce_ppm"] == r["n_bounces"] * 1000000 // r["n_sessions"]


def test_containment_catches_planted_excerpt(spark):
    """A short doc fully contained in a long one must surface even
    though its symmetric Jaccard is far below threshold."""
    from gan_deeplearning4j_spark.queries import REGISTRY as R
    import tempfile, os

    long_text = " ".join(f"w{i}" for i in range(100))
    short_text = " ".join(f"w{i}" for i in range(40, 50))  # excerpt
    other = " ".join(f"z{i}" for i in range(100))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, long_text, "en", "s", len(long_text)),
             (2, short_text, "en", "s", len(short_text)),
             (3, other, "en", "s", len(other))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = R["containment_pairs"].fn(spark, d).toPandas()
    pairs = set(zip(out["id_small"], out["id_big"]))
    assert (2, 1) in pairs      # excerpt found
    assert (3, 1) not in pairs  # unrelated doc not matched
