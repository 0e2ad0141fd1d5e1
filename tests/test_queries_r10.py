"""Round-10 staged-query pins: pure-python replays (hash parity is covered
by the gated replica runs; these pin the SEMANTICS against an independent
reimplementation)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

# import order matters: queries_r10 is re-entered by queries.py's bottom
import gan_deeplearning4j_spark.queries  # noqa: F401
from gan_deeplearning4j_spark.queries_r10 import STAGED


def _fn(name):
    return STAGED[name][0]


def _tdiv(a, b):  # truncation toward zero == Spark div / DuckDB //
    return -((-a) // b) if (a < 0) != (b < 0) else a // b


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _copurchase_und(sf_dir):
    from collections import Counter, defaultdict
    from itertools import combinations

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    per_order = li.drop_duplicates().groupby("l_orderkey")["l_partkey"]
    pc = Counter()
    for _, parts in per_order:
        for a, b in combinations(sorted(parts), 2):
            pc[(a, b)] += 1
    und = defaultdict(set)
    for (a, b), w in pc.items():
        if w >= 2:
            und[a].add(b)
            und[b].add(a)
    return und


def test_graph_2hop_reach_matches_python(spark, sf_dir):
    und = _copurchase_und(sf_dir)
    want = {}
    for u, nbrs in und.items():
        reach = set(nbrs)
        for m in nbrs:
            reach |= und[m]
        reach.discard(u)
        want[u] = (len(nbrs), len(reach))
    top = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    out = [(r["node"], r["deg"], r["reach2"], r["second_ring"])
           for r in _fn("graph_2hop_reach")(spark, sf_dir).collect()]
    assert out == [(int(u), d, r2, r2 - d) for u, (d, r2) in top]


def test_decayed_heavy_hitters_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ref = int(us.max()) // 86_400_000_000
    age = (ref - us // 86_400_000_000).to_numpy()
    contrib = np.where(
        age < 20,
        1_000_000 // np.left_shift(np.int64(1), np.clip(age, 0, 62)),
        0,
    )
    g = pd.DataFrame({"t": ev["event_type"], "c": contrib}).groupby("t")
    want = {t: (len(gg), int(gg["c"].sum())) for t, gg in g}
    out = {r["event_type"]: (r["raw_count"], r["decayed_e6"])
           for r in _fn("decayed_heavy_hitters")(spark, sf_dir).collect()}
    assert out == want


def test_zonemap_prune_audit_matches_python(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_extendedprice"])
    pc = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    month = li["l_shipdate"].dt.to_period("M")
    df = pd.DataFrame({"m": month, "pc": pc})
    files = df.groupby("m")["pc"].agg(["min", "max", "count"])
    preds = {"narrow_low": (100000, 200000), "mid_band": (2000000, 3000000),
             "high_tail": (9000000, 99999999)}
    out = {r["pred"]: (r["n_files"], r["n_pruned"], r["rows_total"],
                       r["rows_scanned"], r["prune_ppm"])
           for r in _fn("zonemap_prune_audit")(spark, sf_dir).collect()}
    for pred, (lo, hi) in preds.items():
        pruned = (files["max"] < lo) | (files["min"] > hi)
        nf, npr = len(files), int(pruned.sum())
        assert out[pred] == (
            nf, npr, int(files["count"].sum()),
            int(files.loc[~pruned, "count"].sum()),
            npr * 1_000_000 // nf,
        ), pred


def test_qini_uplift_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    g = ev.groupby("user_id").agg(
        activity=("event_type", "size"),
        purchases=("event_type", lambda x: int((x == "purchase").sum())),
    ).reset_index()
    g["treated"] = g["user_id"] % 2
    g = g.sort_values(["activity", "user_id"],
                      ascending=[False, True]).reset_index(drop=True)
    n = len(g)
    g["decile"] = (g.index * 10) // n + 1
    per = g.groupby("decile").apply(
        lambda gg: pd.Series({
            "rt": int(gg.loc[gg["treated"] == 1, "purchases"].sum()),
            "rc": int(gg.loc[gg["treated"] == 0, "purchases"].sum()),
            "nt": int((gg["treated"] == 1).sum()),
            "nc": int((gg["treated"] == 0).sum()),
        }), include_groups=False).sort_index()
    cum = per.cumsum()
    out = {r["decile"]: (r["cum_treated_resp"], r["cum_control_resp"],
                         r["cum_treated_n"], r["cum_control_n"],
                         r["qini_e6"])
           for r in _fn("qini_uplift_curve")(spark, sf_dir).collect()}
    for dec, row in cum.iterrows():
        crt, crc = int(row["rt"]), int(row["rc"])
        cnt, cnc = int(row["nt"]), int(row["nc"])
        q = crt * 1_000_000 - crc * cnt * 1_000_000 // cnc
        assert out[int(dec)] == (crt, crc, cnt, cnc, q), dec


def test_randomized_response_matches_hashlib(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    truth = ev.groupby("user_id")["event_type"].apply(
        lambda x: int((x == "purchase").any())
    )
    rep = 0
    for uid, t in truth.items():
        if _h60(f"rr1|{uid}") % 4 < 3:
            rep += t
        else:
            rep += _h60(f"rr2|{uid}") % 2
    n = len(truth)
    est = _tdiv(8 * rep - n, 6)
    row = _fn("randomized_response_debias")(spark, sf_dir).collect()[0]
    assert (row["n_users"], row["true_count"], row["reported_count"],
            row["est_count"]) == (n, int(truth.sum()), rep, est)
    assert row["abs_err_ppm"] == abs(est - int(truth.sum())) * 1_000_000 // n
    # the estimator should be in the right ballpark (RR noise scales
    # ~1/sqrt(n); the smallest test SF has only ~300 users)
    assert row["abs_err_ppm"] < 250_000


def test_empirical_bayes_shrinkage_matches_python(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_returnflag"])
    per = li.groupby("l_suppkey")["l_returnflag"].agg(
        x=lambda v: int((v == "R").sum()), n="size")
    xx, nn = int(per["x"].sum()), int(per["n"].sum())
    vt = int(sum(
        _tdiv(_tdiv(int(r["x"]) * nn - xx * int(r["n"]), 1000) ** 2,
              int(r["n"]))
        for _, r in per.iterrows()))
    pbar = xx / nn
    k = max(pbar * (1 - pbar) * (float(nn) * nn * nn) / (vt * 1e6) - 1.0,
            1.0)
    a_e6 = math.floor(k * pbar * 1e6)
    b_e6 = math.floor(k * (1 - pbar) * 1e6)
    rows = _fn("empirical_bayes_shrinkage")(spark, sf_dir).collect()
    assert len(rows) == min(15, len(per))
    for r in rows:
        x, n = r["x"], r["n"]
        raw = x * 1_000_000 // n
        shrunk = (x * 1_000_000 + a_e6) * 1_000_000 \
            // (n * 1_000_000 + a_e6 + b_e6)
        assert (r["raw_ppm"], r["shrunk_ppm"]) == (raw, shrunk)
        assert r["shrink_delta_ppm"] == abs(raw - shrunk)


def test_max_nonoverlap_matches_python_greedy(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    ship = li.groupby("l_orderkey")["l_shipdate"].max()
    m = o.join(ship, on="o_orderkey", how="inner")
    sd = (m["o_orderdate"].dt.floor("D").astype("datetime64[s]")
          .astype(np.int64) // 86400)
    ed = (m["l_shipdate"].dt.floor("D").astype("datetime64[s]")
          .astype(np.int64) // 86400)
    df = pd.DataFrame({"cust": m["o_custkey"], "sd": sd, "ed": ed})
    hist = {}
    for cust, g in df.groupby("cust"):
        els = sorted(zip(g["ed"], g["sd"]))
        last_end, k = 0, 0
        for e, s in els:
            if s > last_end:
                last_end, k = e, k + 1
        n0, tot = hist.get(k, (0, 0))
        hist[k] = (n0 + 1, tot + len(g))
    out = {r["k_selected"]: (r["n_customers"], r["total_orders"])
           for r in _fn("max_nonoverlap_intervals")(spark, sf_dir).collect()}
    assert out == hist


def test_neyman_allocation_matches_python(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    # floor(x + 0.5) == SQL round (half away from zero on positives);
    # np.round is banker's and splits at exact .50 prices
    m["xd"] = np.floor(m["o_totalprice"] + 0.5).astype(np.int64)
    g = m.groupby("c_nationkey")["xd"].agg(["count", "sum"])
    g["sxx"] = m.assign(x2=m["xd"] ** 2).groupby("c_nationkey")["x2"].sum()
    g = g[g["count"] > 1]
    s_e3 = {
        nk: math.floor(math.sqrt(
            (float(r["sxx"]) * r["count"] - float(r["sum"]) * r["sum"])
            / (float(r["count"]) * (r["count"] - 1))) * 1000)
        for nk, r in g.iterrows()}
    wt = {nk: int(g.loc[nk, "count"]) * s_e3[nk] for nk in s_e3}
    W = sum(wt.values())
    base = {nk: 1000 * w // W for nk, w in wt.items()}
    rem = {nk: (1000 * w) % W for nk, w in wt.items()}
    leftover = 1000 - sum(base.values())
    order = sorted(rem, key=lambda nk: (-rem[nk], nk))
    alloc = dict(base)
    for nk in order[:leftover]:
        alloc[nk] += 1
    names = nat.set_index("n_nationkey")["n_name"]
    out = {r["n_name"]: (r["n_h"], r["s_e3"], r["alloc"])
           for r in _fn("neyman_allocation")(spark, sf_dir).collect()}
    want = {names[nk]: (int(g.loc[nk, "count"]), s_e3[nk], alloc[nk])
            for nk in s_e3}
    assert out == want
    assert sum(a for _, _, a in out.values()) == 1000


def test_knn_shapley_matches_python(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = {int(r["vec_id"]): (
        np.floor(np.asarray(r["embedding"], dtype=np.float64)
                 * 1024).astype(np.int64),
        int(r["label"])) for _, r in emb.iterrows()}
    test = {k: v for k, v in q.items() if k < 5}
    train = {k: v for k, v in q.items() if k >= 5}
    K = 3
    want = []
    for qid, (qv, qy) in sorted(test.items()):
        rows = sorted(
            ((int(((tv - qv) ** 2).sum()), tid, 1 if ty == qy else 0)
             for tid, (tv, ty) in train.items()),
        )
        n = len(rows)
        s = [0] * n
        s[n - 1] = rows[n - 1][2] * (10 ** 9 // n)
        for i in range(n - 2, -1, -1):
            s[i] = s[i + 1] + (rows[i][2] - rows[i + 1][2]) \
                * (10 ** 9 // max(K, i + 1))
        scored = sorted(
            ((s[i], rows[i][1]) for i in range(n)),
            key=lambda t: (-t[0], t[1]))[:5]
        want += [(qid, tid, sv) for sv, tid in
                 sorted(scored, key=lambda t: t[1])]
    out = [(r["query_id"], r["vec_id"], r["shapley_e9"])
           for r in _fn("knn_shapley_values")(spark, sf_dir).collect()]
    assert out == want


def test_dtw_matches_python_dp(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    qi = ((m["o_orderdate"].dt.year - 1970) * 4
          + (m["o_orderdate"].dt.month - 1) // 3)
    df = pd.DataFrame({"nk": m["c_nationkey"], "qi": qi})
    counts = df.groupby(["nk", "qi"]).size()
    tot = counts.groupby("nk").sum()
    top4 = sorted(tot.index, key=lambda nk: (-int(tot[nk]), nk))[:4]
    lo, hi = int(df["qi"].min()), int(df["qi"].max())
    series = {nk: [int(counts.get((nk, q), 0)) for q in range(lo, hi + 1)]
              for nk in top4}
    M = hi - lo + 1
    INF = 10 ** 15

    def dtw(a, b):
        prev = [INF] * (M + 1)
        prev[0] = 0
        for i in range(1, M + 1):
            cur = [INF] * (M + 1)
            for j in range(1, M + 1):
                cur[j] = abs(a[i - 1] - b[j - 1]) + min(
                    prev[j - 1], prev[j], cur[j - 1])
            prev = cur
        return prev[M]

    want = []
    for x in range(len(top4)):
        for y in range(x + 1, len(top4)):
            na, nb = sorted((top4[x], top4[y]))
            want.append((na, nb, M, dtw(series[na], series[nb])))
    want.sort()
    out = [(r["nation_a"], r["nation_b"], r["n_quarters"], r["dtw_cost"])
           for r in _fn("dtw_distance_pairs")(spark, sf_dir).collect()]
    assert out == want


def test_huffman_optimal_and_kraft(spark, sf_dir):
    """Code lengths must satisfy Kraft EQUALITY (a full binary tree) and
    achieve the optimal expected length (checked against heapq Huffman,
    which may differ in tie-breaks but never in total cost); entropy
    lower bound and the +1 upper bound hold."""
    import heapq

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    f = ev.groupby("event_type").size().sort_index()
    out = {r["event_type"]: (r["freq"], r["code_len"], r["weighted_bits"])
           for r in _fn("huffman_code_lengths")(spark, sf_dir).collect()}
    assert {t: v[0] for t, v in out.items()} == f.to_dict()
    assert all(wb == fr * cl for fr, cl, wb in out.values())
    # Kraft equality
    assert sum(2.0 ** -cl for _, cl, _ in out.values()) == 1.0
    # optimal total cost vs an independent heapq Huffman
    h = [(int(v), i) for i, v in enumerate(f)]
    heapq.heapify(h)
    total = 0
    while len(h) > 1:
        a = heapq.heappop(h)
        b = heapq.heappop(h)
        total += a[0] + b[0]
        heapq.heappush(h, (a[0] + b[0], min(a[1], b[1])))
    assert sum(wb for _, _, wb in out.values()) == total
    # Shannon bounds
    n = int(f.sum())
    ent = -sum((v / n) * math.log2(v / n) for v in f)
    avg = total / n
    assert ent <= avg < ent + 1


def test_stl_mad_anomalies_matches_python(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
    day = (o["o_orderdate"].dt.floor("D").astype("datetime64[s]")
           .astype(np.int64) // 86400)
    counts = day.value_counts().sort_index()
    d0, d1 = int(counts.index.min()), int(counts.index.max())
    days = list(range(d0, d1 + 1))
    x = [int(counts.get(d, 0)) for d in days]
    n = len(days)
    rows = []
    for i in range(3, n - 3):
        trend = sum(x[i - 3:i + 4]) // 7
        rows.append((days[i], x[i], x[i] - trend, days[i] % 7))
    seas = {}
    for dow in range(7):
        ds = [dt for (_, _, dt, w) in rows if w == dow]
        seas[dow] = _tdiv(sum(ds), len(ds))
    rem = [(d, xx, dt - seas[w]) for (d, xx, dt, w) in rows]

    def lomed(vals):
        sv = sorted(vals)
        return sv[(len(sv) + 1) // 2 - 1]

    med = lomed([r for (_, _, r) in rem])
    mad = lomed([abs(r - med) for (_, _, r) in rem])
    want = [(d, xx, r, abs(r - med), mad) for (d, xx, r) in rem
            if abs(r - med) > 3 * mad]
    out = [(r["day"], r["x"], r["remainder"], r["deviation"], r["mad"])
           for r in _fn("stl_mad_anomalies")(spark, sf_dir).collect()]
    assert out == sorted(want)
    assert len(out) > 0  # the gate data must actually flag something


def test_greedy_assignment_matches_python(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["wc"] = np.round(m["l_extendedprice"] * 100).astype(np.int64)
    w = m.groupby(["o_custkey", "l_suppkey"])["wc"].sum().reset_index()
    w = w.sort_values(["wc", "o_custkey", "l_suppkey"],
                      ascending=[False, True, True]).head(200)
    usedc, useds, tot, k = set(), set(), 0, 0
    for _, r in w.iterrows():
        if r["o_custkey"] not in usedc and r["l_suppkey"] not in useds:
            usedc.add(r["o_custkey"])
            useds.add(r["l_suppkey"])
            tot += int(r["wc"])
            k += 1
    row = _fn("greedy_assignment_matching")(spark, sf_dir).collect()[0]
    assert (row["n_edges_considered"], row["n_matched"],
            row["total_weight_c"]) == (len(w), k, tot)


def test_bandit_replay_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_id", "event_type", "value"])
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    arms = sorted(ev["event_type"].unique())
    k = len(arms)
    aidx = {a: i + 1 for i, a in enumerate(arms)}
    st = ev.sort_values(["ts_us", "event_id"]).head(2000)
    pulls, rews = [0] * k, [0] * k
    for _, row in st.iterrows():
        eid = int(row["event_id"])
        a = aidx[row["event_type"]]
        r = 1 if round(row["value"] * 100) > 5000 else 0
        if _h60(f"eg|{eid}") % 4 == 0:
            ch = _h60(f"ega|{eid}") % k + 1
        elif 0 in pulls:
            ch = pulls.index(0) + 1
        else:
            means = [rews[i] * 1_000_000 // pulls[i] for i in range(k)]
            ch = means.index(max(means)) + 1
        if ch == a:
            pulls[ch - 1] += 1
            rews[ch - 1] += r
    out = {r["event_type"]: (r["pulls"], r["reward_sum"], r["mean_ppm"])
           for r in _fn("bandit_replay_egreedy")(spark, sf_dir).collect()}
    for i, a in enumerate(arms):
        assert out[a] == (
            pulls[i], rews[i],
            rews[i] * 1_000_000 // max(pulls[i], 1)), a


def test_changepoints_match_python_dp(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    m = o[(o["o_orderdate"] >= "1996-01-01")
          & (o["o_orderdate"] < "1997-01-01")]
    day = (m["o_orderdate"].dt.floor("D").astype("datetime64[s]")
           .astype(np.int64) // 86400)
    kd = np.floor(m["o_totalprice"].to_numpy() / 1000 + 0.5).astype(
        np.int64)  # SQL round semantics (np.round is banker's)
    daily = pd.Series(kd).groupby(day.to_numpy()).sum()
    d0 = (pd.Timestamp("1996-01-01") - pd.Timestamp("1970-01-01")).days
    d1 = (pd.Timestamp("1996-12-31") - pd.Timestamp("1970-01-01")).days
    x = [int(daily.get(d, 0)) for d in range(d0, d1 + 1)]
    n = len(x)
    sx = [0] * (n + 1)
    sxx = [0] * (n + 1)
    for i, v in enumerate(x, 1):
        sx[i] = sx[i - 1] + v
        sxx[i] = sxx[i - 1] + v * v
    BETA = 3_000_000
    INF = float("inf")
    f = [0] + [INF] * n
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        cands = [
            f[i] + sxx[j] - sxx[i] - (sx[j] - sx[i]) ** 2 // (j - i) + BETA
            for i in range(j)
        ]
        mn = min(cands)
        f[j] = mn
        bp[j] = cands.index(mn)
    segs = []
    e = n
    while e > 0:
        s0 = bp[e]
        segs.append((d0 + s0, d0 + e - 1, e - s0,
                     (sx[e] - sx[s0]) // (e - s0)))
        e = s0
    segs.sort()
    out = [(r["seg_start_day"], r["seg_end_day"], r["n_days"], r["mean_kd"])
           for r in _fn("optimal_partition_changepoints")(
               spark, sf_dir).collect()]
    assert out == segs
    # beta is tuned for a multi-segment optimum at the sf0.01 gate; at
    # sf0.001 the series is too quiet to beat the penalty (1 segment)
    if "sf0.01" in sf_dir or "sf0.1" in sf_dir:
        assert len(out) >= 2


def test_weighted_interval_matches_python_dp(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    ship = li.groupby("l_orderkey")["l_shipdate"].max()
    m = o.join(ship, on="o_orderkey", how="inner")
    sd = (m["o_orderdate"].dt.floor("D").astype("datetime64[s]")
          .astype(np.int64) // 86400)
    ed = (m["l_shipdate"].dt.floor("D").astype("datetime64[s]")
          .astype(np.int64) // 86400)
    w = (np.floor(m["o_totalprice"].to_numpy() * 100 + 0.5)
         .astype(np.int64) // 1000)
    df = pd.DataFrame({"cust": m["o_custkey"].to_numpy(),
                       "lo": np.minimum(sd, ed).to_numpy(),
                       "hi": np.maximum(sd, ed).to_numpy(), "w": w})
    best = {}
    for cust, g in df.groupby("cust"):
        its = sorted(zip(g["hi"], g["lo"], g["w"]))
        n = len(its)
        M = [0] * (n + 1)
        for i in range(1, n + 1):
            hi_i, lo_i, w_i = its[i - 1]
            p = sum(1 for j in range(i - 1) if its[j][0] < lo_i)
            M[i] = max(M[i - 1], int(w_i) + M[p])
        best[int(cust)] = (n, M[n])
    want = sorted(best.items(), key=lambda kv: (-kv[1][1], kv[0]))[:15]
    out = [(r["custkey"], r["n_orders"], r["best_value_kc"])
           for r in _fn("weighted_interval_schedule")(
               spark, sf_dir).collect()]
    assert out == [(c, n, v) for c, (n, v) in want]
    # the DP dominates any single interval's weight per customer
    for c, (n, v) in want:
        assert v >= int(df[df["cust"] == c]["w"].max())


def test_join_order_advisor_matches_python(spark, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    n_c, n_o, n_l = len(c), len(o), len(li)
    d_c = c["c_custkey"].nunique()
    d_ock, d_ook = o["o_custkey"].nunique(), o["o_orderkey"].nunique()
    d_lok = li["l_orderkey"].nunique()
    co_i = n_c * n_o // max(d_c, d_ock)
    co_f = co_i * n_l // max(d_ook, d_lok)
    ol_i = n_o * n_l // max(d_ook, d_lok)
    ol_f = ol_i * n_c // max(d_c, d_ock)
    best = min(co_i + co_f, ol_i + ol_f)
    out = {r["plan"]: (r["est_intermediate"], r["est_final"],
                       r["est_cost"], r["is_winner"])
           for r in _fn("join_order_advisor")(spark, sf_dir).collect()}
    assert out["co_then_l"] == (co_i, co_f, co_i + co_f,
                                int(co_i + co_f == best))
    assert out["ol_then_c"] == (ol_i, ol_f, ol_i + ol_f,
                                int(ol_i + ol_f == best))
    # sanity: the final-size estimates agree (commutativity of the
    # Selinger formula up to integer-division order)
    assert abs(out["co_then_l"][1] - out["ol_then_c"][1]) <= max(
        out["co_then_l"][1], 1) // 100


# ---------------------------------------------------------------------------
# Round-10 LIVE additions (registered mid-round after the wave flip)
# ---------------------------------------------------------------------------


def test_recursive_cte_hierarchy_matches_python(spark, sf_dir):
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_retailprice"])
    cents = {int(k): round(v * 100)
             for k, v in zip(p.p_partkey, p.p_retailprice)}
    # depth of k in the quad-tree parent(k) = (k-1)//4, root 0
    depth = {0: 0}

    def d(k):
        if k not in depth:
            depth[k] = d((k - 1) // 4) + 1
        return depth[k]

    want = {}
    for k in cents:
        lv = d(int(k))
        n, sc, sk = want.get(lv, (0, 0, 0))
        want[lv] = (n + 1, sc + int(cents[k]), sk + int(k))
    out = {r["depth"]: (r["n_parts"], r["sum_cents"], r["sum_key"])
           for r in _fn("recursive_cte_part_hierarchy")(spark, sf_dir)
           .collect()}
    assert out == want


def test_sql_udf_score_matches_python_and_stays_jvm_side(spark, sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for _, r in d.iterrows():
        t = r["text"]
        score = (100 * (len(t) - len(t.replace(" ", "")) + 1)
                 - 17 * (len(t) - len(t.replace(",", "")))
                 - 23 * (len(t) - len(t.replace(".", "")))
                 + int(r["n_chars"]))
        n, s, mn, mx = want.get(r["lang"], (0, 0, None, None))
        want[r["lang"]] = (n + 1, s + score,
                           score if mn is None else min(mn, score),
                           score if mx is None else max(mx, score))
    df = _fn("sql_udf_quality_score")(spark, sf_dir)
    out = {r["lang"]: (r["n_docs"], r["sum_score"], r["min_score"],
                       r["max_score"]) for r in df.collect()}
    assert out == want
    # the SQL UDF must be macro-inlined: no Python evaluation node
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lateral_topk_matches_pandas(spark, sf_dir):
    n = pd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    c["bal_cents"] = (c.c_acctbal * 100).round().astype("int64")
    want = []
    for _, nr in n.sort_values("n_name").iterrows():
        sub = c[c.c_nationkey == nr.n_nationkey].sort_values(
            ["bal_cents", "c_custkey"], ascending=[False, True]).head(3)
        want += [(nr.n_name, int(r.c_custkey), int(r.bal_cents))
                 for _, r in sub.iterrows()]
    out = [(r["n_name"], r["c_custkey"], r["bal_cents"])
           for r in _fn("lateral_topk_acctbal")(spark, sf_dir).collect()]
    assert out == want


def test_collation_grouping_matches_pandas(spark, sf_dir):
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_type", "p_brand"])
    base = p.p_type + " " + p.p_brand
    v = base.where(p.p_partkey % 3 == 0,
                   base.str.upper().where(p.p_partkey % 3 == 1,
                                          base.str.lower()))
    g = pd.DataFrame({"s": v, "l": v.str.lower()}).groupby("l")["s"]
    want = {grp.min().lower(): (len(grp), grp.nunique())
            for _, grp in g}
    out = {r["grp"]: (r["n_rows"], r["n_variants"])
           for r in _fn("collation_lcase_grouping")(spark, sf_dir)
           .collect()}
    assert out == want


def test_temperature_weights_exact_isqrt_and_sum(spark, sf_dir):
    import math

    d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    counts = d.lang.value_counts().to_dict()
    s = {k: math.isqrt(v) for k, v in counts.items()}
    ts = sum(s.values())
    base = {k: (1_000_000 * v) // ts for k, v in s.items()}
    rem = {k: (1_000_000 * v) % ts for k, v in s.items()}
    leftover = 1_000_000 - sum(base.values())
    for k in sorted(rem, key=lambda k: (-rem[k], k))[:leftover]:
        base[k] += 1
    out = {r["lang"]: (r["n_docs"], r["isqrt_n"], r["w_ppm"])
           for r in _fn("temperature_mixture_weights")(spark, sf_dir)
           .collect()}
    assert out == {k: (counts[k], s[k], base[k]) for k in counts}
    assert sum(w for _, _, w in out.values()) == 1_000_000


def test_udtf_sessions_matches_python(spark, sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts"])
    e["us"] = e.ts.astype("datetime64[us]").astype("int64")
    gap = 1_800_000_000
    want = {}
    for uid, grp in e.groupby("user_id"):
        uss = sorted(grp.us)
        sessions = []
        start = prev = uss[0]
        n = 1
        for us in uss[1:]:
            if us - prev > gap:
                sessions.append((n, prev - start))
                start = us
                n = 0
            n += 1
            prev = us
        sessions.append((n, prev - start))
        want[int(uid)] = (len(sessions), len(uss),
                          max(x for x, _ in sessions),
                          max(x for _, x in sessions))
    out = {r["user_id"]: (r["n_sessions"], r["n_events"],
                          r["max_session_events"],
                          r["max_session_span_us"])
           for r in _fn("udtf_table_partition_sessions")(spark, sf_dir)
           .collect()}
    assert out == want


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_entity_resolution_matches_python(spark, sf_dir):
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_name", "p_brand",
                                 "p_retailprice"])
    rows = {}
    for _, r in p.iterrows():
        k = int(r.p_partkey)
        s = f"{r.p_name} {r.p_brand}"
        d = s
        if k % 7 == 0:
            pos = 1 + _h60(f"{s}#{k}") % len(s)
            d = s[:pos - 1] + s[pos:]
        rows[k] = (d, round(r.p_retailprice * 100))
    from collections import defaultdict

    blocks = defaultdict(list)
    for k, (d, _) in rows.items():
        blocks[d.split(" ")[0] + "|" + d[-2:]].append(k)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    matched = set()
    for ks in blocks.values():
        ks.sort()
        for i, ka in enumerate(ks):
            for kb in ks[i + 1:]:
                if _lev(rows[ka][0], rows[kb][0]) <= 2:
                    union(ka, kb)
                    matched |= {ka, kb}
    clusters = defaultdict(list)
    for k in matched:
        clusters[find(k)].append(k)
    want = []
    for comp, ks in clusters.items():
        golden = max(ks, key=lambda k: (rows[k][1], -k))
        want.append((comp, len(ks), len({rows[k][0] for k in ks}),
                     golden, rows[golden][1]))
    want.sort(key=lambda t: (-t[1], t[0]))
    out = [(r["cluster_id"], r["n_members"], r["n_variants"],
            r["golden_partkey"], r["golden_cents"])
           for r in _fn("entity_resolution_golden")(spark, sf_dir)
           .collect()]
    assert out == want[:25]


def test_er_resolve_hot_block_guard(spark):
    """r10 verdict ask #3: a degenerate blocking key must fail loudly
    instead of going silently quadratic; under the cap the operator runs."""
    import pytest

    from gan_deeplearning4j_spark.queries_r10 import er_resolve

    keyed = spark.createDataFrame(
        [(i, 100 + i, "dup entity aa", "dup|aa") for i in range(8)]
        + [(100, 1, "solo thing zz", "solo|zz")],
        "k long, cents long, d string, bk string",
    ).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="max_block=4"):
        er_resolve(keyed, max_block=4)
    # under the cap: the hot block resolves into one 8-member cluster
    out = er_resolve(keyed, max_block=8).collect()
    assert out[0]["n_members"] == 8 and out[0]["golden_partkey"] == 7
    # guard disabled: identical result (the stress-harness path)
    assert er_resolve(keyed, max_block=None).collect() == out


def test_sssp_weighted_matches_python_bf(spark, sf_dir):
    from collections import Counter, defaultdict
    from itertools import combinations

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    per_order = li.drop_duplicates().groupby("l_orderkey")["l_partkey"]
    pc = Counter()
    for _, parts in per_order:
        for x, y in combinations(sorted(parts), 2):
            pc[(x, y)] += 1
    adj = defaultdict(dict)
    for (x, y), cnt in pc.items():
        if cnt >= 2:
            w = 1 + 1000 // cnt
            adj[x][y] = w
            adj[y][x] = w
    hub = min(adj, key=lambda n: (-len(adj[n]), n))
    dist = {hub: 0}
    frontier = {hub: 0}
    for _ in range(8):
        nxt = {}
        for u, du in frontier.items():
            for v, w in adj[u].items():
                nd = du + w
                if nd < nxt.get(v, float("inf")):
                    nxt[v] = nd
        improved = {v: d for v, d in nxt.items()
                    if d < dist.get(v, float("inf"))}
        if not improved:
            break
        dist.update(improved)
        frontier = improved
    want = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    out = [(r["node"], r["dist"])
           for r in _fn("sssp_weighted_hub")(spark, sf_dir).collect()]
    assert out == [(n, d) for n, d in want]


def test_listagg_matches_pandas(spark, sf_dir):
    r = pd.read_parquet(f"{sf_dir}/region.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = n.merge(r, left_on="n_regionkey", right_on="r_regionkey")
    want = {}
    for rn, grp in j.groupby("r_name"):
        want[rn] = (len(grp), ",".join(sorted(grp.n_name)))
    out = {row["r_name"]: (row["n_nations"], row["nations_csv"])
           for row in _fn("listagg_region_nations")(spark, sf_dir)
           .collect()}
    assert out == want


def test_arrow_argmax_matches_numpy(spark, sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["embedding"])
    col = t.column("embedding").combine_chunks()
    mat = col.values.to_numpy(zero_copy_only=False).reshape(len(col), -1)
    am = mat.argmax(axis=1) + 1
    mx = np.floor(mat.max(axis=1).astype(np.float64)
                  * 1048576.0).astype(np.int64)
    g = pd.DataFrame({"dim": am, "q": mx}).groupby("dim")["q"] \
        .agg(["size", "sum"])
    out = {r["dim"]: (r["n_vecs"], r["sum_max_q20"])
           for r in _fn("arrow_argmax_profile")(spark, sf_dir).collect()}
    assert out == {int(d): (int(r["size"]), int(r["sum"]))
                   for d, r in g.iterrows()}


def test_pipe_syntax_matches_pandas(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    li = li[li.l_quantity < 40]
    pc = (li.l_extendedprice * 100).round().astype("int64")
    dc = (li.l_discount * 100).round().astype("int64")
    g = pd.DataFrame({"f": li.l_returnflag, "pc": pc, "w": pc * dc,
                      "q": li.l_quantity.astype("int64")}).groupby("f")
    want = {f: (len(gg), int(gg.pc.sum()), int(gg.w.sum()),
                int(gg.q.sum())) for f, gg in g}
    out = {r["l_returnflag"]: (r["n_items"], r["gross_cents"],
                               r["disc_weighted"], r["sum_qty"])
           for r in _fn("pipe_syntax_pricing")(spark, sf_dir).collect()}
    assert out == want


def test_parameterized_sql_matches_pandas(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_orderstatus",
                                 "o_orderdate", "o_totalprice"])
    o = o[(o.o_orderstatus == "F")
          & (o.o_orderdate < pd.Timestamp("1997-01-01"))]
    cents = (o.o_totalprice * 100).round().astype("int64")
    g = pd.DataFrame({"p": o.o_orderpriority, "c": cents}).groupby("p")
    want = {p: (len(gg), int(gg.c.sum())) for p, gg in g}
    out = {r["o_orderpriority"]: (r["n_orders"], r["cents"])
           for r in _fn("parameterized_sql_binding")(spark, sf_dir)
           .collect()}
    assert out == want


def test_sql_scripting_fold_is_order_sensitive(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o = o[o.o_orderdate.dt.year == 1995]
    cents = (o.o_totalprice * 100).round().astype("int64")
    q = o.o_orderdate.dt.quarter
    per_q = {k: int(cents[q == k].sum()) for k in (1, 2, 3, 4)}
    folded = 0
    for k in (1, 2, 3, 4):  # the loop order IS the semantics
        folded = 2 * folded + per_q[k]
    row = _fn("sql_scripting_compound")(spark, sf_dir).collect()[0]
    assert (row["folded_cents"], row["n_orders_1995"]) == (folded, len(o))
    # order sensitivity: any other quarter order disagrees (unless all
    # quarters are empty, which no SF exhibits)
    alt = 0
    for k in (4, 3, 2, 1):
        alt = 2 * alt + per_q[k]
    assert folded != alt


def test_deletion_cascade_matches_pandas(spark, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    cohort = c[[_h60(f"del|{k}") % 50 == 0 for k in c.c_custkey]]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderkey", "o_totalprice"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    n = pd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    oo = cohort.merge(o, left_on="c_custkey", right_on="o_custkey")
    oo["cents"] = (oo.o_totalprice * 100).round().astype("int64")
    ll = oo.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    ee = cohort.merge(ev, left_on="c_custkey", right_on="user_id")
    want = {}
    for nk, grp in cohort.groupby("c_nationkey"):
        name = n[n.n_nationkey == nk].n_name.iloc[0]
        og = oo[oo.c_nationkey == nk]
        want[name] = (len(grp), len(og),
                      len(ll[ll.c_nationkey == nk]),
                      len(ee[ee.c_nationkey == nk]),
                      int(og.cents.sum()))
    out = {r["n_name"]: (r["n_customers"], r["n_orders"], r["n_lineitems"],
                         r["n_events"], r["frozen_cents"])
           for r in _fn("deletion_cascade_impact")(spark, sf_dir)
           .collect()}
    assert out == want


def test_bitmap_distinct_matches_pandas(spark, sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "user_id"])
    g = e.groupby("event_type")["user_id"]
    want = {t: (len(gg), gg.nunique()) for t, gg in g}
    out = {r["event_type"]: (r["n_events"], r["n_users"])
           for r in _fn("bitmap_distinct_users")(spark, sf_dir).collect()}
    assert out == want


def _luhn_rem(acct):
    total = 0
    for i, ch in enumerate(acct):          # i = 0-based, position 12-i
        d = int(ch)
        if (12 - (i + 1)) % 2 == 0:
            total += d
        else:
            total += 2 * d - 9 if 2 * d > 9 else 2 * d
    return total % 10


def test_luhn_audit_matches_python(spark, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    want = {}
    for _, r in c.iterrows():
        acct = str(r.c_custkey * 37 + r.c_custkey % 10).zfill(12)
        rem = _luhn_rem(acct)
        n, v, s = want.get(r.c_nationkey, (0, 0, 0))
        want[int(r.c_nationkey)] = (n + 1, v + (rem == 0), s + rem)
    out = {r["nationkey"]: (r["n_accounts"], r["n_valid"], r["sum_rem"])
           for r in _fn("luhn_checksum_audit")(spark, sf_dir).collect()}
    assert out == want
    # cross-check: the builtin luhn_check agreed with the replayed
    # remainder on every row (n_valid counts ok=true, sum_rem counts the
    # arithmetic) — a disagreement would break the equality above
