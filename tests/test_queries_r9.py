"""Round-9 staged-query pins: pure-python replays (hash parity is covered
by the gated replica runs; these pin the SEMANTICS against an independent
reimplementation)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# import order matters: queries_r9 is re-entered by queries.py's bottom
import gan_deeplearning4j_spark.queries  # noqa: F401
from gan_deeplearning4j_spark.queries_r9 import STAGED


def _fn(name):
    return STAGED[name][0]


def _rot(n, x, y, rx, ry):
    if ry == 0:
        if rx == 1:
            x, y = n - 1 - x, n - 1 - y
        x, y = y, x
    return x, y


def _xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rot(n, x, y, rx, ry)
        s //= 2
    return d


def test_hilbert_audit_matches_reference_curve(spark, sf_dir):
    """The unrolled bit-arithmetic Hilbert index equals the canonical
    xy2d (true Hilbert: consecutive indices are unit grid steps), and the
    query's cluster totals equal a python sweep of all 225 windows."""
    n = 64
    d2xy = {}
    for x in range(n):
        for y in range(n):
            d2xy[_xy2d(n, x, y)] = (x, y)
    assert len(d2xy) == n * n
    assert all(
        abs(d2xy[i][0] - d2xy[i + 1][0]) + abs(d2xy[i][1] - d2xy[i + 1][1])
        == 1
        for i in range(n * n - 1)
    )

    def zorder(x, y):
        d = 0
        for b in range(6):
            d |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return d

    curves = {
        "hilbert": lambda x, y: _xy2d(n, x, y),
        "zorder": zorder,
        "rowmajor": lambda x, y: y * n + x,
    }
    want = {}
    for name, c in curves.items():
        total = 0
        for qx in range(0, n - 8 + 1, 4):
            for qy in range(0, n - 8 + 1, 4):
                idx = sorted(
                    c(x, y)
                    for x in range(qx, qx + 8)
                    for y in range(qy, qy + 8)
                )
                total += 1 + sum(
                    1 for i in range(1, len(idx)) if idx[i] != idx[i - 1] + 1
                )
        want[name] = total
    out = _fn("hilbert_order_audit")(spark, sf_dir).toPandas()
    got = dict(zip(out["curve"], out["total_clusters"]))
    assert got == want
    assert (out["n_distinct_indexes"] == 4096).all()
    # the audit's point: hilbert needs fewer scan ranges than z-order
    assert got["hilbert"] < got["zorder"] < got["rowmajor"]


def test_unigram_viterbi_dominates_greedy_wordpiece(spark, sf_dir):
    """Global-optimality pin: for every word, the Viterbi best score is
    >= the unigram score of the greedy WordPiece segmentation (same
    vocabulary, same piece scores) — exactly where greedy loses."""
    wp = _fn("wordpiece_tokenize_fixed")(spark, sf_dir).toPandas()
    ug = _fn("unigram_lm_segment_fixed")(spark, sf_dir).toPandas()
    # rebuild the shared vocab + scores in python
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    import re

    words = sorted(
        {
            t
            for text in docs["text"]
            for t in text.split(" ")
            if re.fullmatch(r"[a-z]{2,12}", t)
        }
    )
    occ: dict[str, int] = {}
    for w in words:
        for ln in (1, 2, 3):
            for i in range(len(w) - ln + 1):
                g = w[i:i + ln]
                occ[g] = occ.get(g, 0) + 1
    bg = sorted(
        ((g, c) for g, c in occ.items() if len(g) == 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:15]
    tg = sorted(
        ((g, c) for g, c in occ.items() if len(g) == 3),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    vocab = {g for g in occ if len(g) == 1}
    vocab |= {g for g, _ in bg} | {g for g, _ in tg}
    score = {g: 1000 * len(g) + occ[g].bit_length() for g in vocab}

    best = dict(zip(ug["word"], ug["best_score"]))
    assert set(best) == set(words)
    for _, row in wp.iterrows():
        pieces = [p for p in row["pieces"].split("|") if p]
        assert "".join(pieces) == row["word"]
        assert all(p in vocab for p in pieces)
        greedy_score = sum(score[p] for p in pieces)
        assert greedy_score <= best[row["word"]], row["word"]


def test_knapsack_matches_python_dp(spark, sf_dir):
    """The engine-side 201-cell DP fold equals a python 0/1 knapsack."""
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    top = part.sort_values(
        ["p_retailprice", "p_partkey"], ascending=[False, True]
    ).head(30)
    items = [
        (int(w), int(np.floor(v + 0.5)))   # SQL round: half-away-from-zero
        for w, v in zip(top["p_size"], top["p_retailprice"])
    ]
    dp = [0] * 201
    for w, v in items:
        dp = [
            max(dp[c], dp[c - w] + v) if c >= w else dp[c]
            for c in range(201)
        ]
    out = _fn("knapsack_budget_parts")(spark, sf_dir).collect()[0]
    assert (out["best_value_50"], out["best_value_100"],
            out["best_value_200"]) == (dp[50], dp[100], dp[200])


def test_croston_matches_python_fold(spark, sf_dir):
    """Two interleaved e3-integer SES streams, python-replayed with the
    same trunc-toward-zero division."""
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"]
    )
    d = li[li["l_quantity"] == 50]
    days = (
        d["l_shipdate"].astype("datetime64[us]").dt.normalize()
        .value_counts().sort_index()
    )
    epoch = pd.Timestamp("1970-01-01")
    series = [((idx - epoch).days, int(x)) for idx, x in days.items()]
    z = series[0][1] * 1000
    p = 1000
    for (d0, _x0), (d1, x1) in zip(series, series[1:]):
        gap = d1 - d0
        z = z + int((x1 * 1000 - z) / 5)   # trunc toward zero
        p = p + int((gap * 1000 - p) / 5)
    out = _fn("croston_intermittent_demand")(spark, sf_dir).collect()[0]
    assert out["n_demand_days"] == len(series)
    assert (out["z_hat_e3"], out["p_hat_e3"]) == (z, p)
    assert out["rate_e3"] == z * 1000 // p


def test_kmv_set_ops_matches_hashlib(spark, sf_dir):
    """Bottom-k estimates replayed with python hashlib md5."""
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_returnflag", "l_linestatus"],
    )

    def h(k):
        return int(
            hashlib.md5(f"p{k}".encode()).hexdigest()[:13], 16
        )

    a = {h(k) for k in li.loc[li["l_returnflag"] == "R", "l_partkey"]}
    b = {h(k) for k in li.loc[li["l_linestatus"] == "O", "l_partkey"]}
    ska, skb = set(sorted(a)[:64]), set(sorted(b)[:64])
    sku = sorted(ska | skb)[:64]
    kth, k = sku[-1], len(sku)
    est_union = (k - 1) * 2**52 // kth
    m = sum(1 for x in sku if x in ska and x in skb)
    out = _fn("kmv_set_ops_estimate")(spark, sf_dir).collect()[0]
    assert (out["k"], out["sketch_overlap"]) == (k, m)
    assert out["est_union"] == est_union
    assert out["est_inter"] == m * est_union // k
    # the estimates are in the right ballpark of the exact answers
    assert abs(out["est_union"] - out["exact_union"]) <= out["exact_union"]


def test_wav_zcr_matches_formula_replay(spark, sf_dir):
    """Per-frame zero-crossing counts and peaks equal a numpy replay of
    the md5 sample formula — certifying the codec roundtrip preserves
    sample ORDER (energy alone is permutation-blind)."""
    out = _fn("wav_zcr_frames")(spark, sf_dir).toPandas()
    rows = []
    for clip in range(32):
        v = np.array(
            [
                int(
                    hashlib.md5(f"wav|{clip}|{i}".encode()).hexdigest()[:15],
                    16,
                )
                % 65536
                - 32768
                for i in range(800)
            ],
            dtype=np.int64,
        ).reshape(-1, 160)
        flips = ((v[:, :-1] >= 0) != (v[:, 1:] >= 0)).sum(axis=1)
        peak = np.abs(v).max(axis=1)
        for fr in range(v.shape[0]):
            rows.append((clip, fr, int(flips[fr]), int(peak[fr])))
    want = pd.DataFrame(rows, columns=["clip", "frame_no", "zcr", "peak"])
    got = out.sort_values(["clip", "frame_no"]).reset_index(drop=True)
    assert got.equals(want)


def test_greedy_max_coverage_matches_python(spark, sf_dir):
    """5-round submodular greedy replayed in python over the same
    top-60-bigram masks (ties by count desc then gram, then doc_id)."""
    import re

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cnt: dict[str, int] = {}
    doc_grams: dict[int, list[str]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = [t for t in text.split(" ")
              if re.fullmatch(r"[a-z]{2,12}", t)]
        gs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        doc_grams[int(did)] = gs
        for g in gs:
            cnt[g] = cnt.get(g, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:60]
    wid = {g: i for i, (g, _c) in enumerate(top)}
    masks = {
        did: sum(1 << wid[g] for g in {g for g in gs if g in wid})
        for did, gs in doc_grams.items()
        if any(g in wid for g in gs)
    }
    covered, picked, want = 0, set(), []
    for rnd in range(1, 6):
        best = max(
            ((did, m) for did, m in masks.items() if did not in picked),
            key=lambda dm: (bin(dm[1] | covered).count("1"), -dm[0]),
        )
        gain = bin(best[1] | covered).count("1") - bin(covered).count("1")
        covered |= best[1]
        picked.add(best[0])
        want.append((rnd, best[0], gain, bin(covered).count("1")))
    out = [tuple(r) for r in
           _fn("greedy_max_coverage")(spark, sf_dir).collect()]
    assert out == want


def test_gonzalez_kcenter_matches_numpy(spark, sf_dir):
    """Farthest-first traversal replayed with numpy int64 distances."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    X = np.floor(
        np.stack(emb["embedding"].to_numpy()[order]).astype(np.float64)
        * 1024
    ).astype(np.int64)
    centers = [0]                      # index of min vec_id
    want = [(1, int(ids[0]), 0)]
    mind = ((X - X[0]) ** 2).sum(axis=1)
    for rnd in range(2, 6):
        # argmax of (d2 desc, vec_id asc): ids sorted asc -> first argmax
        best = int(np.argmax(mind))
        want.append((rnd, int(ids[best]), int(mind[best])))
        centers.append(best)
        if rnd < 5:
            nd = ((X - X[best]) ** 2).sum(axis=1)
            mind = np.minimum(mind, nd)
    out = [tuple(r) for r in
           _fn("gonzalez_kcenter_fixed")(spark, sf_dir).collect()]
    assert out == want


def test_token_bucket_matches_python_fold(spark, sf_dir):
    """Admission decisions replayed in python with the same integer
    micro-token arithmetic (capacity 5, cost 1, refill 1/10s)."""
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    want = {}
    for uid, g in ev.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        tokens, admitted = 5_000_000, 0
        prev = None
        for t in g["ts_us"]:
            dt = 0 if prev is None else int(t - prev)
            prev = t
            tokens = min(5_000_000, tokens + dt // 10)
            if tokens >= 1_000_000:
                tokens -= 1_000_000
                admitted += 1
        want[int(uid)] = (len(g), admitted, len(g) - admitted, tokens)
    out = _fn("token_bucket_admissions")(spark, sf_dir).collect()
    got = {
        r["user_id"]: (r["n_events"], r["n_admitted"], r["n_denied"],
                       r["tokens_left_micro"])
        for r in out
    }
    assert got == want
