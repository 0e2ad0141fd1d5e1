"""Round-6 query pins: python replays and guarantee checks for the
queries_r6 oracle promotions (DuckDB hash parity itself is covered by
tests/test_oracle_parity.py / scripts/driver_replica.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gan_deeplearning4j_spark.queries import REGISTRY


def _emb(sf_dir):
    t = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    ids = t["vec_id"].to_numpy()
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    return ids, np.floor(x * (1 << 20)).astype(np.int64)


def test_ivf_fixed_topk_matches_numpy_replay(spark, sf_dir):
    """The distributed assign+probe+scan equals a plain-numpy replay of the
    same coarse centroids in exact int64."""
    from gan_deeplearning4j_spark.operators.similarity import (
        ivfpq_fixed_reference,
    )

    out = (
        REGISTRY["ivf_fixed_topk"].fn(spark, sf_dir)
        .toPandas().sort_values(["query_id", "l2_fixed", "vec_id"])
    )
    ids, xq = _emb(sf_dir)
    coarse = np.asarray(ivfpq_fixed_reference(dim=64, n_centroids=8)[0],
                        dtype=np.int64)
    dc = ((xq[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    cid = dc.argmin(axis=1)
    for qpos in range(4):
        qid = ids[qpos]
        probes = np.argsort(dc[qpos], kind="stable")[:3]
        mask = np.isin(cid, probes)
        d = ((xq[mask] - xq[qpos][None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids[mask], d))[:5]
        want = list(zip(ids[mask][order], d[order]))
        got = out[out["query_id"] == qid][["vec_id", "l2_fixed"]]
        assert [tuple(r) for r in got.itertuples(index=False)] == [
            (int(a), int(b)) for a, b in want
        ], qid


def test_lsh_fixed_topk_matches_numpy_replay(spark, sf_dir):
    """Band bucketing + exact re-rank equals the numpy replay from the same
    integer planes; candidate sets are non-trivial (neither self-only nor
    the whole corpus)."""
    from gan_deeplearning4j_spark.operators.similarity import lsh_plane_ints

    out = (
        REGISTRY["lsh_fixed_topk"].fn(spark, sf_dir)
        .toPandas().sort_values(["query_id", "l2_fixed", "vec_id"])
    )
    ids, xq = _emb(sf_dir)
    P = np.asarray(lsh_plane_ints(64, 16), dtype=np.int64)
    bits = (xq @ P.T >= 0).astype(np.int64)
    band = np.stack(
        [sum(bits[:, 4 * g + j] << j for j in range(4)) for g in range(4)],
        axis=1,
    )
    for qpos in range(4):
        qid = ids[qpos]
        mask = (band == band[qpos][None, :]).any(axis=1)
        assert 5 < int(mask.sum()) < len(ids), "degenerate candidate set"
        d = ((xq[mask] - xq[qpos][None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids[mask], d))[:5]
        want = [(int(a), int(b)) for a, b in zip(ids[mask][order], d[order])]
        got = out[out["query_id"] == qid][["vec_id", "l2_fixed"]]
        assert [tuple(r) for r in got.itertuples(index=False)] == want, qid
        # self is always its own nearest candidate at distance 0
        assert want[0] == (int(qid), 0)


def test_sketch_brackets_all_within(spark, sf_dir):
    """Every guarantee-bracket verdict bit is TRUE at the test SF — the
    sketches honor their published error contracts (the DuckDB hash
    comparison depends on exactly this)."""
    aq = REGISTRY["approx_quantile_bracket"].fn(spark, sf_dir).toPandas()
    assert aq["within50"].all() and aq["within90"].all()
    assert (aq["lo50_c"] <= aq["hi50_c"]).all()
    ad = REGISTRY["approx_distinct_bracket"].fn(spark, sf_dir).toPandas()
    assert ad["within_parts"].all() and ad["within_supps"].all()
    hh = REGISTRY["heavy_hitters_guarantee"].fn(spark, sf_dir).toPandas()
    assert len(hh) > 0 and hh["in_candidates"].all()
    hm = REGISTRY["hll_merge_bracket"].fn(spark, sf_dir).toPandas()
    assert len(hm) == 5 and hm["within"].all()


def test_heavy_hitters_guarantee_straddles(sf_dir):
    """The cnt>66 threshold splits the user population non-trivially at the
    test SF (some heavy, some not) — the guarantee is only evidence if
    the exact set excludes somebody."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cnt = ev.groupby("user_id").size()
    assert (cnt > 66).any() and (cnt <= 66).any()


def test_approx_quantile_bracket_is_a_real_bracket(spark, sf_dir):
    """The exact rank bracket actually brackets the true median (sanity
    that lo/hi ranks are on the correct side of p*N)."""
    out = REGISTRY["approx_quantile_bracket"].fn(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    cents = (li["l_extendedprice"] * 100).round().astype(np.int64)
    for flag, grp in cents.groupby(li["l_returnflag"]):
        true_p50 = np.sort(grp.to_numpy())[(len(grp) - 1) // 2]
        row = out[out["l_returnflag"] == flag].iloc[0]
        assert row["lo50_c"] <= true_p50 <= row["hi50_c"], flag


def test_bpe_batched_equals_single_merge_rounds(spark, sf_dir):
    """The r6 batched distributed path (batch_window=64) must be
    byte-identical to the classic one-merge-per-job loop (batch_window=1)
    AND to the local sequential reference — merge table and final
    vocabulary both."""
    from gan_deeplearning4j_spark.operators.bpe import train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    m_b, syms_b = train_bpe(
        spark, docs, n_merges=12, driver_finish_rows=0, batch_window=64
    )
    m_1, syms_1 = train_bpe(
        spark, docs, n_merges=12, driver_finish_rows=0, batch_window=1
    )
    m_loc, _ = train_bpe(spark, docs, n_merges=12)  # driver finish
    assert m_b == m_1 == m_loc
    a = sorted(
        (r["word"], r["freq"], tuple(r["syms"])) for r in syms_b.collect()
    )
    b = sorted(
        (r["word"], r["freq"], tuple(r["syms"])) for r in syms_1.collect()
    )
    assert a == b


def test_safe_merge_batch_rules():
    """Unit pins for each _safe_merge_batch safety clause."""
    from gan_deeplearning4j_spark.operators.bpe import _safe_merge_batch

    alpha = set("abcdexyzpq")
    # non-interacting pairs batch; sharing a LEFT symbol is benign
    # (merging (a,b) cannot change cnt(a,c)) so (a,c) is accepted too
    cands = [("a", "b", 10), ("x", "y", 8), ("a", "c", 5)]
    assert _safe_merge_batch(cands, 64, alpha) == cands
    # positional interaction stops the prefix (no skipping): merging
    # (a,b) decreases (b,c) — left symbol b equals an accepted right
    cands = [("a", "b", 10), ("b", "c", 9), ("x", "y", 8)]
    assert _safe_merge_batch(cands, 64, alpha) == [("a", "b", 10)]
    # ...and (c,a) decreases too — right symbol a equals an accepted left
    cands = [("a", "b", 10), ("c", "a", 9), ("x", "y", 8)]
    assert _safe_merge_batch(cands, 64, alpha) == [("a", "b", 10)]
    # C* shrink: last accepted count equals a conflicting tail count —
    # a merge-created pair could tie it, so it must be dropped
    cands = [("a", "b", 10), ("x", "y", 5), ("b", "c", 5)]
    assert _safe_merge_batch(cands, 64, alpha) == [("a", "b", 10)]
    # fused collision with an existing symbol: no batching past it
    assert _safe_merge_batch(
        [("a", "b", 10), ("x", "y", 8)], 64, alpha | {"ab"}
    ) == [("a", "b", 10)]
    # truncated window: unseen pairs bound C* by the last seen count
    cands = [("a", "b", 10), ("x", "y", 10), ("p", "q", 10)]
    assert _safe_merge_batch(cands, 3, alpha) == [("a", "b", 10)]
    # same list with a complete window (no unseen tail): full batch
    assert _safe_merge_batch(cands, 64, alpha) == cands


def test_safe_merge_batch_property_random_corpora():
    """Property guard for the batching proof: on random tiny corpora, a
    pure-python replay of the BATCHED selection loop (pair counts ->
    top-window candidates -> _safe_merge_batch -> apply in rank order)
    must produce the exact merge sequence of sequential BPE
    (_local_train). Exercises alphabet collisions, ties, truncated
    windows, and positional interactions far beyond the unit pins."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gan_deeplearning4j_spark.operators.bpe import (
        _local_merge_word,
        _local_train,
        _safe_merge_batch,
    )

    def batched_train(table, n_merges, window):
        # driver-side replay of train_bpe's distributed batched loop
        alphabet = {s for _w, _f, syms in table for s in syms}
        merges = []
        while len(merges) < n_merges:
            counts = {}
            for _w, freq, s in table:
                for a, b in zip(s, s[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + freq
            if not counts:
                break
            cands = [
                (l, r, c) for (l, r), c in sorted(
                    counts.items(), key=lambda kv: (-kv[1], kv[0])
                )
            ][:window]
            batch = _safe_merge_batch(cands, window, alphabet)[
                : n_merges - len(merges)
            ]
            for left, right, cnt in batch:
                merges.append((len(merges), left, right, cnt))
                alphabet.add(left + right)
                for i, (w, freq, s) in enumerate(table):
                    table[i] = (w, freq, _local_merge_word(s, left, right))
        return merges

    @given(
        words=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=7),
            min_size=1, max_size=12,
        ),
        freqs=st.lists(st.integers(1, 5), min_size=12, max_size=12),
        window=st.sampled_from([2, 4, 64]),
    )
    @settings(max_examples=150, deadline=None)
    def check(words, freqs, window):
        words = sorted(set(words))
        t1 = [(w, freqs[i % 12], list(w)) for i, w in enumerate(words)]
        t2 = [(w, f, list(s)) for w, f, s in t1]
        seq = _local_train(t1, 10, start_rank=0)
        bat = batched_train(t2, 10, window)
        assert bat == seq, (words, window)
        assert t1 == t2  # identical final vocabulary too

    check()


def test_greedy_pack_bins_matches_python_replay(spark, sf_dir):
    """The applyInPandas greedy packer equals a plain-python replay of the
    same recurrence (doc_id order, close-bin-on-overflow, oversized doc
    gets its own bin)."""
    out = (
        REGISTRY["greedy_pack_bins"].fn(spark, sf_dir)
        .toPandas().sort_values("source").reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["tok"] = [
        sum(1 for t in str(x).strip().split() if t) for x in docs["text"]
    ]
    budget = 256
    want = []
    for src, g in docs.sort_values("doc_id").groupby("source"):
        bins = []
        acc = ndocs = 0
        for tok in g["tok"]:
            if ndocs > 0 and acc + tok > budget:
                bins.append((ndocs, acc))
                acc = ndocs = 0
            acc += tok
            ndocs += 1
        if ndocs:
            bins.append((ndocs, acc))
        want.append({
            "source": src,
            "n_bins": len(bins),
            "n_docs": sum(b[0] for b in bins),
            "total_tokens": sum(b[1] for b in bins),
            "max_bin_tokens": max(b[1] for b in bins),
            "fill_ppm": sum(b[1] for b in bins) * 1000000
            // (len(bins) * budget),
        })
    want = pd.DataFrame(want).sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[want.columns].astype("int64", errors="ignore"), want,
        check_dtype=False,
    )
    # every bin except possibly one per source respects the budget only if
    # no single doc exceeds it — with 256 tokens some docs may: assert the
    # packer never SPLITS a doc (token totals conserved)
    assert out["total_tokens"].sum() == docs["tok"].sum()


def test_bom_explosion_rollup_matches_python_replay(spark, sf_dir):
    """The iterative level-join loop equals a pandas walk of the derived
    parent = partkey DIV 10 forest, and covers every part exactly once."""
    out = (
        REGISTRY["bom_explosion_rollup"].fn(spark, sf_dir)
        .toPandas().sort_values("root").reset_index(drop=True)
    )
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    part["cost_c"] = (part["p_retailprice"] * 100).round().astype("int64")
    k = part["p_partkey"].to_numpy()
    depth = np.zeros(len(k), dtype=np.int64)
    root = k.copy()
    cur = k.copy()
    while (cur >= 10).any():
        m = cur >= 10
        cur = np.where(m, cur // 10, cur)
        depth += m.astype(np.int64)
        root = np.where(m | (root >= 10), cur, root)
    rep = pd.DataFrame({"root": cur, "depth": depth, "cost_c": part["cost_c"]})
    want = (
        rep.groupby("root")
        .agg(n_parts=("depth", "size"), max_depth=("depth", "max"),
             total_cost_c=("cost_c", "sum"))
        .reset_index().sort_values("root").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["root", "n_parts", "max_depth", "total_cost_c"]], want,
        check_dtype=False,
    )
    assert out["n_parts"].sum() == len(part)
