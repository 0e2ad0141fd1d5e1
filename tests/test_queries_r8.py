"""Round-8 staged-query pins: pure-python replays (hash parity is covered
by the gated replica runs; these pin the SEMANTICS against an independent
reimplementation)."""

from __future__ import annotations

import pandas as pd

# import order matters: queries_r8 is re-entered by queries.py's bottom
import gan_deeplearning4j_spark.queries  # noqa: F401
from gan_deeplearning4j_spark.queries_r8 import STAGED


def _fn(name):
    return STAGED[name][0]


def test_viterbi_matches_python_dp(spark, sf_dir):
    """The 4-step max-product DP equals a dict-based python replay with
    identical ppm truncation and (score desc, state asc) tie-breaks."""
    out = _fn("viterbi_event_paths")(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans: dict[tuple[str, str], int] = {}
    for _, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    outdeg: dict[str, int] = {}
    for (a, _b), c in trans.items():
        outdeg[a] = outdeg.get(a, 0) + c
    p = {(a, b): c * 1_000_000 // outdeg[a] for (a, b), c in trans.items()}
    counts = ev["event_type"].value_counts()
    start = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    v = {start: 1_000_000}
    want = []
    for k in range(1, 5):
        nv: dict[str, int] = {}
        for (a, b), pp in p.items():
            if a in v:
                s = v[a] * pp // 1_000_000
                if s > nv.get(b, -1):
                    nv[b] = s
        v = nv
        best = sorted(v.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want.append((k, best[0], best[1]))
    got = [(int(r["step"]), r["state"], int(r["score_ppm"]))
           for _, r in out.iterrows()]
    assert got == want
