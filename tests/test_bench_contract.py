"""The bench's driver-facing output contract.

The driver keeps only the last ~2000 characters of bench stdout and
json-parses the last line inside that window. BENCH_r01-r08 parsed; the
full diagnostics record outgrew the window when r9 added the isolated
series, and BENCH_r09..r12 all recorded ``"parsed": null`` — the
per-query PERF channel was silently dead for four rounds. Since r13 the
bench prints the full record first and a compact contract line LAST;
these tests pin the compact line's size budget and field semantics so
the channel cannot silently die again.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from gan_deeplearning4j_spark.queries import headline_queries  # noqa: E402

# The driver window is ~2000 chars; the budget leaves headroom for the
# set to keep growing (queries are never removed, only added) plus any
# stray progress-bar bytes sharing the window.
_LINE_BUDGET = 1900


def _full_record(n_queries: int) -> dict:
    """A synthetic full bench record shaped like the real one."""
    names = [f"query_name_of_realistic_length_{i:03d}" for i in range(n_queries)]
    timings = {n: 123.456 for n in names}
    return {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "repeats": 3,
        # diagnostics series that must NOT leak into the compact line
        "queries_isolated_median": timings,
        "queries_exec_only_median": timings,
        "total_exec_only_median": round(sum(timings.values()), 3),
        "sigma": timings,
        "subtotals_median": {"r5_13q": 1.0},
        "noise_ratio": timings,
    }


def test_compact_line_fits_driver_tail_window():
    # current headline set, and 2x it: growth headroom is part of the pin
    n_now = len(headline_queries())
    for n in (n_now, 2 * n_now):
        line = json.dumps(bench.compact_line(_full_record(n)))
        assert len(line) < _LINE_BUDGET, (
            f"compact line {len(line)} chars at {n} queries — the driver "
            "tail window would truncate it (BENCH_r09..r12 regression)"
        )


def test_compact_line_field_contract():
    out = _full_record(19)
    out["errors"] = {"broken_query": "ValueError: something long " * 20}
    c = bench.compact_line(out)
    # exactly the r01-r08 driver-parsed surface (+ repeats/errors, and
    # since r14 the contention-robust exec-only total)
    assert set(c) == {"metric", "value", "unit", "queries", "sf",
                      "repeats", "errors", "total_exec_only_median"}
    assert c["value"] == out["value"]
    assert c["queries"] == out["queries"]
    assert c["sf"] == out["sf"]
    assert c["total_exec_only_median"] == out["total_exec_only_median"]
    # error NAMES only — messages stay in the full record
    assert c["errors"] == ["broken_query"]
    # json round-trip (the driver does json.loads on the line)
    assert json.loads(json.dumps(c)) == c


def test_compact_line_omits_diagnostics_series():
    c = bench.compact_line(_full_record(19))
    for k in ("queries_isolated_median", "queries_exec_only_median",
              "sigma", "subtotals_median", "noise_ratio"):
        assert k not in c
