"""Money/fixed-point conversion helpers.

The house integer-cents surrogate (``CAST(round(x * 100) AS BIGINT)``
before any SUM) exists because floor(SUM(double)*100) hits ulp
boundaries across engines while per-row integer cents make the sum
order-free (verify-skill gotcha, r4). Spark routes double ``round``
through a per-row BigDecimal shortest-decimal conversion, so the round
costs more than the scan on money-heavy aggregates (r13 measurement:
tpch_q1's aggregate 1.28 -> 0.46 s at sf0.1 with the codegen floor
form). These helpers centralize the swap and make its proof obligation
structural (r13 verdict ask #5 / advice: "a shared sign-asserting
helper").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_nonneg(expr: Column | str) -> Column:
    """Integer cents of a NONNEGATIVE money expression:
    ``floor(x*100 + 0.5)`` — codegen-native, measured 2.5-3x faster than
    ``round(x*100, 0)`` (which goes through a per-row BigDecimal) and
    value-identical to half-away-from-zero round on the nonnegative
    sub-2^52 money grid. (Strictly: for an arbitrary double, the +0.5
    addition could round-to-even across a half-ulp tie where round()
    would not — astronomically unlikely on 2-decimal money values and
    pinned by the DuckDB oracles, which keep the round() form, hashing
    identically at every SF.)

    The nonnegativity obligation is enforced, not assumed: a negative
    input raises at runtime (the guard is a codegen branch, measured
    free next to the floor). floor(+0.5) differs from round on
    negatives — floor(-2.0) = -2 but round(-2.5) = -3 — so signed
    columns (c_acctbal, s_acctbal, deltas) must use ``cents_signed``.
    """
    c = F.col(expr) if isinstance(expr, str) else expr
    # NULL passes through (round(NULL*100) is NULL too); only a real
    # negative value trips the guard
    guarded = F.when(c.isNull() | (c >= 0), c).otherwise(
        F.raise_error(F.lit(
            "cents_nonneg: negative value — use cents_signed for signed "
            "money columns (floor(x*100+0.5) != round(x*100) on negatives)"
        ))
    )
    return F.floor(guarded * 100 + F.lit(0.5))


def cents_signed(expr: Column | str) -> Column:
    """Integer cents of a possibly-negative money expression: the exact
    half-away-from-zero ``round(x*100)`` (BigDecimal path — slower, but
    correct for any sign; the oracles' round() replays it exactly)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.round(c * 100, 0).cast("long")
