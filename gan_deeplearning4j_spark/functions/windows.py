"""Window-spec helpers.

``bounded_window`` exists for one reason: a window with an empty partition
spec makes WindowExec log ``No Partition Defined ... serious performance
degradation`` on every execution.  This engine uses partition-less windows
ONLY over deliberately bounded relations — top-k candidate sets, histogram
grids of fixed cardinality, per-group aggregates whose group count is a
constant of the query — where the single-partition exchange is the intended
(and correct) plan.  At 100 TB the warning is indistinguishable in the logs
from a genuinely missing partition key on a fact-sized window, so the
bounded sites declare their intent through this helper instead: it
partitions by a non-foldable constant (``spark_partition_id() * 0`` — zero
for every row, non-nullable, and immune to ConstantFolding, unlike
``lit(0)``, which the optimizer strips right back to an empty spec).  The
physical layout is identical — every row hashes to the same partition —
but the plan says so on purpose and the log stays clean.

NEVER use this on a scale-growing relation; that is exactly the bug the
warning exists to flag.  A WindowSpec cannot see the relation it will run
over, so the helper cannot self-enforce that contract — callers that build
the bounded relation dynamically (anything that is not a literal grid /
top-k / per-group rollup with a constant group count) should pass it as
``probe=`` so the guard fails loudly instead of serializing a fact-sized
relation through one task (same O(max_rows) ``limit(n+1).count()`` pattern
as ``operators.relational.assert_small``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, WindowSpec, Window
from pyspark.sql import functions as F

#: Default bound for ``probe=``: generous for every legitimate use of a
#: single-partition window (top-k candidates, histogram grids, per-group
#: rollups) and far below anything fact-sized.
DEFAULT_MAX_ROWS = 100_000


def all_rows_key():
    """Non-foldable constant 0: one partition for every row, no warning."""
    return F.spark_partition_id() * F.lit(0)


def bounded_window(
    *order,
    probe: DataFrame | None = None,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> WindowSpec:
    """``Window.orderBy(*order)`` (or the bare all-rows spec when no order
    columns are given) over a BOUNDED relation, minus the WindowExec
    warning. Chain ``.rowsBetween``/``.rangeBetween`` as usual.

    Pass the relation as ``probe=`` to enforce the boundedness contract at
    runtime: raises ``ValueError`` if it holds more than ``max_rows`` rows.
    The probe is ``limit(max_rows+1).count()`` — O(max_rows) regardless of
    table size, so it is safe to leave on in production paths whose input
    size is not a static property of the query."""
    if probe is not None:
        n = probe.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"bounded_window: probed relation exceeds {max_rows} rows "
                f"({n}+ found) — a single-partition window over it would "
                "serialize the whole relation through one task; partition "
                "by a real key or pre-aggregate first"
            )
    spec = Window.partitionBy(all_rows_key())
    return spec.orderBy(*order) if order else spec
