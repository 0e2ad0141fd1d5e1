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
warning exists to flag.
"""

from __future__ import annotations

from pyspark.sql import WindowSpec, Window
from pyspark.sql import functions as F


def all_rows_key():
    """Non-foldable constant 0: one partition for every row, no warning."""
    return F.spark_partition_id() * F.lit(0)


def bounded_window(*order) -> WindowSpec:
    """``Window.orderBy(*order)`` (or the bare all-rows spec when no order
    columns are given) over a BOUNDED relation, minus the WindowExec
    warning. Chain ``.rowsBetween``/``.rangeBetween`` as usual."""
    spec = Window.partitionBy(all_rows_key())
    return spec.orderBy(*order) if order else spec
