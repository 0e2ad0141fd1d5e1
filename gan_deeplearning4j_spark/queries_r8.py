"""Round-8 staged queries — written during round 7, registered in round 8.

Same staging pattern as queries_r7 (see its module docstring): the round-7
driver window is pinned to the current never-green prefix (the 20 round-7
entries), so anything new written this round stays behind ``SPARK_GRAFT_R8=1``
until CORRECTNESS_r07 lands and round 8 makes registration unconditional.

Local verification (identical gates to registered queries):

    SPARK_GRAFT_R8=1 python scripts/driver_replica.py <names...>
    SPARK_GRAFT_R8=1 python scripts/check_parity.py <names...>
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

# name -> (fn, oracle, headline, doc); materialized into the real registry
# by register_all() (round 8) or under SPARK_GRAFT_R8=1 (round-7 local
# verification).
STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str | None = None, headline: bool = False,
           doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        STAGED[name] = (fn, oracle, headline, doc)
        return fn
    return deco


def register_all() -> None:
    """Flip the staged queries into the live registry (round 8)."""
    from .queries import register

    for name, (fn, oracle, headline, doc) in STAGED.items():
        register(name, oracle=oracle, headline=headline, doc=doc)(fn)
