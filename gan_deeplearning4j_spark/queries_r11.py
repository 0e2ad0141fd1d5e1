"""Round-11 staged queries — written during round 10, registered in round 11.

Same staging pattern as queries_r7/r8/r9/r10 (see their module docstrings):
the round-10 driver window is pinned to the current never-green prefix
(the 17 flipped round-10 entries plus round-10 live additions), so anything
new written this round stays behind ``SPARK_GRAFT_R11=1`` until
CORRECTNESS_r10 lands and round 11 makes registration unconditional.

Local verification (identical gates to registered queries):

    SPARK_GRAFT_R11=1 python scripts/driver_replica.py <names...>
    SPARK_GRAFT_R11=1 python scripts/check_parity.py <names...>
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

# name -> (fn, oracle, headline, doc); materialized into the real registry
# by register_all() (round 11) or under SPARK_GRAFT_R11=1 (round-10 local
# verification).
STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str | None = None, headline: bool = False,
           doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        STAGED[name] = (fn, oracle, headline, doc)
        return fn
    return deco


def register_all() -> None:
    """Register the staged queries (idempotent; see queries_r7)."""
    from .queries import REGISTRY, register

    for name, (fn, oracle, headline, doc) in STAGED.items():
        if name in REGISTRY:
            continue
        register(name, oracle=oracle, headline=headline, doc=doc)(fn)


# Self-register ONLY under the round-11 gate (this module is imported both
# by queries.py under the gate and directly by tests without it).
import os as _os

if _os.environ.get("SPARK_GRAFT_R11"):
    register_all()
