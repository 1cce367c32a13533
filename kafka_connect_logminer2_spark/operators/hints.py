"""Size-gated join hints.

An unconditional ``F.broadcast`` on a relation that grows with the data
(part/supplier/customer — anything but a fixed-cardinality dimension like
nation/region) is a 100 TB scale-killer: the hint OVERRIDES Catalyst's
size-based strategy choice, so the plan that broadcast a 3 MB slice at
test scale ships a 20-billion-row build side to every executor at
production scale and OOMs exactly when it matters.

``broadcast_if_small`` keeps the best of both: at test/benchmark scale the
hint still fires (so plan audits can pin the all-broadcast star shape),
while past the byte threshold the relation is left unhinted and Catalyst
picks a shuffle join. The estimate is Catalyst's own optimized-plan
``sizeInBytes`` — derived from file sizes with column pruning applied, no
job is run, and it is exactly the quantity ``autoBroadcastJoinThreshold``
would later compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Comfortably above every fixture/benchmark relation, far below any
# SF-proportional table at real scale. (Spark's hard broadcast limit is
# 8 GB; sane production practice is well under 1 GB.)
DEFAULT_MAX_BROADCAST_BYTES = 256 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df``'s optimized plan (bytes). Pure
    planning — analysis + optimizer rules run, but no Spark job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def broadcast_if_small(
    df: DataFrame, max_bytes: int = DEFAULT_MAX_BROADCAST_BYTES
) -> DataFrame:
    """``F.broadcast(df)`` when Catalyst estimates the optimized plan at or
    under ``max_bytes``; ``df`` unchanged (statistics-driven join strategy)
    otherwise. Use for every hinted relation whose cardinality scales with
    the data; fixed dims (nation/region) may keep the unconditional hint."""
    if plan_size_bytes(df) <= max_bytes:
        return F.broadcast(df)
    return df
