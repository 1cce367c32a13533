"""Skew mitigation for joins on hot keys (the 100 TB failure mode AQE can't
always save).

Catalyst's AQE skew-join split handles sort-merge skew when statistics
surface it; salting is the explicit fallback for the worst shape — a huge
fact table where a handful of keys carry most rows, joined to a dimension too
big to broadcast. The fact side gets a deterministic salt in [0, n); the
dimension side is replicated n ways; the join key becomes (key, salt), so a
hot key's rows spread over n tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with an ``num_salts``-way salt.

    Semantically identical to ``fact.join(dim, on, how)`` for inner/left
    joins (each fact row carries exactly one salt value, and the dim side is
    replicated across all salts, so no row is lost or duplicated). The salt
    is a deterministic hash of the join key plus a per-row disambiguator
    (xxhash64 of all fact columns), keeping re-runs and resumed stages
    stable, unlike ``rand()``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    fact_s = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    )
    dim_s = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(num_salts - 1).cast("long"))),
    )
    out = fact_s.join(dim_s, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_distinct_count(
    df: DataFrame, group_keys: list[str], distinct_col: str, num_salts: int = 32
) -> DataFrame:
    """``count(DISTINCT x) GROUP BY k`` without funneling each group's full
    value set through one reducer.

    Phase 1 groups on (k, salt(x)) and dedups locally; phase 2 sums the
    partial distinct counts. Exact (each distinct value lands in exactly one
    salt bucket); the hot-group state is split ``num_salts`` ways. For a
    sketch-based alternative at even larger cardinality use
    ``approx_count_distinct`` (q26).
    """
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(num_salts))
    )
    phase1 = salted.groupBy(*group_keys, SALT_COL).agg(
        F.count_distinct(F.col(distinct_col)).alias("_partial")
    )
    return phase1.groupBy(*group_keys).agg(
        F.sum("_partial").alias(f"n_distinct_{distinct_col}")
    )
