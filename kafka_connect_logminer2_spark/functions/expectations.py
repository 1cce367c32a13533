"""Declarative data-quality expectations — a Deequ-style constraint suite
computed in ONE aggregation pass (Schelter et al. 2018, "Automating
Large-Scale Data Quality Verification", VLDB).

Why this shape at 100 TB: quality gates run on EVERY pipeline landing, so
the naive one-job-per-check pattern (N scans of the table) is the single
most common self-inflicted cost in production pipelines. Here every
check's metric is an aggregate EXPRESSION; all of them ride one
``df.agg(...)`` — one scan, one partial-agg exchange, whatever the number
of checks. Exact-distinct checks (uniqueness) add Spark's expand-based
distinct handling inside the same job; referential checks are the one
genuinely second-pass shape (an anti-join), kept as a separate tiny
report the caller unions.

The report is LONG format — (check_name, metric, passed) — so downstream
gating is a filter, and the whole suite is SQL-expressible for oracle
checking (each metric a scalar aggregate, UNION ALL'd).

Pass/fail compares the metric ROUNDED to 6 dp against the bounds, so two
engines that disagree in the last ulp of a float mean cannot disagree on
the verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A check is (name, metric_aggregate, lo, hi): passed = lo <= round(metric, 6) <= hi
Check = tuple[str, Column, float | None, float | None]


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value — 1.0 means complete."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(*cols: str) -> Column:
    """Distinct tuples / rows — 1.0 means the columns form a key. Exact
    (count_distinct), not approximate: a primary-key check that passes at
    0.9999 is a failed check."""
    return F.count_distinct(*[F.col(c) for c in cols]) / F.count(F.lit(1))


def accepted_values(col: str, values: list) -> Column:
    """Fraction of non-null values inside the accepted domain."""
    return F.avg(F.col(col).isin(values).cast("double"))


def row_count() -> Column:
    return F.count(F.lit(1)).cast("double")


def expectation_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation over ``df`` → long-format
    report (check_name, metric double rounded 6dp, passed boolean).
    ``lo``/``hi`` of None mean unbounded on that side; a NULL metric (e.g.
    min of an empty frame) fails closed."""
    aggs = [m.cast("double").alias(f"_m{i}") for i, (_, m, _, _) in enumerate(checks)]
    row = df.agg(*aggs)
    structs = []
    for i, (name, _, lo, hi) in enumerate(checks):
        metric = F.round(F.col(f"_m{i}"), 6)
        passed = F.lit(True)
        if lo is not None:
            passed = passed & (metric >= F.lit(float(lo)))
        if hi is not None:
            passed = passed & (metric <= F.lit(float(hi)))
        structs.append(
            F.struct(
                F.lit(name).alias("check_name"),
                metric.alias("metric"),
                F.coalesce(passed, F.lit(False)).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("c")).select("c.*")


def referential_report(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Foreign-key containment: metric = orphan child keys (rows of
    ``child`` whose key has no match in ``parent``), passed = zero.

    The one check that cannot ride the single-pass aggregate — it needs
    the parent relation. Shape: left-anti equi-join; at scale the parent
    side is its key column only (pruned scan), and the join is broadcast
    when the parent is small enough (Catalyst/AQE's call, not forced
    here)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("double").alias("_m")
    ).select(
        F.lit(name).alias("check_name"),
        F.round(F.col("_m"), 6).alias("metric"),
        (F.col("_m") == 0).alias("passed"),
    )
