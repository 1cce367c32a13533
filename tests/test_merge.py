"""apply_changes (CDC snapshot MERGE) — semantics + plan audits.

The cdc06 oracle test covers the end-to-end fold over synthetic redo; here
we pin the operator's edge semantics on hand-built typed change rows
(re-insert after delete, partial-column update patching, delete-wins) and
its scale contract (exactly one exchange on the key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.operators.merge import apply_changes

VALUE_T = "struct<K:bigint,A:string,B:string>"


def _typed(spark, rows):
    """rows: (cscn, scn, op, data_dict_or_None, before_dict_or_None)"""
    data = [
        {
            "COMMIT_SCN": cscn,
            "SCN": scn,
            "OPERATION": op,
            "data": d,
            "before": b,
        }
        for cscn, scn, op, d, b in rows
    ]
    return spark.createDataFrame(
        data,
        schema=f"COMMIT_SCN long, SCN long, OPERATION string, data {VALUE_T}, before {VALUE_T}",
    )


def test_update_patches_only_carried_columns(spark):
    """UPDATE after-image carries K and A only; B survives from the INSERT."""
    typed = _typed(
        spark,
        [
            (10, 1, "INSERT", {"K": 1, "A": "a0", "B": "b0"}, None),
            (20, 2, "UPDATE", {"K": 1, "A": "a1", "B": None}, {"K": 1, "A": "a0", "B": None}),
        ],
    )
    out = apply_changes(typed, ["K"]).collect()
    assert len(out) == 1
    assert out[0].A == "a1" and out[0].B == "b0"


def test_delete_wins_and_reinsert_survives(spark):
    typed = _typed(
        spark,
        [
            # key 1: insert then delete → gone
            (10, 1, "INSERT", {"K": 1, "A": "a", "B": "b"}, None),
            (20, 2, "DELETE", None, {"K": 1, "A": "a", "B": None}),
            # key 2: insert, delete, re-insert with NULL B → the tombstone
            # must stop B='old' leaking into the new generation
            (10, 3, "INSERT", {"K": 2, "A": "old", "B": "old"}, None),
            (20, 4, "DELETE", None, {"K": 2, "A": "old", "B": None}),
            (30, 5, "INSERT", {"K": 2, "A": "new", "B": None}, None),
        ],
    )
    out = {r.K: r for r in apply_changes(typed, ["K"]).collect()}
    assert set(out) == {2}
    assert out[2].A == "new" and out[2].B is None


def test_apply_changes_single_exchange(spark):
    typed = _typed(spark, [(10, 1, "INSERT", {"K": 1, "A": "a", "B": "b"}, None)])
    plan = apply_changes(typed, ["K"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_semi_anti_subquery_plans(spark, sf_dir):
    """q69 must plan a LEFT SEMI (never duplicating the probe side), q72 a
    LEFT ANTI with the scalar average broadcast."""
    from kafka_connect_logminer2_spark.plans.queries import QUERY_REGISTRY

    p69 = QUERY_REGISTRY["q69_exists_subquery"][0](spark, sf_dir)
    plan69 = p69._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan69

    p72 = QUERY_REGISTRY["q72_scalar_subquery_anti"][0](spark, sf_dir)
    plan72 = p72._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan72
    assert "Broadcast" in plan72
