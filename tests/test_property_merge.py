"""Property test: the incremental snapshot chain (net_changes + merge_step
per batch) must land on EXACTLY the state a one-shot apply_changes computes,
for RANDOM change histories and RANDOM batch boundaries — the cross-batch
twin of tests/test_property_assembly.py, validating patch carry-forward,
tombstones, and delete-then-reinsert (reborn) across arbitrary splits
against an independent Python simulator of the documented semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_logminer2_spark.operators.merge import apply_changes, net_changes
from kafka_connect_logminer2_spark.streaming.snapshot import merge_step

VALUE_T = "struct<K:bigint,A:string,B:string>"
SCHEMA = f"COMMIT_SCN long, SCN long, OPERATION string, data {VALUE_T}, before {VALUE_T}"

_val = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
_event = st.tuples(st.sampled_from(["INSERT", "UPDATE", "DELETE"]), _val, _val)
_history = st.lists(
    st.tuples(st.integers(1, 4), _event), min_size=1, max_size=14
)
_cuts = st.sets(st.integers(1, 13), max_size=3)


def _rows(history):
    rows = []
    for scn, (key, (op, a, b)) in enumerate(history, start=1):
        img = {"K": key, "A": a, "B": b}
        if op == "DELETE":
            rows.append({"COMMIT_SCN": scn, "SCN": scn, "OPERATION": op,
                         "data": None, "before": img})
        else:
            rows.append({"COMMIT_SCN": scn, "SCN": scn, "OPERATION": op,
                         "data": img, "before": None})
    return rows


def _simulate(history):
    """Independent model: per key in order — DELETE drops state entirely;
    INSERT/UPDATE create-or-patch with last-NON-NULL column semantics."""
    state: dict[int, dict] = {}
    for key, (op, a, b) in history:
        if op == "DELETE":
            state.pop(key, None)
            continue
        cur = state.setdefault(key, {"A": None, "B": None})
        if a is not None:
            cur["A"] = a
        if b is not None:
            cur["B"] = b
    return sorted((k, v["A"], v["B"]) for k, v in state.items())


def _collect(df):
    return sorted((r.K, r.A, r.B) for r in df.collect())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=_history, cuts=_cuts)
def test_incremental_chain_equals_batch_and_simulator(spark, history, cuts):
    rows = _rows(history)
    expected = _simulate(history)

    one_shot = apply_changes(
        spark.createDataFrame(rows, schema=SCHEMA), ["K"]
    )
    assert _collect(one_shot) == expected

    bounds = sorted(c for c in cuts if c < len(rows)) + [len(rows)]
    snap, last = None, 0
    for cut in bounds:
        batch = rows[last:cut]
        last = cut
        if not batch:
            continue
        net = net_changes(spark.createDataFrame(batch, schema=SCHEMA), ["K"])
        snap = merge_step(snap, net, ["K"]).localCheckpoint()
    assert snap is not None
    assert _collect(snap) == expected
