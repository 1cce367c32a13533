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


def _simulate_agg(history):
    """Expected aggregate of the final state: group by A (NULL is a real
    group), n = rows, sum_K = sum of keys (K is the sum column here)."""
    agg: dict = {}
    for k, a, _b in _simulate(history):
        n, s = agg.get(a, (0, 0.0))
        agg[a] = (n + 1, s + k)
    return sorted(agg.items(), key=lambda kv: (kv[0] is None, kv[0]))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=_history, cuts=_cuts)
def test_incremental_aggregate_fold_equals_simulator(spark, history, cuts):
    """write_aggregate's per-batch kernel (fold_aggregate_step) driven over
    random histories and random batch boundaries must land on exactly the
    grouped aggregate of the simulator's final state — including NULL
    groups (the null-safe base↔deltas merge) and groups folding to zero."""
    from kafka_connect_logminer2_spark.streaming.snapshot import fold_aggregate_step

    rows = _rows(history)
    expected = _simulate_agg(history)

    bounds = sorted(c for c in cuts if c < len(rows)) + [len(rows)]
    snap, agg, last = None, None, 0
    for cut in bounds:
        batch = rows[last:cut]
        last = cut
        if not batch:
            continue
        bdf = spark.createDataFrame(batch, schema=SCHEMA)
        net = net_changes(bdf, ["K"])
        new = merge_step(snap, net, ["K"]).localCheckpoint()
        keys = net.select("K").distinct()
        agg = fold_aggregate_step(
            snap, new, keys, agg, ["K"], ["A"], ["K"]
        ).localCheckpoint()
        snap = new
    assert agg is not None
    got = sorted(
        ((r["A"], (r["n"], r["sum_K"])) for r in agg.collect()),
        key=lambda kv: (kv[0] is None, kv[0]),
    )
    assert got == expected
