"""Property test: the incrementally-folded SCD2 store (streaming/scd2.py)
must land on EXACTLY the history an independent Python simulator of the
documented SCD2 semantics produces — for RANDOM change histories and
RANDOM batch boundaries — and so must the one-shot operator
(operators/scd.py::scd2_history). The SCD2 twin of
test_property_merge.py: validates cross-batch version closure, SEED value
inheritance, and tombstone generation scoping across arbitrary splits."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_logminer2_spark.operators.scd import scd2_history
from kafka_connect_logminer2_spark.streaming.scd2 import read_scd2, scd2_batch_step

VALUE_T = "struct<K:bigint,A:string,B:string>"
SCHEMA = f"COMMIT_SCN long, SCN long, OPERATION string, data {VALUE_T}, before {VALUE_T}"

_val = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
_event = st.tuples(st.sampled_from(["INSERT", "UPDATE", "DELETE"]), _val, _val)
_history = st.lists(st.tuples(st.integers(1, 3), _event), min_size=1, max_size=12)
_cuts = st.sets(st.integers(1, 11), max_size=3)


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
    """Independent model of the documented semantics: every INSERT/UPDATE
    opens a version at its SCN whose values are the last-non-null merge
    within the current generation; ANY next change of the key closes the
    open version; DELETE closes and resets the generation (no value
    carry-over across the tombstone) and emits no row."""
    versions: list = []           # [key, from, to, A, B]
    open_idx: dict[int, int] = {}  # key -> index into versions
    base: dict[int, dict] = {}     # key -> merge base of current generation
    for scn, (key, (op, a, b)) in enumerate(history, start=1):
        if key in open_idx:
            versions[open_idx[key]][2] = scn  # close at this change
        if op == "DELETE":
            open_idx.pop(key, None)
            base.pop(key, None)               # generation reset
            continue
        cur = dict(base.get(key, {"A": None, "B": None}))
        if a is not None:
            cur["A"] = a
        if b is not None:
            cur["B"] = b
        base[key] = cur
        open_idx[key] = len(versions)
        versions.append([key, scn, None, cur["A"], cur["B"]])
    return sorted(
        (k, f, t, a, b, t is None) for k, f, t, a, b in versions
    )


def _collect(df):
    return sorted(
        (r["K"], r["valid_from"], r["valid_to"], r["A"], r["B"], r["is_current"])
        for r in df.collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=_history, cuts=_cuts)
def test_scd2_stream_and_batch_equal_simulator(spark, history, cuts):
    rows = _rows(history)
    expected = _simulate(history)

    one_shot = scd2_history(spark.createDataFrame(rows, schema=SCHEMA), ["K"])
    assert _collect(one_shot) == expected

    bounds = sorted(c for c in cuts if c < len(rows)) + [len(rows)]
    tmp = tempfile.mkdtemp(prefix="scd2prop_")
    try:
        last = 0
        for i, cut in enumerate(bounds):
            batch = rows[last:cut]
            last = cut
            if not batch:
                continue
            scd2_batch_step(
                spark,
                spark.createDataFrame(batch, schema=SCHEMA),
                i,
                f"{tmp}/hist",
                ["K"],
                num_buckets=2,
            )
        got = read_scd2(spark, f"{tmp}/hist")
        assert got is not None
        assert _collect(got) == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
