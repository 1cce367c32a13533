"""Compaction crash-idempotence via _FOLD markers (corpus_ingest.
compact_chains). The hard case is an ADDITIVE fold (the decayed-counter
store): a crash between fold placement and old-version deletion leaves
chain segments that are NOT byte-identical no-ops — without the marker
prune, a reader's groupBy-sum double-counts them and a compaction rerun
compounds them permanently (the r6 ADVICE-high finding). These tests
simulate each crash window with fs-level fault injection and assert the
store reads identically before, during, and after recovery."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Row

from kafka_connect_logminer2_spark.operators.scd import scd2_history
from kafka_connect_logminer2_spark.streaming import corpus_ingest
from kafka_connect_logminer2_spark.streaming.decayed import (
    compact_decayed,
    decayed_batch_step,
    read_decayed,
)
from kafka_connect_logminer2_spark.streaming.scd2 import (
    compact_scd2,
    read_scd2,
    scd2_batch_step,
)

EVENTS = "user_id long, value double, ts timestamp"


def _events(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [
            Row(user_id=u, value=float(v), ts=datetime.fromisoformat(t))
            for (u, v, t) in rows
        ],
        EVENTS,
    )


def _decayed_state(df):
    return {
        r["user_id"]: (r["s_vw"], r["s_w"], r["n_events"]) for r in df.collect()
    }


def _build_decayed(spark, store):
    batches = [
        [(1, 2.0, "2024-01-01 00:00:00"), (2, 1.0, "2024-01-01 06:00:00")],
        [(1, 3.0, "2024-01-02 00:00:00"), (3, 5.0, "2024-01-02 12:00:00")],
        [(2, 4.0, "2024-01-03 00:00:00"), (1, 1.0, "2024-01-03 18:00:00")],
    ]
    for i, rows in enumerate(batches):
        decayed_batch_step(spark, _events(spark, rows), i, store, num_buckets=4)


def _crashy_rmtree(real):
    """rmtree that 'crashes' (silently skips) every deletion — simulates
    dying right after fold placement, before ANY old version, aside dir,
    or staging cleanup ran. The worst-case leftover state."""

    def skip(*a, **k):
        return None

    return skip


def test_decayed_fold_crash_no_double_count(spark, tmp_path, monkeypatch):
    store = str(tmp_path / "dec")
    _build_decayed(spark, store)
    expected = _decayed_state(read_decayed(spark, store))

    # compact with every deletion skipped: fold segments land (marked),
    # old versions + aside dirs + staging all linger
    with monkeypatch.context() as m:
        m.setattr(corpus_ingest.shutil, "rmtree", _crashy_rmtree(shutil.rmtree))
        compact_decayed(spark, store)
    leftover_versions = sum(
        len([v for v in os.listdir(f"{store}/{d}") if v.startswith("v=")])
        for d in os.listdir(store)
        if d.startswith("b=")
    )
    assert leftover_versions > 4  # the crash really left old segments behind

    # reads prune below the committed fold: values identical, not doubled
    got = _decayed_state(read_decayed(spark, store))
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k][0] == pytest.approx(expected[k][0], rel=1e-12)
        assert got[k][1] == pytest.approx(expected[k][1], rel=1e-12)
        assert got[k][2] == expected[k][2]

    # rerun (deletions working) sweeps leftovers and must NOT re-sum them
    compact_decayed(spark, store)
    got2 = _decayed_state(read_decayed(spark, store))
    for k in expected:
        assert got2[k][0] == pytest.approx(expected[k][0], rel=1e-12)
        assert got2[k][2] == expected[k][2]
    for d in os.listdir(store):
        if d.startswith("b="):
            names = os.listdir(f"{store}/{d}")
            assert len([v for v in names if v.startswith("v=")]) == 1
            assert not any(n.startswith("_old_v=") for n in names)


SCD_SCHEMA = (
    "OPERATION string, COMMIT_SCN long, SCN long, "
    "data struct<K: long, V: string>, before struct<K: long, V: string>"
)


def _scd_rows(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                OPERATION=op,
                COMMIT_SCN=cscn,
                SCN=cscn,
                data=None if op == "DELETE" else Row(K=k, V=v),
                before=Row(K=k, V=None) if op == "DELETE" else None,
            )
            for (op, cscn, k, v) in rows
        ],
        SCD_SCHEMA,
    )


def test_scd2_fold_crash_no_duplicate_versions(spark, tmp_path, monkeypatch):
    store = str(tmp_path / "scd")
    b0 = [("INSERT", 10, 1, "a"), ("INSERT", 11, 2, "b")]
    b1 = [("UPDATE", 20, 1, "a2"), ("DELETE", 21, 2, None)]
    scd2_batch_step(spark, _scd_rows(spark, b0), 0, store, ["K"], num_buckets=4)
    scd2_batch_step(spark, _scd_rows(spark, b1), 1, store, ["K"], num_buckets=4)
    oneshot = scd2_history(_scd_rows(spark, b0 + b1), ["K"])
    want = sorted(map(tuple, oneshot.collect()))

    with monkeypatch.context() as m:
        m.setattr(corpus_ingest.shutil, "rmtree", _crashy_rmtree(shutil.rmtree))
        compact_scd2(spark, store)
    got = sorted(
        (r["K"], r["V"], r["valid_from"], r["valid_to"])
        for r in read_scd2(spark, store).collect()
    )
    assert got == sorted((r["K"], r["V"], r["valid_from"], r["valid_to"]) for r in oneshot.collect())
    assert len(got) == len(want)  # no crash-leftover duplicates

    compact_scd2(spark, store)  # rerun sweeps; history unchanged
    got2 = sorted(
        (r["K"], r["V"], r["valid_from"], r["valid_to"])
        for r in read_scd2(spark, store).collect()
    )
    assert got2 == got


def test_fold_swap_crash_restores_live_segment(spark, tmp_path):
    """Crash between the two placement renames: the live v=<last> segment
    sits at _old_v=<last> and no fold landed. The next read repairs the
    bucket (restores the segment) — no reader ever loses data."""
    store = str(tmp_path / "dec")
    _build_decayed(spark, store)
    expected = _decayed_state(read_decayed(spark, store))

    moved = []
    for d in os.listdir(store):
        if not d.startswith("b="):
            continue
        bdir = os.path.join(store, d)
        vs = sorted(v for v in os.listdir(bdir) if v.startswith("v="))
        if vs:
            src = os.path.join(bdir, vs[-1])
            dst = os.path.join(bdir, "_old_" + vs[-1])
            os.replace(src, dst)
            moved.append((dst, src))
    assert moved

    got = _decayed_state(read_decayed(spark, store))  # read triggers repair
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k][0] == pytest.approx(expected[k][0], rel=1e-12)
    for dst, src in moved:
        assert os.path.isdir(src) and not os.path.isdir(dst)
