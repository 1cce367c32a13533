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


def _first_bucket_with_versions(store):
    for d in sorted(os.listdir(store)):
        if d.startswith("b="):
            bdir = os.path.join(store, d)
            vs = sorted(
                (v for v in os.listdir(bdir) if v.startswith("v=")),
                key=lambda s: int(s[2:]),
            )
            if vs:
                return bdir, vs[-1]
    raise AssertionError("no bucket with versions")


def test_repair_claim_loser_cannot_destroy_restored_segment(spark, tmp_path):
    """The r8 advisor's reader-reader interleave: repairer A restores the
    aside segment, then repairer B (acting on a stale directory listing)
    must NOT delete it. With claim-based repair B's attempt loses the
    claim rename (the aside is gone) and returns without touching the
    restored, committed segment."""
    store = str(tmp_path / "dec")
    _build_decayed(spark, store)
    expected = _decayed_state(read_decayed(spark, store))

    bdir, last = _first_bucket_with_versions(store)
    n = last[2:]
    aside = f"_old_v={n}"
    os.replace(os.path.join(bdir, last), os.path.join(bdir, aside))

    # repairer A wins and restores
    corpus_ingest._restore_aside(bdir, aside, n)
    assert os.path.exists(os.path.join(bdir, last, "_SUCCESS"))

    # repairer B replays the SAME repair from its stale listing: with the
    # old code this rmtree'd the restored segment; now it stands down
    corpus_ingest._restore_aside(bdir, aside, n)
    assert os.path.exists(os.path.join(bdir, last, "_SUCCESS"))
    got = _decayed_state(read_decayed(spark, store))
    for k in expected:
        assert got[k][0] == pytest.approx(expected[k][0], rel=1e-12)


def test_repair_steals_stranded_claim(spark, tmp_path, monkeypatch):
    """A repairer that crashed between claiming and restoring leaves the
    segment intact under its _repair_<id>_v=<n> claim dir. The next
    reader's recovery waits out the grace period, steals the claim, and
    finishes the restore — the segment is never stranded."""
    store = str(tmp_path / "dec")
    _build_decayed(spark, store)
    expected = _decayed_state(read_decayed(spark, store))

    bdir, last = _first_bucket_with_versions(store)
    n = last[2:]
    claim = f"_repair_{'0' * 32}_v={n}"
    os.replace(os.path.join(bdir, last), os.path.join(bdir, claim))

    monkeypatch.setattr(corpus_ingest, "_REPAIR_GRACE_SECONDS", 0.1)
    got = _decayed_state(read_decayed(spark, store))  # read repairs
    assert os.path.exists(os.path.join(bdir, last, "_SUCCESS"))
    assert not os.path.isdir(os.path.join(bdir, claim))
    for k in expected:
        assert got[k][0] == pytest.approx(expected[k][0], rel=1e-12)


def test_concurrent_repairers_race_stress(tmp_path):
    """Many threads repair the same crashed-swap bucket SIMULTANEOUSLY,
    repeatedly: the claim rename must serialize them so the committed
    segment always survives intact with its payload, no matter the
    interleaving. (The pre-r9 code lost the segment whenever one
    repairer's rmtree landed after another's restore.)"""
    import threading

    for trial in range(25):
        bdir = tmp_path / f"trial{trial}" / "b=0"
        seg = bdir / "v=3"
        seg.mkdir(parents=True)
        (seg / "_SUCCESS").touch()
        (seg / "part-000.parquet").write_bytes(b"payload-%d" % trial)
        os.replace(seg, bdir / "_old_v=3")  # crashed mid-swap state

        barrier = threading.Barrier(6)
        errors = []

        def repair():
            try:
                barrier.wait()
                corpus_ingest._recover_bucket(str(bdir))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=repair) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert (seg / "_SUCCESS").exists(), trial
        assert (seg / "part-000.parquet").read_bytes() == b"payload-%d" % trial
        leftovers = [
            d for d in os.listdir(bdir)
            if d.startswith(("_old_v=", "_repair_"))
        ]
        assert not leftovers, leftovers  # every claim resolved


def test_cleanup_overlays_tolerates_stray_names(tmp_path):
    """Protected overlay cleanup must not ValueError on a non-numeric
    v=-prefixed entry (editor artifact, crashed 'v=tmp') — the r8 advisor
    finding; the unprotected whole-dir rmtree tolerated anything, the
    per-segment path must too."""
    store = tmp_path / "store"
    odir = store / "_tombstones"
    for name in ("v=1", "v=7", "v=tmp", "v=", "not_v"):
        (odir / name).mkdir(parents=True)
    corpus_ingest._cleanup_overlays(str(store), ("_tombstones",), protect=5)
    left = sorted(os.listdir(odir))
    assert left == ["not_v", "v=", "v=7", "v=tmp"]  # v=1 < protect consumed


def test_decayed_compact_crash_at_every_fs_step(spark, tmp_path):
    """Exhaustive fault injection: crash compaction at the k-th filesystem
    mutation (rmtree or rename), for EVERY k until a run completes. After
    each crash the store must read exactly right (fold-marker pruning +
    read-side recovery), and a clean rerun must converge to the same
    values — the full crash story of the placement protocol, not just the
    two hand-picked windows above."""
    import os as _os

    store = str(tmp_path / "dec")
    _build_decayed(spark, store)
    expected = _decayed_state(read_decayed(spark, store))

    real_rmtree, real_replace = shutil.rmtree, _os.replace

    class Budget:
        def __init__(self, n):
            self.left = n

        def spend(self):
            self.left -= 1
            if self.left == 0:
                raise RuntimeError("injected crash")

    def check(tag):
        got = _decayed_state(read_decayed(spark, store))
        assert got.keys() == expected.keys(), tag
        for k in expected:
            assert got[k][0] == pytest.approx(expected[k][0], rel=1e-12), (tag, k)
            assert got[k][2] == expected[k][2], (tag, k)

    k = 0
    while True:
        k += 1
        assert k < 200, "fault injection never completed a clean run"
        # rebuild a fresh multi-version store for each crash point
        shutil.rmtree(store, ignore_errors=True)
        _build_decayed(spark, store)
        b = Budget(k)

        def rmtree(*a, **kw):
            b.spend()
            return real_rmtree(*a, **kw)

        def replace(*a, **kw):
            b.spend()
            return real_replace(*a, **kw)

        corpus_ingest.shutil.rmtree = rmtree
        corpus_ingest.os.replace = replace
        try:
            compact_decayed(spark, store)
            completed = b.left > 0  # ran out of steps to crash at
        except RuntimeError:
            completed = False
        finally:
            corpus_ingest.shutil.rmtree = real_rmtree
            corpus_ingest.os.replace = real_replace
        check(f"after crash at fs-op {k}")
        compact_decayed(spark, store)  # clean rerun finishes the job
        check(f"after rerun (crash was at {k})")
        if completed:
            break
