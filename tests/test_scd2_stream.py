"""Continuously-maintained SCD2 history (streaming/scd2.py): for ANY
split of a change stream into micro-batches, the folded store must equal
the one-shot scd2_history derivation; plus store mechanics (retry
idempotence, compaction identity, param guard, O(batch) write bound)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from kafka_connect_logminer2_spark.operators.scd import scd2_history
from kafka_connect_logminer2_spark.streaming.scd2 import (
    compact_scd2,
    read_scd2,
    scd2_batch_step,
)

SCHEMA = (
    "OPERATION string, COMMIT_SCN long, SCN long, "
    "data struct<K: long, V: string, W: string>, "
    "before struct<K: long, V: string, W: string>"
)


def _typed(spark, rows):
    """(op, cscn, scn, key, v, w) -> typed-change frame."""
    data = [
        Row(
            OPERATION=op,
            COMMIT_SCN=cscn,
            SCN=scn,
            data=Row(K=None, V=None, W=None) if op == "DELETE" else Row(K=k, V=v, W=w),
            before=Row(K=k, V=None, W=None) if op == "DELETE" else None,
        )
        for (op, cscn, scn, k, v, w) in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


# a history with every interesting transition: plain chains, delete +
# re-insert (tombstone generation), update-only columns, multi-change keys
CHANGES = [
    ("INSERT", 10, 1, 1, "a1", "w1"),
    ("INSERT", 10, 1, 2, "b1", "x1"),
    ("INSERT", 12, 2, 3, "c1", "y1"),
    ("UPDATE", 20, 3, 1, "a2", None),      # W must inherit w1
    ("DELETE", 25, 4, 2, None, None),
    ("UPDATE", 30, 5, 3, "c2", None),
    ("INSERT", 35, 6, 2, "b2", None),      # post-tombstone: W must be NULL
    ("UPDATE", 40, 7, 1, None, "w2"),      # V must inherit a2
    ("DELETE", 45, 8, 3, None, None),
]


def _key(r):
    return (r["K"], r["valid_from"], r["valid_to"], r["V"], r["W"], r["is_current"])


def _batch_truth(spark):
    return sorted(
        _key(r) for r in scd2_history(_typed(spark, CHANGES), ["K"]).collect()
    )


@pytest.mark.parametrize(
    "splits",
    [
        [9],            # everything in one batch
        [3, 3, 3],      # even thirds
        [1] * 9,        # one change per batch (maximal cross-batch closure)
        [5, 1, 3],      # uneven
    ],
)
def test_any_batch_split_equals_oneshot(spark, tmp_path, splits):
    store = str(tmp_path / "hist")
    i = 0
    for b, n in enumerate(splits):
        scd2_batch_step(
            spark, _typed(spark, CHANGES[i : i + n]), b, store, ["K"], num_buckets=4
        )
        i += n
    got = sorted(_key(r) for r in read_scd2(spark, store).collect())
    assert got == _batch_truth(spark)


def test_compact_identity_and_patch_drop(spark, tmp_path):
    store = str(tmp_path / "hist")
    for b in range(9):
        scd2_batch_step(
            spark, _typed(spark, CHANGES[b : b + 1]), b, store, ["K"], num_buckets=4
        )
    before = sorted(_key(r) for r in read_scd2(spark, store).collect())
    assert os.path.isdir(f"{store}/_closes")  # cross-batch closures existed
    compact_scd2(spark, store)
    after = sorted(_key(r) for r in read_scd2(spark, store).collect())
    assert after == before
    assert not os.path.isdir(f"{store}/_closes")
    for d in os.listdir(store):
        if d.startswith("b="):
            assert len([x for x in os.listdir(f"{store}/{d}") if x.startswith("v=")]) == 1


def test_retry_overwrites_own_segments(spark, tmp_path):
    store = str(tmp_path / "hist")
    scd2_batch_step(spark, _typed(spark, CHANGES[:5]), 0, store, ["K"], num_buckets=4)
    scd2_batch_step(spark, _typed(spark, CHANGES[5:]), 1, store, ["K"], num_buckets=4)
    state = sorted(_key(r) for r in read_scd2(spark, store).collect())
    # retry batch 1 byte-identically
    scd2_batch_step(spark, _typed(spark, CHANGES[5:]), 1, store, ["K"], num_buckets=4)
    assert sorted(_key(r) for r in read_scd2(spark, store).collect()) == state


def test_param_guard(spark, tmp_path):
    store = str(tmp_path / "hist")
    scd2_batch_step(spark, _typed(spark, CHANGES[:3]), 0, store, ["K"], num_buckets=4)
    with pytest.raises(ValueError, match="different"):
        scd2_batch_step(spark, _typed(spark, CHANGES[3:]), 1, store, ["K"], num_buckets=8)


def test_write_bound_is_batch_not_history(spark, tmp_path):
    # growing history, constant-size batches: per-batch NEW-row bytes must
    # not grow with history size (append-only deltas, patches tiny)
    store = str(tmp_path / "hist")
    sizes = []
    for b in range(6):
        rows = [
            ("INSERT", 100 * b + 10, 1, 1000 * b + i, f"v{b}", f"w{b}")
            for i in range(50)
        ]
        scd2_batch_step(spark, _typed(spark, rows), b, store, ["K"], num_buckets=4)
        n = 0
        for root, _, files in os.walk(store):
            n += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet") and f"/v={b}" in root + "/"
            )
        sizes.append(n)
    assert max(sizes) < 2 * min(sizes)  # flat, not growing with history


def test_streamed_store_feeds_pit_join(spark, tmp_path):
    # the streamed history is directly consumable by the point-in-time
    # join: enrichment over read_scd2 == enrichment over the one-shot
    # operator output
    from pyspark.sql import Row

    from kafka_connect_logminer2_spark.operators.scd import pit_join

    store = str(tmp_path / "hist")
    for b in range(3):
        scd2_batch_step(
            spark, _typed(spark, CHANGES[3 * b : 3 * b + 3]), b, store, ["K"],
            num_buckets=4,
        )
    facts = spark.createDataFrame(
        [Row(fk=k, t=t) for k in (1, 2, 3, 9) for t in (11, 22, 38, 50)],
        "fk long, t long",
    )
    via_store = pit_join(facts, read_scd2(spark, store), "fk", "K", "t")
    via_batch = pit_join(
        facts, scd2_history(_typed(spark, CHANGES), ["K"]), "fk", "K", "t"
    )
    key = lambda r: (r["fk"], r["t"], r["V"], r["W"])
    assert sorted(map(key, via_store.collect())) == sorted(
        map(key, via_batch.collect())
    )


class TestDecayedCounters:
    """streaming/decayed.py — delta-chain decayed-counter MV: streamed
    fold == direct computation, O(batch) write bound, compaction
    identity (incl. the implicit epoch re-base), retry idempotence,
    param guard, and the multi-decade no-overflow property per-batch
    epochs exist for."""

    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )

    @staticmethod
    def _direct(rows, as_of):
        import math

        lam = math.log(2) / (7 * 86400)
        T = as_of.timestamp()
        want: dict = {}
        for _i, u, ts, v in rows:
            dv, dc, n = want.get(u, (0.0, 0.0, 0))
            w = math.exp(-lam * (T - ts.timestamp()))
            want[u] = (dv + v * w, dc + w, n + 1)
        return want

    def _assert_matches(self, got_rows, want):
        got = {
            r["user_id"]: (r["decayed_value"], r["decayed_count"], r["n_events"])
            for r in got_rows
        }
        assert set(got) == set(want)
        for u, (dv, dc, n) in want.items():
            assert got[u][2] == n
            assert abs(got[u][0] - dv) <= 1e-9 * max(1.0, abs(dv))
            assert abs(got[u][1] - dc) <= 1e-9 * max(1.0, abs(dc))

    def test_stream_fold_equals_direct(self, spark, tmp_path):
        import datetime as dt

        from kafka_connect_logminer2_spark.streaming.decayed import (
            decayed_batch_step,
            read_decayed,
        )

        rows = [
            (i, i % 3, dt.datetime(2024, 1, 1 + i), float(10 * i)) for i in range(9)
        ]
        store = str(tmp_path / "state")
        for b in range(3):
            decayed_batch_step(
                spark, self._events(spark, rows[3 * b : 3 * b + 3]), b, store
            )
        self._assert_matches(
            read_decayed(spark, store, as_of_ts="2024-02-01").collect(),
            self._direct(rows, dt.datetime(2024, 2, 1)),
        )

    def test_compact_identity_rebase(self, spark, tmp_path):
        # chains spanning several distinct per-batch epochs fold to one
        # segment per bucket; the read (an as-of projection) is unchanged
        # — the epoch re-base is implicit in the fold and exact
        import datetime as dt
        import os

        from kafka_connect_logminer2_spark.streaming.decayed import (
            compact_decayed,
            decayed_batch_step,
            read_decayed,
        )

        rows = [
            (i, i % 4, dt.datetime(2024, 1 + i % 3, 1 + i), float(i + 1))
            for i in range(12)
        ]
        store = str(tmp_path / "state")
        for b in range(4):
            decayed_batch_step(
                spark, self._events(spark, rows[3 * b : 3 * b + 3]), b, store,
                num_buckets=4,
            )
        before = read_decayed(spark, store, as_of_ts="2024-06-01").collect()
        compact_decayed(spark, store)
        after = read_decayed(spark, store, as_of_ts="2024-06-01").collect()
        self._assert_matches(before, self._direct(rows, dt.datetime(2024, 6, 1)))
        self._assert_matches(after, self._direct(rows, dt.datetime(2024, 6, 1)))
        for d in os.listdir(store):
            if d.startswith("b="):
                vs = [x for x in os.listdir(f"{store}/{d}") if x.startswith("v=")]
                assert len(vs) == 1

    def test_no_overflow_across_decades(self, spark, tmp_path):
        # batches 0/25/50 YEARS apart at a 7-day half-life: a fixed
        # creation-time epoch would need e^(λ·50y) ≈ e^1800 = inf — the
        # per-batch day-aligned epochs keep every stored double finite
        # and the as-of read exact (old contributions decay to ~0, new
        # ones dominate)
        import datetime as dt
        import math

        from kafka_connect_logminer2_spark.streaming.decayed import (
            compact_decayed,
            decayed_batch_step,
            read_decayed,
        )

        rows_by_batch = [
            [(1, 1, dt.datetime(2000, 1, 5), 3.0), (2, 2, dt.datetime(2000, 1, 6), 5.0)],
            [(3, 1, dt.datetime(2025, 6, 1), 7.0)],
            [(4, 1, dt.datetime(2050, 3, 2), 11.0), (5, 2, dt.datetime(2050, 3, 3), 13.0)],
        ]
        store = str(tmp_path / "state")
        for b, rows in enumerate(rows_by_batch):
            decayed_batch_step(spark, self._events(spark, rows), b, store)
        raw = read_decayed(spark, store).collect()
        assert all(
            math.isfinite(r["s_vw"]) and math.isfinite(r["s_w"]) for r in raw
        )
        flat = [r for rows in rows_by_batch for r in rows]
        want = self._direct(flat, dt.datetime(2050, 4, 1))
        self._assert_matches(
            read_decayed(spark, store, as_of_ts="2050-04-01").collect(), want
        )
        compact_decayed(spark, store)
        self._assert_matches(
            read_decayed(spark, store, as_of_ts="2050-04-01").collect(), want
        )

    def test_write_bound_is_batch_not_keys(self, spark, tmp_path):
        # a large resident key population, then constant-size batches
        # touching a small key subset: per-batch delta bytes must track
        # the BATCH (flat), not the store's key count — the r5-verdict
        # write-amplification fix
        import datetime as dt
        import os

        from kafka_connect_logminer2_spark.streaming.decayed import (
            decayed_batch_step,
        )

        store = str(tmp_path / "state")
        seed = [(i, i, dt.datetime(2024, 1, 1), 1.0) for i in range(50_000)]
        decayed_batch_step(spark, self._events(spark, seed), 0, store, num_buckets=4)
        sizes = []
        for b in range(1, 5):
            rows = [
                (10_000 * b + i, i, dt.datetime(2024, 1, 1 + b), 2.0)
                for i in range(50)
            ]
            decayed_batch_step(spark, self._events(spark, rows), b, store, num_buckets=4)
            n = 0
            for root, _, files in os.walk(store):
                if f"/v={b}" in root + "/":
                    n += sum(
                        os.path.getsize(os.path.join(root, f))
                        for f in files
                        if f.endswith(".parquet")
                    )
            sizes.append(n)
        seed_bytes = 0
        for root, _, files in os.walk(store):
            if "/v=0" in root + "/":
                seed_bytes += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        assert max(sizes) < 2 * min(sizes)       # flat across batches
        assert max(sizes) < seed_bytes / 5       # and << the key population

    def test_param_guard_and_retry(self, spark, tmp_path):
        import datetime as dt

        import pytest as _pytest

        from kafka_connect_logminer2_spark.streaming.decayed import (
            decayed_batch_step,
            read_decayed,
        )

        rows = [(i, 1, dt.datetime(2024, 1, 2), 5.0) for i in range(4)]
        store = str(tmp_path / "state")
        decayed_batch_step(spark, self._events(spark, rows[:2]), 0, store)
        decayed_batch_step(spark, self._events(spark, rows[2:]), 1, store)
        state = {
            (r["user_id"], r["n_events"])
            for r in read_decayed(spark, store).collect()
        }
        # a retried batch overwrites only its own segments -> identical state
        decayed_batch_step(spark, self._events(spark, rows[2:]), 1, store)
        assert {
            (r["user_id"], r["n_events"])
            for r in read_decayed(spark, store).collect()
        } == state
        # resuming with a different half-life mixes incompatible weight
        # domains -> raises
        with _pytest.raises(ValueError, match="different"):
            decayed_batch_step(
                spark, self._events(spark, rows[:2]), 2, store, half_life_s=86400.0
            )
