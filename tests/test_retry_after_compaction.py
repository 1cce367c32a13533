"""Batch-replay-after-inline-compaction (the r7 advice HIGH item).

A streaming writer's store commit marker lands BEFORE Spark writes the
batch into the streaming checkpoint's commit log, so in-line maintenance
(maintain_store inside foreachBatch) runs while the just-committed batch
may still be REPLAYED. If compaction folds the history at that batch's
version, the retry's _write_delta overwrites the fold — the ENTIRE
folded history — and its below=<batch> history read excludes the fold
while the pre-fold versions are already deleted: silent total data loss.

The fix is compact_chains(protect=<batch_id>): versions >= protect are
invisible to compaction, the fold lands strictly below, and overlay
consumption is scoped the same way. Every streaming writer's in-line
maintain_store call passes protect=batch_id.

One falsifying-example test per store kind (the r6/r7 convention:
scd2 / decayed / postings / exact ingest), plus the explicit
demonstration that the UNPROTECTED sequence loses history — pinning why
the parameter exists — and unit pins for fold placement, overlay
scoping, sweep failure isolation, and committed-only chain_stats.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import Row

from kafka_connect_logminer2_spark.operators.scd import scd2_history
from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
    compact_store,
    ingest_batch_exact,
    read_ingested,
)
from kafka_connect_logminer2_spark.streaming.decayed import (
    decayed_batch_step,
    read_decayed,
)
from kafka_connect_logminer2_spark.streaming.maintenance import (
    chain_stats,
    maintain_store,
    maintain_stores,
)
from kafka_connect_logminer2_spark.streaming.scd2 import (
    compact_scd2,
    read_scd2,
    scd2_batch_step,
)
from kafka_connect_logminer2_spark.streaming.search_index import (
    index_batch,
    read_postings,
)

# ---------------------------------------------------------------- scd2

SCHEMA = (
    "OPERATION string, COMMIT_SCN long, SCN long, "
    "data struct<K: long, V: string, W: string>, "
    "before struct<K: long, V: string, W: string>"
)

CHANGES = [
    ("INSERT", 10, 1, 1, "a1", "w1"),
    ("INSERT", 10, 1, 2, "b1", "x1"),
    ("INSERT", 12, 2, 3, "c1", "y1"),
    ("UPDATE", 20, 3, 1, "a2", None),
    ("DELETE", 25, 4, 2, None, None),
    ("UPDATE", 30, 5, 3, "c2", None),
    ("INSERT", 35, 6, 2, "b2", None),
    ("UPDATE", 40, 7, 1, None, "w2"),
    ("DELETE", 45, 8, 3, None, None),
]


def _typed(spark, rows):
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


def _hkey(r):
    return (r["K"], r["valid_from"], r["valid_to"], r["V"], r["W"], r["is_current"])


def _no_fold_at(store, version):
    for d in os.listdir(store):
        if d.startswith("b="):
            assert not os.path.exists(f"{store}/{d}/v={version}/_FOLD")


def test_scd2_replay_after_inline_compaction(spark, tmp_path):
    """The writer loop exactly as write_scd2 runs it (batch_step ->
    maintain_store(protect=batch_id), max_chain=1 so compaction fires
    every batch), then REPLAY the last batch: history must equal the
    one-shot derivation, and no fold may sit at the replayed version."""
    store = str(tmp_path / "hist")
    splits = [3, 3, 3]
    i = 0
    for b, n in enumerate(splits):
        scd2_batch_step(
            spark, _typed(spark, CHANGES[i : i + n]), b, store, ["K"], num_buckets=4
        )
        maintain_store(spark, store, max_chain=1, max_overlays=1, protect=b)
        i += n
    _no_fold_at(store, 2)  # fold landed strictly below the live batch
    # Spark replays the last batch (commit log never landed)
    scd2_batch_step(
        spark, _typed(spark, CHANGES[6:9]), 2, store, ["K"], num_buckets=4
    )
    got = sorted(_hkey(r) for r in read_scd2(spark, store).collect())
    truth = sorted(
        _hkey(r) for r in scd2_history(_typed(spark, CHANGES), ["K"]).collect()
    )
    assert got == truth


def test_scd2_unprotected_inline_compaction_loses_history(spark, tmp_path):
    """The falsifying example the protect parameter exists for: the SAME
    sequence with an unprotected fold at the live batch's version loses
    every pre-batch row on replay. If this test ever starts passing with
    equal histories, the protect contract became unnecessary — re-audit
    before removing it."""
    store = str(tmp_path / "hist")
    scd2_batch_step(spark, _typed(spark, CHANGES[:3]), 0, store, ["K"], num_buckets=4)
    scd2_batch_step(spark, _typed(spark, CHANGES[3:6]), 1, store, ["K"], num_buckets=4)
    scd2_batch_step(spark, _typed(spark, CHANGES[6:9]), 2, store, ["K"], num_buckets=4)
    compact_scd2(spark, store)  # unprotected: fold lands AT v=2
    scd2_batch_step(  # replay of batch 2 overwrites the fold
        spark, _typed(spark, CHANGES[6:9]), 2, store, ["K"], num_buckets=4
    )
    got = sorted(_hkey(r) for r in read_scd2(spark, store).collect())
    truth = sorted(
        _hkey(r) for r in scd2_history(_typed(spark, CHANGES), ["K"]).collect()
    )
    assert got != truth  # pre-batch history is gone
    assert not any(r[0] == 1 and r[3] == "a1" for r in got)


# -------------------------------------------------------------- decayed


def _events(spark, batch_no, n=40):
    t0 = datetime(2024, 1, 1) + timedelta(hours=batch_no)
    return spark.createDataFrame(
        [
            Row(user_id=(batch_no * 7 + i) % 25, value=1.0 + i % 3,
                ts=t0 + timedelta(minutes=i))
            for i in range(n)
        ],
        "user_id long, value double, ts timestamp",
    )


def test_decayed_replay_after_inline_compaction(spark, tmp_path):
    """Additive fold + replay is the hardest case: an overwritten fold
    does not just lose rows, a survived one would double-count. Twin
    store (no compaction, no replay) pins the exact values."""
    kept = str(tmp_path / "kept")
    twin = str(tmp_path / "twin")
    for b in range(6):
        batch = _events(spark, b)
        decayed_batch_step(spark, batch, b, kept, num_buckets=4)
        maintain_store(spark, kept, max_chain=1, max_overlays=1, protect=b)
        decayed_batch_step(spark, batch, b, twin, num_buckets=4)
    _no_fold_at(kept, 5)
    decayed_batch_step(spark, _events(spark, 5), 5, kept, num_buckets=4)  # replay
    k = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, kept, as_of_ts="2024-01-02 00:00:00").collect()}
    t = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, twin, as_of_ts="2024-01-02 00:00:00").collect()}
    assert k == t and len(k) == 25


# ------------------------------------------------------------- postings


def test_postings_replay_after_inline_compaction(spark, tmp_path):
    idx = str(tmp_path / "idx")
    batches = [
        spark.createDataFrame(
            [Row(doc_id=b * 10 + i, text=f"alpha beta doc {b * 10 + i}")
             for i in range(10)]
        )
        for b in range(4)
    ]
    for b, docs in enumerate(batches):
        index_batch(spark, docs, b, idx, num_buckets=4)
        maintain_store(spark, idx, max_chain=1, max_overlays=1, protect=b)
    _no_fold_at(idx, 3)
    index_batch(spark, batches[3], 3, idx, num_buckets=4)  # replay
    ids = {r["doc_id"] for r in read_postings(spark, idx).collect()}
    assert ids == set(range(40))


# ---------------------------------------------------------- exact ingest


def test_exact_ingest_replay_after_inline_compaction(spark, tmp_path):
    """History-wide dedup: after replay, texts first seen in EARLIER
    batches must still be rejected (the overwritten-fold bug would
    re-accept them — membership itself is the state)."""
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [Row(doc_id=i, text=f"text {i}") for i in range(20)]
    )
    b1 = spark.createDataFrame(
        [Row(doc_id=50 + i, text=f"other {i}") for i in range(20)]
    )
    # batch 2 re-sends half of batch 0 plus novel docs
    b2 = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"text {i}") for i in range(10)]
        + [Row(doc_id=200 + i, text=f"novel {i}") for i in range(10)]
    )
    ingest_batch_exact(spark, b0, 0, out, store, num_buckets=4)
    ingest_batch_exact(spark, b1, 1, out, store, num_buckets=4)
    ingest_batch_exact(spark, b2, 2, out, store, num_buckets=4)
    fv = compact_store(spark, store, protect=2)  # in-line style fold
    assert fv == 1  # folded 0+1 strictly below the live batch
    _no_fold_at(store, 2)
    ingest_batch_exact(spark, b2, 2, out, store, num_buckets=4)  # replay
    ids = sorted(r["doc_id"] for r in read_ingested(spark, out, store).collect())
    assert ids == (
        list(range(20)) + [50 + i for i in range(20)] + [200 + i for i in range(10)]
    )


# ------------------------------------------------------------ unit pins


def test_compact_chains_protect_scopes_overlays(spark, tmp_path):
    """With protect, only overlay segments strictly below it are consumed
    and the overlay dir itself survives; the protected batch's own patch
    stays pending for merge-on-read."""
    store = str(tmp_path / "hist")
    for b in range(3):
        scd2_batch_step(
            spark, _typed(spark, CHANGES[3 * b : 3 * b + 3]), b, store,
            ["K"], num_buckets=4,
        )
    assert os.path.isdir(f"{store}/_closes")
    pre = sorted(os.listdir(f"{store}/_closes"))
    assert "v=2" in pre  # batch 2 closed earlier-batch versions
    compact_scd2(spark, store, protect=2)
    left = sorted(os.listdir(f"{store}/_closes"))
    assert left == ["v=2"]  # <2 consumed, the protected batch's kept
    got = sorted(_hkey(r) for r in read_scd2(spark, store).collect())
    truth = sorted(
        _hkey(r) for r in scd2_history(_typed(spark, CHANGES), ["K"]).collect()
    )
    assert got == truth  # compaction stayed semantically invisible


def test_compact_chains_protect_noop_when_nothing_below(spark, tmp_path):
    dec = str(tmp_path / "dec")
    decayed_batch_step(spark, _events(spark, 0), 0, dec, num_buckets=4)
    from kafka_connect_logminer2_spark.streaming.decayed import compact_decayed

    assert compact_decayed(spark, dec, protect=0) is None  # nothing below
    st = chain_stats(dec)
    assert st["max_chain"] == 1  # untouched


def test_maintain_stores_isolates_failures(spark, tmp_path):
    import pytest

    good = str(tmp_path / "good")
    for b in range(4):
        decayed_batch_step(spark, _events(spark, b), b, good, num_buckets=4)
    bad = str(tmp_path / "bad")
    # a store that claims scd2 but has no pk_cols: compact_scd2 raises
    os.makedirs(f"{bad}/b=0")
    for v in range(4):
        os.makedirs(f"{bad}/b=0/v={v}", exist_ok=True)
        open(f"{bad}/b=0/v={v}/_SUCCESS", "w").close()
    os.makedirs(f"{bad}/_commits", exist_ok=True)
    open(f"{bad}/_commits/3", "w").close()
    with open(f"{bad}/_meta.json", "w") as f:
        json.dump({"kind": "scd2", "num_buckets": 4}, f)

    # default: the sweep completes (good store maintained), THEN raises
    with pytest.raises(Exception):
        maintain_stores(spark, [bad, good], max_chain=2)
    assert chain_stats(good)["max_chain"] <= 2

    # collect mode: results hold int|None ONLY; failures land in `errors`
    errs: dict[str, Exception] = {}
    res = maintain_stores(spark, [bad, good], max_chain=2, errors=errs)
    assert bad not in res and isinstance(errs[bad], Exception)
    assert good in res and not isinstance(res[good], Exception)
    assert all(v is None or isinstance(v, int) for v in res.values())


def test_maintain_stores_protect_last_excludes_newest_batch(spark, tmp_path):
    dec = str(tmp_path / "dec")
    for b in range(6):
        decayed_batch_step(spark, _events(spark, b), b, dec, num_buckets=4)
    maintain_stores(spark, [dec], max_chain=2, protect_last=True)
    _no_fold_at(dec, 5)  # the possibly-replayable newest batch untouched
    assert chain_stats(dec)["max_chain"] <= 2


def test_chain_stats_counts_only_committed_segments(tmp_path):
    store = str(tmp_path / "ann")
    os.makedirs(f"{store}/v=0")
    open(f"{store}/v=0/_SUCCESS", "w").close()
    os.makedirs(f"{store}/v=1")  # uncommitted partial: must not count
    os.makedirs(f"{store}/_tomb/v=0")
    open(f"{store}/_tomb/v=0/_SUCCESS", "w").close()
    os.makedirs(f"{store}/_tomb/v=1")  # uncommitted overlay
    st = chain_stats(store)
    assert st["max_chain"] == 1 and st["overlays"] == 1


def test_real_spark_replay_after_inline_compaction(spark, tmp_path):
    """The gold version of the scenario, driven by Spark's OWN replay
    machinery instead of a hand-called batch step: run the decayed
    writer (inline maintenance, max_chain=1 → compaction fires every
    batch), then delete the LAST batch's entry from the streaming
    checkpoint's commit log — exactly the crash window the protect
    contract exists for — and restart. Spark replays that batch with the
    same batch_id; the store must read value-identical to an
    unmaintained twin."""
    import glob
    import os
    import shutil

    from kafka_connect_logminer2_spark.streaming.decayed import (
        write_decayed_counters,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    twin = str(tmp_path / "twin")
    for b in range(6):
        df = _events(spark, b)
        df.coalesce(1).write.parquet(f"{tmp_path}/stage{b}")
        part = glob.glob(f"{tmp_path}/stage{b}/part*")[0]
        shutil.copy(part, f"{src}/f{b}.parquet")
        os.utime(f"{src}/f{b}.parquet", (1_700_000_000 + b * 10,) * 2)
        decayed_batch_step(spark, df, b, twin, num_buckets=4)

    out, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def run():
        q = write_decayed_counters(
            spark.readStream.schema("user_id long, value double, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            out, ckpt, num_buckets=4, max_chain=1,
        )
        assert q.awaitTermination(600)
        # availableNow self-terminates, but Spark 4 keeps the checkpoint
        # registered to the query until an explicit stop — without it the
        # restart trips the concurrent-checkpoint-use guard
        q.stop()

    run()
    commits = sorted(
        glob.glob(f"{ckpt}/commits/[0-9]*"),
        key=lambda p: int(os.path.basename(p)),
    )
    assert len(commits) == 6  # one micro-batch per staged file
    os.remove(commits[-1])  # crash window: store committed, Spark did not
    # a real crash leaves no checksum either; a stale Hadoop .crc makes
    # the recommit's rename fail (misreported as concurrent checkpoint use)
    crc = os.path.join(os.path.dirname(commits[-1]),
                       f".{os.path.basename(commits[-1])}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()  # restart replays batch 5 against the compacted store

    k = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, out, as_of_ts="2024-01-02 00:00:00").collect()}
    t = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, twin, as_of_ts="2024-01-02 00:00:00").collect()}
    assert k == t and len(k) == 25


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_batches=st.integers(min_value=3, max_value=6),
    maintain_mask=st.lists(st.booleans(), min_size=6, max_size=6),
    max_chain=st.integers(min_value=0, max_value=2),
    data=st.data(),
)
def test_property_any_compaction_schedule_survives_replays(
    spark, tmp_path_factory, n_batches, maintain_mask, max_chain, data
):
    """Generalization of the per-store replay pins: for ANY schedule of
    protected inline compactions (any subset of batches, any max_chain
    policy) and ANY replayed suffix batch, the decayed store reads
    value-identical to an unmaintained, never-replayed twin. Hypothesis
    drives the schedule; the protect contract is what makes every path
    equivalent."""
    tmp = tmp_path_factory.mktemp("sched")
    kept, twin = str(tmp / "kept"), str(tmp / "twin")
    for b in range(n_batches):
        batch = _events(spark, b, n=25)
        decayed_batch_step(spark, batch, b, kept, num_buckets=4)
        if maintain_mask[b]:
            maintain_store(spark, kept, max_chain=max_chain,
                           max_overlays=max_chain, protect=b)
        decayed_batch_step(spark, batch, b, twin, num_buckets=4)
    # replay any batch that could still be uncommitted in Spark's log:
    # the newest one (earlier batches always have commit-log entries)
    if data.draw(st.booleans(), label="replay"):
        decayed_batch_step(
            spark, _events(spark, n_batches - 1, n=25), n_batches - 1,
            kept, num_buckets=4,
        )
    k = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, kept, as_of_ts="2024-01-02 00:00:00").collect()}
    t = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, twin, as_of_ts="2024-01-02 00:00:00").collect()}
    assert k == t
