"""Store-maintenance lifecycle (streaming/maintenance.py): a long stream's
chains must stay BOUNDED because compaction triggers itself — the r6
verdict #6 gap (every store had a compactor, nothing scheduled it). The
writer loop here is exactly what the streaming writers run per batch:
batch_step -> maintain_store(max_chain)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import Row

from kafka_connect_logminer2_spark.streaming.decayed import (
    decayed_batch_step,
    read_decayed,
)
from kafka_connect_logminer2_spark.streaming.maintenance import (
    chain_stats,
    maintain_store,
    maintain_stores,
    needs_maintenance,
)
from kafka_connect_logminer2_spark.streaming.search_index import (
    delete_docs,
    index_batch,
    read_postings,
)


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


def _max_chain(store):
    return chain_stats(store)["max_chain"]


def test_long_stream_chains_stay_bounded_and_values_exact(spark, tmp_path):
    """20 batches with max_chain=4 vs an unmaintained twin: the maintained
    store's longest chain stays ≤ 4 (the twin's grows ~20), and the read
    is value-identical — compaction changed cost, never content."""
    kept = str(tmp_path / "kept")
    wild = str(tmp_path / "wild")
    for b in range(20):
        batch = _events(spark, b)
        decayed_batch_step(spark, batch, b, kept, num_buckets=4)
        # exactly the writers' in-line call: the live batch is protected
        maintain_store(spark, kept, max_chain=4, max_overlays=4, protect=b)
        decayed_batch_step(spark, batch, b, wild, num_buckets=4)
    assert _max_chain(wild) >= 15  # the unmaintained twin really grew
    assert _max_chain(kept) <= 4

    k = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, kept, as_of_ts="2024-01-02 00:00:00").collect()}
    w = {r["user_id"]: (round(r["decayed_value"], 9), r["n_events"])
         for r in read_decayed(spark, wild, as_of_ts="2024-01-02 00:00:00").collect()}
    assert k == w and len(k) == 25


def test_overlay_trigger_compacts_tombstones(spark, tmp_path):
    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta doc {i}") for i in range(30)]
    )
    index_batch(spark, docs, 0, idx, num_buckets=4)
    for b in range(1, 11):  # ten tiny deletes -> overlay pileup
        delete_docs(spark, idx,
                    spark.createDataFrame([Row(doc_id=b)]), batch_id=b)
    assert chain_stats(idx)["overlays"] == 10
    assert needs_maintenance(idx, max_chain=8, max_overlays=8)
    assert maintain_store(spark, idx, max_chain=8, max_overlays=8) is not None
    assert chain_stats(idx)["overlays"] == 0  # consumed physically
    ids = {r["doc_id"] for r in read_postings(spark, idx).collect()}
    assert ids == set(range(30)) - set(range(1, 11))


def test_noop_below_bounds_and_unknown_kind_untouched(spark, tmp_path):
    dec = str(tmp_path / "dec")
    decayed_batch_step(spark, _events(spark, 0), 0, dec, num_buckets=4)
    assert maintain_store(spark, dec, max_chain=8) is None  # short chain: no-op

    alien = str(tmp_path / "alien")
    os.makedirs(f"{alien}/b=0/v=0")
    for v in range(20):
        os.makedirs(f"{alien}/b=0/v={v}", exist_ok=True)
        open(f"{alien}/b=0/v={v}/_SUCCESS", "w").close()
    assert maintain_store(spark, alien, max_chain=2) is None  # no meta: refuse

    res = maintain_stores(spark, [dec, alien], max_chain=2)
    assert res[alien] is None


def test_discover_stores_and_sweep_root(spark, tmp_path):
    """discover_stores finds every maintainable store under a state root
    (incl. the video store's two sub-stores) and skips non-store dirs; a
    root sweep then compacts only what needs it."""
    from kafka_connect_logminer2_spark.streaming.maintenance import (
        discover_stores,
    )
    from kafka_connect_logminer2_spark.functions import multimodal as M
    from kafka_connect_logminer2_spark.streaming.video_ingest import (
        ingest_batch_video,
    )

    root = str(tmp_path / "state")
    dec = os.path.join(root, "decayed_counters")
    for b in range(6):
        decayed_batch_step(spark, _events(spark, b), b, dec, num_buckets=4)
    vstore = os.path.join(root, "video")
    clips = M.video_scene_fixture(spark, n_clips=2)
    ingest_batch_video(spark, clips, 0, os.path.join(root, "video_out"), vstore)
    os.makedirs(os.path.join(root, "not_a_store", "stuff"))

    found = sorted(discover_stores(root))
    assert found == sorted(
        [dec, os.path.join(vstore, "keys"), os.path.join(vstore, "sigs")]
    )
    res = maintain_stores(spark, found, max_chain=2)
    assert res[dec] is not None  # 6-segment chains compacted
    assert _max_chain(dec) <= 2


def test_ingest_writers_inline_maintenance_bounds_chains(spark, tmp_path):
    """r8 parity: the corpus ingest stores' writer loop (batch_step ->
    maintain_store(protect=batch_id), what write_dedup_ingest now runs
    in-line) keeps chains bounded with membership exact — including a
    replay of the last batch right after a compaction."""
    from pyspark.sql import Row

    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
        read_ingested,
    )

    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    for b in range(12):
        batch = spark.createDataFrame(
            # half novel, half re-sends of batch 0 texts
            [Row(doc_id=b * 100 + i, text=f"novel {b} {i}") for i in range(5)]
            + [Row(doc_id=b * 100 + 50 + i, text=f"novel 0 {i}") for i in range(5)]
        )
        ingest_batch_exact(spark, batch, b, out, store, num_buckets=4)
        maintain_store(spark, store, max_chain=2, max_overlays=2, protect=b)
    assert _max_chain(store) <= 3  # fold + protected live deltas
    ids = sorted(r["doc_id"] for r in read_ingested(spark, out, store).collect())
    # batch 0's own "novel 0 i" re-sends are IN-batch dups (min-id wins);
    # later batches' re-sends are rejected against the folded history
    want = sorted(b * 100 + i for b in range(12) for i in range(5))
    assert ids == want
