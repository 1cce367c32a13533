"""Incremental image/audio ingestion (r7 verdict #2) — the
modality-generic media store (streaming/video_ingest.py) applied to
q157's image hashes and q158's audio chunk fingerprints: history-wide
re-encode/re-master rejection, in-batch min-id rule, retry idempotence,
compaction identity, maintenance dispatch on the new kinds — the same
contract suite the video store carries. Plus the r7 verdict #8 depth
pin: a 50+ batch stream keeps BOTH sub-stores' chains bounded with
values exact."""

from __future__ import annotations

import os

import numpy as np
import pytest

from kafka_connect_logminer2_spark.functions import multimodal as M
from kafka_connect_logminer2_spark.streaming.maintenance import (
    chain_stats,
    discover_stores,
    maintain_store,
)
from kafka_connect_logminer2_spark.streaming.video_ingest import (
    ingest_batch_audio,
    ingest_batch_image,
    ingest_batch_video,
    read_audio_ingested,
    read_image_ingested,
    read_video_ingested,
    video_store_size,
)


def _accepted(spark, reader, out, store):
    df = reader(spark, out, store)
    return sorted((r["batch"], r["media_id"])
                  for r in df.select("batch", "media_id").collect())


def _image_reencode(row, new_id, seed):
    arr = M.decode_image(bytes(row["payload"]))
    rng = np.random.default_rng(seed)
    noisy = np.clip(
        arr.astype(np.int16) + rng.integers(-2, 3, size=arr.shape), 0, 255
    ).astype(np.uint8)
    return {"media_id": new_id, "kind": "image", "mime": "image/bmp",
            "payload": M.bmp_payload(noisy), "meta_json": "{}"}


def test_image_history_rejects_reencodes(spark, tmp_path):
    allm = M.image_neardup_fixture(spark, n=8, planted=3)
    rows = {r["media_id"]: r for r in allm.collect()}
    b0 = allm.filter("media_id < 6 or media_id = 100")  # 100 = re-enc of 0
    b1 = allm.filter("media_id in (6, 7, 101, 102)")
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    ingest_batch_image(spark, b0, 0, out, store)
    ingest_batch_image(spark, b1, 1, out, store)
    want = [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7)]
    assert _accepted(spark, read_image_ingested, out, store) == want

    ingest_batch_image(spark, b1, 1, out, store)  # retry: byte-idempotent
    assert _accepted(spark, read_image_ingested, out, store) == want
    assert video_store_size(spark, store) == 8  # layout shared with video

    # compaction identity: fold both sub-stores, rejection still works
    for sub in ("keys", "sigs"):
        assert maintain_store(spark, os.path.join(store, sub),
                              max_chain=0, max_overlays=0) == 1
    b2 = spark.createDataFrame(
        [_image_reencode(rows[3], 203, seed=99)], schema=M.MEDIA_SCHEMA
    )
    ingest_batch_image(spark, b2, 2, out, store)
    assert (2, 203) not in _accepted(spark, read_image_ingested, out, store)


def test_key_bucket_layout_is_meta_guarded(spark, tmp_path):
    """r10-advice regression: a keys store written under a different
    _key_bucket placement formula (e.g. pre-r10 layout hashing
    (band, val, scene_idx)) must RAISE on resume — probing it with the
    current formula would silently miss old rows and re-accept
    duplicates."""
    import json

    allm = M.image_neardup_fixture(spark, n=4, planted=0)
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    ingest_batch_image(spark, allm.filter("media_id < 2"), 0, out, store)
    mp = os.path.join(store, "keys", "_meta.json")
    with open(mp) as f:
        meta = json.load(f)
    assert meta["bucket_layout"] == 2
    # simulate a store written before the layout-version key existed
    del meta["bucket_layout"]
    with open(mp, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="bucket_layout"):
        ingest_batch_image(spark, allm.filter("media_id >= 2"), 1, out, store)


def test_audio_history_rejects_remasters(spark, tmp_path):
    allm = M.audio_neardup_fixture(spark, n=8, planted=3)
    b0 = allm.filter("media_id < 6 or media_id = 100")
    b1 = allm.filter("media_id in (6, 7, 101, 102)")
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    ingest_batch_audio(spark, b0, 0, out, store)
    ingest_batch_audio(spark, b1, 1, out, store)
    want = [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7)]
    assert _accepted(spark, read_audio_ingested, out, store) == want

    # undecodable payload: no chunks -> accepted as-is (byte-exact dedup
    # owns those), exactly the video no-scene rule
    junk = spark.createDataFrame(
        [{"media_id": 9, "kind": "audio", "mime": "audio/wav",
          "payload": b"not audio", "meta_json": "{}"}],
        schema=M.MEDIA_SCHEMA,
    )
    ingest_batch_audio(spark, junk, 2, out, store)
    assert (2, 9) in _accepted(spark, read_audio_ingested, out, store)


def test_new_kinds_discovered_and_dispatched(spark, tmp_path):
    root = str(tmp_path / "state")
    img = M.image_neardup_fixture(spark, n=4, planted=0)
    aud = M.audio_neardup_fixture(spark, n=4, planted=0)
    ingest_batch_image(spark, img, 0, f"{root}/img_out", f"{root}/img_store")
    ingest_batch_audio(spark, aud, 0, f"{root}/aud_out", f"{root}/aud_store")
    found = sorted(discover_stores(root))
    assert found == sorted(
        f"{root}/{s}/{p}" for s in ("img_store", "aud_store")
        for p in ("keys", "sigs")
    )
    # kind-dispatched compaction folds each (force via max_chain=0)
    for d in found:
        assert maintain_store(spark, d, max_chain=0, max_overlays=0) == 0


def test_cross_modal_history_rejection(spark, tmp_path):
    """cdc37's contract at unit scope: images duplicating a COMMITTED clip
    scene are rejected against the video store (unaligned, q164); audio
    re-mastering a committed clip's soundtrack is rejected against the
    akeys/asigs shadow (chunk-aligned, q168); every distractor on both
    axes survives."""
    videos, images, audios = M.cross_modal_ingest_fixture(spark)
    root = str(tmp_path)
    vstore = f"{root}/vstore"
    ingest_batch_video(spark, videos, 0, f"{root}/vout", vstore,
                       audio_track=True)
    ingest_batch_image(spark, images, 0, f"{root}/iout", f"{root}/istore",
                       video_store_dir=vstore)
    ingest_batch_audio(spark, audios, 0, f"{root}/aout", f"{root}/astore",
                       video_store_dir=vstore)
    assert _accepted(spark, read_image_ingested, f"{root}/iout",
                     f"{root}/istore") == [(0, 400 + i) for i in range(8)]
    assert _accepted(spark, read_audio_ingested, f"{root}/aout",
                     f"{root}/astore") == [(0, 100 + i) for i in range(6)]
    # the video side itself accepted everything (all clips distinct)
    assert _accepted(spark, read_video_ingested, f"{root}/vout", vstore) == [
        (0, i) for i in range(10)
    ]
    # shadow sub-stores are real stores: discovered + kind-dispatched
    found = discover_stores(vstore)
    assert {os.path.basename(d) for d in found} == {"keys", "sigs",
                                                    "akeys", "asigs"}
    for d in found:
        assert maintain_store(spark, d, max_chain=0, max_overlays=0) == 0
    # ...and the probe still rejects after compaction folded the chains
    ingest_batch_image(spark, images.filter("media_id = 200"), 1,
                       f"{root}/iout", f"{root}/istore",
                       video_store_dir=vstore)
    assert (1, 200) not in _accepted(spark, read_image_ingested,
                                     f"{root}/iout", f"{root}/istore")


def test_cross_modal_probe_reads_committed_only(spark, tmp_path):
    """A video batch whose store commit markers are missing (crash before
    commit) must NOT reject cross-modal arrivals — the probe reads the
    other store's COMMITTED watermark, never in-flight segments."""
    import shutil

    videos, images, _ = M.cross_modal_ingest_fixture(spark)
    root = str(tmp_path)
    vstore = f"{root}/vstore"
    ingest_batch_video(spark, videos, 0, f"{root}/vout", vstore,
                       audio_track=True)
    for sub in ("keys", "sigs"):
        shutil.rmtree(f"{vstore}/{sub}/_commits")
    ingest_batch_image(spark, images, 0, f"{root}/iout", f"{root}/istore",
                       video_store_dir=vstore)
    got = _accepted(spark, read_image_ingested, f"{root}/iout",
                    f"{root}/istore")
    # planted 200-202 sail through: nothing in the video store is committed
    assert got == sorted([(0, 200 + i) for i in range(3)]
                         + [(0, 400 + i) for i in range(8)])


def test_media_takedown_frees_store_and_cross_modal(spark, tmp_path):
    """remove_batch_media (cdc42): a taken-down clip stops rejecting —
    within-modality re-encodes AND cross-modal image probes — while
    untouched clips stay protected; compaction applies the tombstones
    physically and the post-takedown re-ingest stays protected after."""
    from kafka_connect_logminer2_spark.streaming.video_ingest import (
        compact_video_store,
        remove_batch_media,
        video_store_size,
    )

    videos, images, _ = M.cross_modal_ingest_fixture(spark)
    root = str(tmp_path)
    vstore = f"{root}/vstore"
    ingest_batch_video(spark, videos, 0, f"{root}/vout", vstore)
    assert video_store_size(spark, vstore) == 10
    # take down clip 0 — the clip image 200 duplicates
    remove_batch_media(
        spark, spark.createDataFrame([(0,)], "media_id long"), 1, vstore
    )
    assert video_store_size(spark, vstore) == 9
    # cross-modal: image 200 (re-encode of clip 0 scene 1) now ACCEPTED;
    # images 201/202 (clips 1/2, still protected) rejected
    ingest_batch_image(spark, images, 2, f"{root}/iout", f"{root}/istore",
                       video_store_dir=vstore)
    got = _accepted(spark, read_image_ingested, f"{root}/iout",
                    f"{root}/istore")
    assert got == sorted([(2, 200)] + [(2, 400 + i) for i in range(8)])
    # compaction applies the tombstone physically; protection unchanged
    res = compact_video_store(spark, vstore)
    assert res["keys"] is not None and res["sigs"] is not None
    assert not os.path.isdir(f"{vstore}/keys/_tomb")
    assert video_store_size(spark, vstore) == 9
    rows = {r["media_id"]: r for r in videos.collect()}
    rng_payload = M.reencode_avi(bytes(rows[1]["payload"]), noise=2, seed=3,
                                 fps=10)
    again = spark.createDataFrame(
        [{"media_id": 300, "kind": "video", "mime": "video/avi",
          "payload": rng_payload, "meta_json": "{}"}],
        schema=M.MEDIA_SCHEMA,
    )
    ingest_batch_video(spark, again, 3, f"{root}/vout", vstore)
    assert (3, 300) not in _accepted(spark, read_video_ingested,
                                     f"{root}/vout", vstore)


@pytest.mark.slow
def test_depth_50_batches_chains_bounded_values_exact(spark, tmp_path):
    """r7 verdict #8: the in-line maintenance loop (the writers' exact
    call, protect=batch_id) over a 52-batch stream keeps BOTH sub-stores
    at O(buckets · max_chain) committed segments, with the acceptance
    set exact the whole way — read cost stays flat on an unbounded
    stream. Uses the video modality (cdc27's store) per the verdict."""
    allc = M.video_scene_fixture(spark, n_clips=52).collect()
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    max_chain = 4
    for b in range(52):
        one = spark.createDataFrame([allc[b]], schema=M.MEDIA_SCHEMA)
        ingest_batch_video(spark, one, b, out, store)
        for sub in ("keys", "sigs"):
            maintain_store(spark, os.path.join(store, sub),
                           max_chain=max_chain, max_overlays=max_chain,
                           protect=b)
    for sub in ("keys", "sigs"):
        sdir = os.path.join(store, sub)
        st = chain_stats(sdir)
        # fold + at most max_chain live deltas per bucket (protect keeps
        # the newest batch unfolded, so the bound is max_chain+1)
        assert st["max_chain"] <= max_chain + 1, (sub, st)
        n_buckets = len([d for d in os.listdir(sdir) if d.startswith("b=")])
        assert st["total_segments"] <= n_buckets * (max_chain + 1), (sub, st)
    assert video_store_size(spark, store) == 52
    got = sorted(
        r["media_id"]
        for r in read_video_ingested(spark, out, store)
        .select("media_id").collect()
    )
    assert got == list(range(52))


def test_media_pipeline_ledger_and_survivors(spark):
    """q161's composition (functions/multimodal.py::media_pipeline): the
    pytest twin of the oracle — full planted fixture, ledger literal
    match, survivors == the planted keepers across all three
    modalities."""
    from kafka_connect_logminer2_spark.plans.queries import q161_media_pipeline

    rows = {
        (r["stage"], r["modality"]): (r["n_items"], r["id_sum"])
        for r in q161_media_pipeline(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows[("00_raw", "image")] == (10, 2017)
    assert rows[("01_decoded", "video")] == (6, 13007)  # junk container out
    assert rows[("02_quality", "audio")] == (8, 8216)  # 0.05s clip out
    assert rows[("03_dedup", "image")] == (6, 15)  # BMP re-encodes out
    assert rows[("03_dedup", "audio")] == (6, 6015)
    assert rows[("03_dedup", "video")] == (4, 8006)
    assert len(rows) == 12
