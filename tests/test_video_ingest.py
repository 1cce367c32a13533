"""Incremental video ingestion (streaming/video_ingest.py): history-wide
re-encode rejection, in-batch min-id cluster rule, retry idempotence,
commit-marker visibility gating, scene-less acceptance, compaction
identity — the corpus_ingest contract suite applied to the video store."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions import multimodal as M
from kafka_connect_logminer2_spark.streaming.maintenance import maintain_store
from kafka_connect_logminer2_spark.streaming.video_ingest import (
    compact_video_store,
    ingest_batch_video,
    read_video_ingested,
    video_store_size,
)


def _clips(spark, n=8):
    return M.video_scene_fixture(spark, n_clips=n)


def _re_enc(rows, i, new_id, fps=10, noise=2):
    return {
        "media_id": new_id, "kind": "video", "mime": "video/avi",
        "payload": M.reencode_avi(bytes(rows[i]["payload"]), noise=noise,
                                  seed=i, fps=fps),
        "meta_json": rows[i]["meta_json"],
    }


def _accepted(spark, out, store):
    df = read_video_ingested(spark, out, store)
    return sorted((r["batch"], r["media_id"])
                  for r in df.select("batch", "media_id").collect())


def test_history_rejects_reencodes_accepts_new(spark, tmp_path):
    allc = _clips(spark)
    rows = {r["media_id"]: r for r in allc.collect()}
    b0 = allc.filter("media_id < 6").unionByName(
        spark.createDataFrame([_re_enc(rows, 0, 50)], schema=M.MEDIA_SCHEMA)
    )
    b1 = allc.filter("media_id >= 6").unionByName(
        spark.createDataFrame([_re_enc(rows, 1, 101), _re_enc(rows, 2, 102)],
                              schema=M.MEDIA_SCHEMA)
    )
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    ingest_batch_video(spark, b0, 0, out, store)
    ingest_batch_video(spark, b1, 1, out, store)
    assert _accepted(spark, out, store) == [
        (0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7)
    ]
    assert video_store_size(spark, store) == 8

    # retry of batch 1 overwrites its own segments byte-identically
    ingest_batch_video(spark, b1, 1, out, store)
    assert _accepted(spark, out, store) == [
        (0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7)
    ]
    assert video_store_size(spark, store) == 8

    # compaction folds chains without changing acceptance state
    res = compact_video_store(spark, store)
    assert res["keys"] == 1 and res["sigs"] == 1
    assert video_store_size(spark, store) == 8
    b2 = spark.createDataFrame([_re_enc(rows, 3, 203, fps=3, noise=4)],
                               schema=M.MEDIA_SCHEMA)
    ingest_batch_video(spark, b2, 2, out, store)  # still rejected post-compact
    assert (2, 203) not in _accepted(spark, out, store)


def test_sceneless_clip_accepted_and_gating(spark, tmp_path):
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    junk = spark.createDataFrame(
        [{"media_id": 9, "kind": "video", "mime": "video/avi",
          "payload": b"not an avi at all", "meta_json": "{}"}],
        schema=M.MEDIA_SCHEMA,
    )
    ingest_batch_video(spark, junk, 0, out, store)
    assert _accepted(spark, out, store) == [(0, 9)]  # no scenes: accepted as-is

    # a torn batch (output written, store not committed) stays invisible
    clips = _clips(spark, n=2)
    clips.withColumn("batch", F.lit(1)).drop("batch")  # no-op, clarity only
    clips.write.mode("overwrite").parquet(f"{out}/batch=1")
    assert _accepted(spark, out, store) == [(0, 9)]


def test_maintenance_dispatch_bounds_video_chains(spark, tmp_path):
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    allc = _clips(spark, n=8).collect()
    for b in range(8):
        one = spark.createDataFrame([allc[b]], schema=M.MEDIA_SCHEMA)
        ingest_batch_video(spark, one, b, out, store)
        for sub in ("keys", "sigs"):
            maintain_store(spark, os.path.join(store, sub), max_chain=3,
                           max_overlays=3)
    for sub in ("keys", "sigs"):
        sdir = os.path.join(store, sub)
        for d in os.listdir(sdir):
            if d.startswith("b="):
                vs = [v for v in os.listdir(os.path.join(sdir, d))
                      if v.startswith("v=")]
                assert len(vs) <= 4, (sub, d, vs)
    assert video_store_size(spark, store) == 8


def test_streaming_writer_matches_batch_steps(spark, tmp_path):
    """write_video_ingest over a file stream (one staged file per
    micro-batch) must land exactly the batch-step acceptance set, with
    maintenance self-scheduled (max_chain) along the way."""
    import glob
    import shutil
    import time

    from kafka_connect_logminer2_spark.streaming.video_ingest import (
        write_video_ingest,
    )

    tmp = str(tmp_path)
    allc = _clips(spark, n=8)
    rows = {r["media_id"]: r for r in allc.collect()}
    b0 = allc.filter("media_id < 6").unionByName(
        spark.createDataFrame([_re_enc(rows, 0, 50)], schema=M.MEDIA_SCHEMA)
    )
    b1 = allc.filter("media_id >= 6").unionByName(
        spark.createDataFrame([_re_enc(rows, 1, 101), _re_enc(rows, 2, 102)],
                              schema=M.MEDIA_SCHEMA)
    )
    os.makedirs(f"{tmp}/in")
    now = time.time()
    for i, df in enumerate([b0, b1]):
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    q = write_video_ingest(
        spark.readStream.schema(M.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in"),
        f"{tmp}/out",
        f"{tmp}/store",
        f"{tmp}/ckpt",
        max_chain=1,  # force the self-scheduled compaction path
    )
    q.awaitTermination(300)
    got = _accepted(spark, f"{tmp}/out", f"{tmp}/store")
    assert [m for _, m in got] == [0, 1, 2, 3, 4, 5, 6, 7]
    assert video_store_size(spark, f"{tmp}/store") == 8
    # max_chain=1 means every bucket folded after each batch
    for sub in ("keys", "sigs"):
        sdir = os.path.join(f"{tmp}/store", sub)
        for d in os.listdir(sdir):
            if d.startswith("b="):
                vs = [v for v in os.listdir(os.path.join(sdir, d))
                      if v.startswith("v=")]
                assert len(vs) <= 2, (sub, d, vs)


def _media_case(spark, modality):
    """(writer_fn, b0, b1) per modality — the cdc27/28/29 fixture split:
    batch 0 = originals 0–5 + an in-batch re-encode of 0 (id 100, min-id
    rule); batch 1 = new 6–7 + re-encodes of 1–2 (ids 101/102, rejected
    against the PERSISTED store across a stream restart)."""
    from kafka_connect_logminer2_spark.streaming.video_ingest import (
        write_audio_ingest,
        write_image_ingest,
        write_video_ingest,
    )

    if modality == "video":
        allc = _clips(spark)
        rows = {r["media_id"]: r for r in allc.collect()}
        b0 = allc.filter("media_id < 6").unionByName(
            spark.createDataFrame([_re_enc(rows, 0, 100)], schema=M.MEDIA_SCHEMA)
        )
        b1 = allc.filter("media_id >= 6").unionByName(
            spark.createDataFrame(
                [_re_enc(rows, 1, 101), _re_enc(rows, 2, 102)],
                schema=M.MEDIA_SCHEMA,
            )
        )
        return write_video_ingest, b0, b1
    fixture = (
        M.image_neardup_fixture if modality == "image" else M.audio_neardup_fixture
    )
    allm = fixture(spark, n=8, planted=3)
    b0 = allm.filter("media_id < 6 or media_id = 100")
    b1 = allm.filter("media_id in (6, 7, 101, 102)")
    writer = write_image_ingest if modality == "image" else write_audio_ingest
    return writer, b0, b1


@pytest.mark.parametrize("modality", ["video", "image", "audio"])
def test_media_stream_restart_resume_with_compaction(spark, tmp_path, modality):
    """r8 verdict #3: each modality's file-stream writer × (stream,
    restart-resume, self-scheduled compaction). Batch 0 streams and the
    query STOPS; batch 1 arrives and a NEW query resumes from the same
    checkpoint — its re-encodes must be rejected against the PERSISTED
    store (not in-batch state), with max_chain=1 compaction running
    in-line both times and the chains staying folded."""
    import glob
    import shutil
    import time

    from kafka_connect_logminer2_spark.streaming.video_ingest import (
        video_store_size,
    )

    tmp = str(tmp_path)
    writer, b0, b1 = _media_case(spark, modality)
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i, df):
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        q = writer(
            spark.readStream.schema(M.MEDIA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/out",
            f"{tmp}/store",
            f"{tmp}/ckpt",
            max_chain=1,
        )
        q.awaitTermination(300)
        q.stop()  # Spark 4: release the checkpoint before a restart

    stage(0, b0)
    run()
    assert [m for _, m in _accepted(spark, f"{tmp}/out", f"{tmp}/store")] == [
        0, 1, 2, 3, 4, 5,
    ]

    stage(1, b1)
    run()  # restart from the same checkpoint
    got = _accepted(spark, f"{tmp}/out", f"{tmp}/store")
    assert got == [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
                   (1, 6), (1, 7)]
    assert video_store_size(spark, f"{tmp}/store") == 8
    for sub in ("keys", "sigs"):
        sdir = os.path.join(f"{tmp}/store", sub)
        for d in os.listdir(sdir):
            if d.startswith("b="):
                vs = [v for v in os.listdir(os.path.join(sdir, d))
                      if v.startswith("v=")]
                assert len(vs) <= 2, (modality, sub, d, vs)
