"""Video-ingest store cost probe: is the per-batch work O(batch), with
store WRITES independent of the resident clip population?

For m in (1, 4, 10): seed the keys/sigs sub-stores DIRECTLY with m×BASE
synthetic clip signatures (store mechanics are what scales — the decode
pass is per-batch and fixture-sized either way), then ingest ONE fixed
8-clip batch and record wall seconds plus the BYTES that batch's delta
segments added to each sub-store. The delta-chain claim is the bytes
curve: FLAT as the history grows 10× (a design that rewrote signature
state per batch would scale it ∝ m). The candidate probe reads only the
buckets the batch's ~128 band keys hash into — at num_buckets=256 that
is already a minority of the store, and the fraction shrinks linearly
as num_buckets grows with the deployment (the same touched-bucket
discipline as the text ingest stores).

The store layer is modality-generic (streaming/video_ingest.py's
_ingest_batch_media), so the probe runs for any of the three media
kinds; image/audio seed single-scene / 4-chunk signature shapes.

Usage: python tools/video_ingest_probe.py                  # video, BASE=50k
       python tools/video_ingest_probe.py 5000             # smaller base
       python tools/video_ingest_probe.py 5000 image,audio # other kinds
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_logminer2_spark.functions import multimodal as M  # noqa: E402
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.streaming.corpus_ingest import (  # noqa: E402
    _ensure_meta,
    _write_delta,
)
from kafka_connect_logminer2_spark.streaming.snapshot import (  # noqa: E402
    _mark_committed,
)
from kafka_connect_logminer2_spark.streaming.video_ingest import (  # noqa: E402
    _key_bucket,
    _keys_dir,
    _sig_bucket,
    _sigs_dir,
    ingest_batch_audio,
    ingest_batch_image,
    ingest_batch_video,
)

MODALITIES = {
    # (fixture, ingest fn, key meta, scenes per item)
    "video": (
        lambda spark: M.video_scene_fixture(spark, n_clips=8),
        ingest_batch_video,
        {"kind": "video_keys", "tau": 10, "min_scene_sim": 0.6,
         "min_change_bits": 12},
        "video_sigs",
        4,
    ),
    "image": (
        lambda spark: M.image_neardup_fixture(spark, n=8, planted=0),
        ingest_batch_image,
        {"kind": "image_keys", "tau": 10},
        "image_sigs",
        1,
    ),
    "audio": (
        lambda spark: M.audio_neardup_fixture(spark, n=8, planted=0),
        ingest_batch_audio,
        {"kind": "audio_keys", "tau": 3, "min_chunk_sim": 0.75,
         "n_chunks": 4},
        "audio_sigs",
        4,
    ),
}

MULTIPLIERS = (1, 4, 10)
NUM_BUCKETS = 256


def _delta_bytes(store: str, batch_id: int) -> int:
    total = 0
    for b in os.listdir(store):
        vdir = os.path.join(store, b, f"v={batch_id}")
        if os.path.isdir(vdir):
            for f in os.listdir(vdir):
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(vdir, f))
    return total


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    kinds = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["video"])
    spark = get_spark(
        app_name="video_ingest_probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for kind in kinds:
        fixture, ingest, key_meta, sig_kind, scenes = MODALITIES[kind]
        batch = fixture(spark).localCheckpoint()
        _probe_kind(spark, kind, batch, ingest, key_meta, sig_kind, scenes, base)
    spark.stop()


def _probe_kind(spark, kind, batch, ingest, key_meta, sig_kind, scenes, base):
    for m in MULTIPLIERS:
        tmp = tempfile.mkdtemp(prefix=f"{kind}_probe_")
        try:
            store = os.path.join(tmp, "state")
            kd, sd = _keys_dir(store), _sigs_dir(store)
            from kafka_connect_logminer2_spark.streaming.video_ingest import (
                _KEY_BUCKET_LAYOUT,
            )

            _ensure_meta(kd, {**key_meta, "num_buckets": NUM_BUCKETS,
                              "bucket_layout": _KEY_BUCKET_LAYOUT})
            _ensure_meta(sd, {"kind": sig_kind, "num_buckets": NUM_BUCKETS})
            n_clips = m * base
            # synthetic history: deterministic pseudo-random 64-bit scene
            # hashes (split in halves) — textually impossible to collide
            # with the fixture batch, which is the point: the probe
            # measures store mechanics, not verify outcomes
            sigs = (
                spark.range(n_clips * scenes)
                .select(
                    (F.col("id") % n_clips + 1_000_000).alias("media_id"),
                    (F.col("id") / n_clips).cast("int").alias("scene_idx"),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1 << 32))
                    .cast("long")
                    .alias("_hi"),
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1 << 32))
                    .cast("long")
                    .alias("_lo"),
                )
            )
            keys = M.scene_band_rows(sigs).withColumn(
                "_b", _key_bucket(NUM_BUCKETS)
            )
            _write_delta(keys.select("band", "val", "scene_idx", "media_id", "_b"),
                         kd, 0)
            _write_delta(sigs.withColumn("_b", _sig_bucket(NUM_BUCKETS)), sd, 0)
            _mark_committed(kd, 0)
            _mark_committed(sd, 0)

            t0 = time.time()
            ingest(
                spark, batch, 1, os.path.join(tmp, "out"), store,
                num_buckets=NUM_BUCKETS,
            )
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "probe": f"{kind}_ingest_batch",
                        "history_clips": n_clips,
                        "batch_clips": 8,
                        "sec": round(dt, 2),
                        "keys_delta_bytes": _delta_bytes(kd, 1),
                        "sigs_delta_bytes": _delta_bytes(sd, 1),
                    }
                )
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()


# design note: the seed write itself is one partitioned Spark job per
# sub-store (the _write_delta contract); history cost is paid once here,
# never per probe batch — reference: streaming/video_ingest.py docstring.
