"""Frame-level video near-dup (functions/multimodal.py:
extract_scene_frames + video_neardup_pairs): a re-encoded duplicate clip
(new container bytes, pixel noise, different fps) must be found, distinct
clips must not collide, scene-cut sampling must collapse repeated frames,
and the boilerplate band cap must bound a shared-intro hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions import multimodal as M


def _with_reencodes(spark, base, ids, noise=2, fps=10):
    rows = {r["media_id"]: r for r in base.collect()}
    dup = [
        {
            "media_id": 100 + i,
            "kind": "video",
            "mime": "video/avi",
            "payload": M.reencode_avi(bytes(rows[i]["payload"]), noise=noise,
                                      seed=i, fps=fps),
            "meta_json": rows[i]["meta_json"],
        }
        for i in ids
    ]
    return base.unionByName(spark.createDataFrame(dup, schema=M.MEDIA_SCHEMA))


def test_scene_cut_sampling_collapses_repeats(spark):
    clips = M.video_scene_fixture(spark, n_clips=3, scenes_per_clip=4,
                                  frames_per_scene=3)
    sc = M.extract_scene_frames(clips)
    counts = {r["media_id"]: r["n"] for r in
              sc.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # 12 frames per clip, 4 visual scenes -> exactly 4 representatives
    assert counts == {0: 4, 1: 4, 2: 4}
    # representatives keep the FIRST frame of each scene (indices 0,3,6,9)
    idx = sorted(r["frame_idx"] for r in sc.filter(F.col("media_id") == 0).collect())
    assert idx == [0, 3, 6, 9]


def test_reencoded_duplicate_found_distinct_clips_not(spark):
    base = M.video_scene_fixture(spark, n_clips=10)
    media = _with_reencodes(spark, base, ids=[0, 1, 2], noise=2, fps=10)
    got = sorted((r["id1"], r["id2"]) for r in
                 M.video_neardup_pairs(media).collect())
    assert got == [(0, 100), (1, 101), (2, 102)]  # recall AND precision 1.0


def test_heavier_noise_still_matches(spark):
    base = M.video_scene_fixture(spark, n_clips=4)
    media = _with_reencodes(spark, base, ids=[0], noise=6, fps=3)
    got = sorted((r["id1"], r["id2"]) for r in
                 M.video_neardup_pairs(media).collect())
    assert (0, 100) in got


def test_boilerplate_band_cap_bounds_expansion(spark):
    """20 clips share an identical intro scene (station-ident shape): the
    intro's band keys exceed the cap and are dropped, so the shared scene
    alone creates NO candidate pairs — expansion stays bounded under
    boilerplate skew (the q154 rule applied to video)."""
    intro = M.pattern_frame(32, 24, seed=777)
    rows = []
    for i in range(20):
        frames = [intro] * 3 + [M.pattern_frame(32, 24, seed=i * 991 + 5)] * 3
        rows.append({
            "media_id": i, "kind": "video", "mime": "video/avi",
            "payload": M.avi_payload(frames, fps=5, w=32, h=24),
            "meta_json": "{}",
        })
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = M.video_neardup_pairs(media, max_band_freq=8)
    assert out.count() == 0
    # without the cap the shared intro proposes all C(20,2) candidates and
    # the verify stage still rejects them (1 of 2 scenes < 0.6) — the cap
    # is about bounding the JOIN, not rescuing precision
    uncapped = M.video_neardup_pairs(media, max_band_freq=10_000)
    assert uncapped.count() == 0


def test_image_neardup_planted_and_noise_tolerance(spark):
    """Image family member: PPM->BMP re-encode with pixel noise pairs with
    its source at small hamming; distinct pattern images never pair; a
    heavier-noise copy still lands under tau."""
    import numpy as np

    media = M.image_neardup_fixture(spark, n=20, planted=4)
    got = sorted((r["id1"], r["id2"]) for r in M.image_neardup_pairs(media).collect())
    assert got == [(0, 100), (1, 101), (2, 102), (3, 103)]

    # heavier noise: +-8 per pixel still hamming <= tau for block patterns
    rows = media.filter("media_id = 5").collect()
    arr = M.decode_image(bytes(rows[0]["payload"]))
    rng = np.random.default_rng(99)
    noisy = np.clip(arr.astype(np.int16) + rng.integers(-8, 9, size=arr.shape),
                    0, 255).astype(np.uint8)
    extra = spark.createDataFrame(
        [{"media_id": 500, "kind": "image", "mime": "image/bmp",
          "payload": M.bmp_payload(noisy), "meta_json": "{}"}],
        schema=M.MEDIA_SCHEMA,
    )
    got2 = sorted((r["id1"], r["id2"]) for r in
                  M.image_neardup_pairs(media.unionByName(extra)).collect())
    assert (5, 500) in got2


def test_audio_neardup_planted_and_remaster_tolerance(spark):
    """Audio family member: 0.7x + sigma=0.01 remasters pair exactly;
    a heavier 0.5x + sigma=0.02 remaster still matches; tonally distinct
    clips never pair (nearest distinct pair sits at chunk hamming 4,
    above tau=3 - the measured separation the default encodes)."""
    import numpy as np

    media = M.audio_neardup_fixture(spark, n=10, planted=3)
    got = sorted((r["id1"], r["id2"]) for r in M.audio_neardup_pairs(media).collect())
    assert got == [(0, 100), (1, 101), (2, 102)]

    rows = media.filter("media_id = 4").collect()
    wav = M.decode_audio(bytes(rows[0]["payload"]))
    assert wav is not None
    rate, samples = wav
    rng = np.random.default_rng(55)
    heavy = 0.5 * samples + rng.normal(0.0, 0.02, size=samples.shape)
    extra = spark.createDataFrame(
        [{"media_id": 400, "kind": "audio", "mime": "audio/wav",
          "payload": M.wav_from_samples(heavy, rate), "meta_json": "{}"}],
        schema=M.MEDIA_SCHEMA,
    )
    got2 = sorted((r["id1"], r["id2"]) for r in
                  M.audio_neardup_pairs(media.unionByName(extra)).collect())
    assert (4, 400) in got2


def test_cross_modal_planted_truth_and_exact_copy(spark):
    """cross_modal_neardup_pairs: the planted BMP re-encodes of clip
    scenes are found (and nothing else); an EXACT PPM copy of a scene
    frame added on top pairs at hamming 0; a distractor-only image set
    yields no pairs at all."""
    images, videos = M.cross_modal_fixture(spark)
    got = sorted(
        (r["image_id"], r["video_id"], r["scene_idx"])
        for r in M.cross_modal_neardup_pairs(images, videos).collect()
    )
    assert got == [(200, 0, 0), (201, 1, 1), (202, 2, 2), (203, 3, 3)]

    exact = spark.createDataFrame(
        [{"media_id": 300, "kind": "image", "mime": "image/ppm",
          "payload": M.pattern_frame(32, 24, seed=5 * 1000 + 2 * 10),
          "meta_json": "{}"}],  # clip 5, scene 2, byte-identical frame
        schema=M.MEDIA_SCHEMA,
    )
    out = M.cross_modal_neardup_pairs(images.unionByName(exact), videos)
    rows = {(r["image_id"], r["video_id"], r["scene_idx"]): r["hamming"]
            for r in out.collect()}
    assert rows[(300, 5, 2)] == 0 and len(rows) == 5

    lonely = images.filter("media_id < 100")  # distractors only
    assert M.cross_modal_neardup_pairs(lonely, videos).count() == 0


def test_cross_modal_band_cap_bounds_hot_key(spark):
    """A flat-color frame shared by many clips and many images is a hot
    band key; the cap must keep it from expanding quadratically while
    leaving the planted structured pairs intact."""
    import numpy as np

    images, videos = M.cross_modal_fixture(spark, n_clips=4, planted=2)
    flat = M.encode_ppm(np.full((24, 32, 3), 128, dtype=np.uint8))
    extra_imgs = spark.createDataFrame(
        [{"media_id": 500 + i, "kind": "image", "mime": "image/ppm",
          "payload": flat, "meta_json": "{}"} for i in range(12)],
        schema=M.MEDIA_SCHEMA,
    )
    capped = M.cross_modal_neardup_pairs(
        images.unionByName(extra_imgs), videos, max_band_freq=8
    )
    got = sorted(
        (r["image_id"], r["video_id"], r["scene_idx"])
        for r in capped.collect()
    )
    assert got == [(200, 0, 0), (201, 1, 1)]  # flood suppressed, truth kept


def test_avi_audio_track_roundtrip_and_cross_modal(spark):
    """q168 kernels: (1) the AVI 'auds' extension round-trips PCM bytes and
    rate exactly, and an audio-less AVI still parses with audio=None;
    (2) cross_modal_av_pairs finds exactly the planted soundtrack
    re-masters (precision AND recall), an EXACT extracted track matches at
    hamming 0, and distractor-only inputs emit nothing."""
    import numpy as np

    from kafka_connect_logminer2_spark.functions import multimodal as M

    # (1) codec roundtrip
    frames = [M.pattern_frame(16, 12, seed=7)]
    samples = 0.4 * np.sin(2 * np.pi * 700.0 * np.arange(8000) / 8000.0)
    avi = M.parse_avi(M.avi_payload(frames, fps=5, w=16, h=12,
                                    audio=samples, audio_rate=8000))
    assert avi is not None and avi["audio_rate"] == 8000
    want = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    assert avi["audio"] == want
    plain = M.parse_avi(M.avi_payload(frames, fps=5, w=16, h=12))
    assert plain["audio"] is None and plain["audio_rate"] is None

    # (2) planted truth
    audios, videos = M.cross_modal_av_fixture(spark)
    got = sorted(
        (r["audio_id"], r["video_id"], r["chunk_idx"], r["hamming"])
        for r in M.cross_modal_av_pairs(audios, videos).collect()
    )
    want_pairs = sorted(
        (300 + i, i, c, 0) for i in range(3) for c in range(4)
    )
    assert got == want_pairs

    # exact extracted track (no remaster) -> all chunks at hamming 0
    vrow = videos.filter("media_id = 4").collect()[0]
    track = M.parse_avi(bytes(vrow["payload"]))
    exact = np.frombuffer(track["audio"], dtype="<i2").astype(np.float64) / 32768.0
    one = spark.createDataFrame(
        [{"media_id": 900, "kind": "audio", "mime": "audio/wav",
          "payload": M.wav_from_samples(exact, 8000), "meta_json": "{}"}],
        schema=M.MEDIA_SCHEMA,
    )
    got2 = sorted(
        (r["audio_id"], r["video_id"], r["chunk_idx"], r["hamming"])
        for r in M.cross_modal_av_pairs(one, videos).collect()
    )
    assert got2 == [(900, 4, c, 0) for c in range(4)]

    # distractors alone -> empty
    distractors = audios.filter("media_id < 300")
    assert M.cross_modal_av_pairs(distractors, videos).count() == 0
