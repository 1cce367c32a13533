"""Incremental VIDEO corpus ingestion with history-wide near-dup
rejection — the video twin of :func:`~.corpus_ingest.write_neardup_ingest`
("a new batch of clips arrives nightly; don't ingest a re-encode of a
clip the corpus already has"), built on q156's frame-level machinery
(functions/multimodal.py: scene_signatures / scene_band_rows /
scene_pair_verify) and the shared delta-chain store.

Two sub-stores under one root, because the probe needs two access paths:

* ``<store>/keys`` — band-key postings ``(band, val, scene_idx,
  media_id)`` bucketed by ``xxhash64(band, val, scene_idx)``: candidate
  generation reads ONLY the buckets the batch's own band keys hash into
  (the touched-bucket discipline — history is never scanned in full);
* ``<store>/sigs`` — scene signatures ``(media_id, scene_idx, _hi, _lo)``
  bucketed by ``xxhash64(media_id)``: the verify step fetches ONLY the
  candidate old clips' signatures (≤ ``num_buckets`` bucket dirs, pruned
  before any job runs). Splitting keys from signatures avoids the
  quadratic duplication a banded-signature single store would cost here
  (a clip has many scenes × 4 bands; carrying the full signature on
  every band row is O(scenes²) bytes per clip).

Per-batch semantics (deterministic, run-order-independent):
1. decode once → scene signatures; in-batch near-dup clusters
   (banded candidates + scene-aligned hamming verify → connected
   components) keep the min-id representative — the corpus_ingest rule;
2. representatives probe the HISTORY: batch band keys against the
   touched key buckets (keys hotter than ``max_band_freq`` on either
   side are dropped — the q154 boilerplate cap), candidates verified
   against the stored signatures; a rep at/above ``min_scene_sim`` is
   rejected (the history already carries a covering clip);
3. survivors land in ``out_dir/batch=<id>``; their band keys and
   signatures append as that batch's delta segments. Commit markers
   gate visibility; retried batches overwrite their own segments.

Clips yielding NO scenes (unparseable container, undecodable frames)
are accepted as-is — they cannot participate in perceptual similarity;
byte-exact control for them is write_dedup_ingest's job (the same
division of labor as the text near store's no-signature rule).

CROSS-MODAL rejection (r9 verdict #4): cdc27-29's stores each dedup
within one modality; q164/q168 prove the batch-side cross-modal
matches. Composed here: an image arriving AFTER a video whose scene it
duplicates is rejectable against the VIDEO store
(``ingest_batch_image(video_store_dir=...)`` — q164's unaligned
semantics, a still may match ANY stored scene), and a standalone audio
clip against the video store's AUDIO-TRACK sub-stores
(``ingest_batch_audio(video_store_dir=...)`` probing the ``akeys``/
``asigs`` shadow family that ``ingest_batch_video(audio_track=True)``
maintains from each accepted clip — q168's chunk-aligned semantics).
Key buckets hash (band, val) WITHOUT the scene ordinal precisely so the
unaligned probe stays touched-bucket-bounded: alignment is a VERIFY
concern, candidate generation is the same (band, val) equality either
way. Cross-store probes read the other store's COMMITTED watermark (its
own stream's commit markers), so a half-written video batch can never
reject an image.

Reference: no equivalent in the reference; §2C training-data surface —
the dedup family's video member made INCREMENTAL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import dup_clusters
from ..functions.multimodal import (
    scene_band_rows,
    scene_pair_verify,
    scene_signatures,
)
from .corpus_ingest import (
    _committed_tombs,
    _ensure_meta,
    _note_row_schema,
    _row_ddl,
    _store_paths,
    _with_seg_version,
    _write_delta,
    compact_chains,
)
from .snapshot import _last_committed_batch, _mark_committed, _read_meta

_KEY_COLS = ["band", "val", "scene_idx"]


def _keys_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "keys")


def _sigs_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "sigs")


def _audio_keys_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "akeys")


def _audio_sigs_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "asigs")


# version of the _key_bucket placement formula, persisted in the keys-store
# meta (layout 1 hashed (band, val, scene_idx); layout 2 dropped the scene
# ordinal for cross-modal probes). Meta-guarded like num_buckets: resuming a
# store written under a different layout must RAISE — touched buckets
# computed with the wrong formula silently miss old rows, under-rejecting
# duplicates with no error signal (r10 advice).
_KEY_BUCKET_LAYOUT = 2


def _key_bucket(num_buckets: int) -> F.Column:
    # (band, val) only — NOT the scene ordinal: an unaligned cross-modal
    # probe (an image vs any stored scene, q164) derives exactly the same
    # touched-bucket set as an aligned one, so both stay bounded by the
    # probe's own keys; alignment is applied at verify time
    return F.pmod(
        F.xxhash64(F.col("band"), F.col("val")), F.lit(num_buckets)
    ).cast("int")


def _sig_bucket(num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("media_id")), F.lit(num_buckets)).cast("int")


def _capped(bands: DataFrame, max_band_freq: int, keys=None) -> DataFrame:
    keys = keys or _KEY_COLS
    return bands.join(
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_band_freq)
        .select(*keys),
        keys,
        "left_semi",
    )


def ingest_batch_video(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    tau: int = 10,
    min_scene_sim: float = 0.6,
    max_band_freq: int = 64,
    min_change_bits: int = 12,
    num_buckets: int = 16,
    audio_track: bool = False,
    n_chunks: int = 4,
) -> None:
    """One video-ingest step (foreachBatch body of
    :func:`write_video_ingest`, public for batch pipelines and the cdc27
    registry entry). ``batch``: media rows (media_id, kind, mime,
    payload, meta_json). ``audio_track=True`` additionally maintains the
    ``akeys``/``asigs`` shadow sub-stores — chunk-aligned spectral
    fingerprints of each ACCEPTED clip's embedded audio track
    (extract_video_audio_sigs), the probe target for standalone audio
    arriving later (cdc37)."""
    shadow = None
    if audio_track:
        from ..functions.multimodal import extract_video_audio_sigs

        shadow = [dict(
            sig_fn=lambda b: extract_video_audio_sigs(b, n_chunks=n_chunks),
            keys_dir=_audio_keys_dir(store_dir),
            sigs_dir=_audio_sigs_dir(store_dir),
            key_kind="video_audio_keys", sig_kind="video_audio_sigs",
            key_meta={"n_chunks": n_chunks},
        )]
    _ingest_batch_media(
        spark, batch, batch_id, out_dir, store_dir,
        sig_fn=lambda b: scene_signatures(b, min_change_bits=min_change_bits),
        key_kind="video_keys", sig_kind="video_sigs",
        key_meta={"tau": tau, "min_scene_sim": min_scene_sim,
                  "min_change_bits": min_change_bits},
        tau=tau, min_scene_sim=min_scene_sim,
        max_band_freq=max_band_freq, num_buckets=num_buckets,
        shadow=shadow,
    )


def ingest_batch_image(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    tau: int = 10,
    max_band_freq: int = 1024,
    num_buckets: int = 16,
    video_store_dir: str | None = None,
    video_tau: int = 6,
) -> None:
    """Image twin of :func:`ingest_batch_video` (r7 verdict #2 — "don't
    re-ingest a re-encode" for all three media types): one perceptual
    ahash per image in the shared scene-signature shape (scene_idx 0),
    so the SAME two-sub-store probe/verify machinery runs unchanged —
    a single scene matches iff its hamming ≤ tau, i.e. min_scene_sim
    degenerates to "the hash matched". Undecodable payloads carry the
    deterministic stub hash (exact-dup semantics) rather than the
    no-signature accept path, mirroring image_neardup_pairs.

    ``video_store_dir`` (cdc37): also reject an image duplicating ANY
    scene already committed to that VIDEO store — q164's unaligned
    contract at ``video_tau`` (its default), via the same touched-bucket
    probe."""
    from ..functions.multimodal import extract_image_sigs

    xprobes = None
    if video_store_dir is not None:
        xprobes = [dict(
            keys_dir=_keys_dir(video_store_dir),
            sigs_dir=_sigs_dir(video_store_dir),
            tau=video_tau, align=False,
        )]
    _ingest_batch_media(
        spark, batch, batch_id, out_dir, store_dir,
        sig_fn=extract_image_sigs,
        key_kind="image_keys", sig_kind="image_sigs",
        key_meta={"tau": tau},
        tau=tau, min_scene_sim=0.5,
        max_band_freq=max_band_freq, num_buckets=num_buckets,
        xprobes=xprobes,
    )


def ingest_batch_audio(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    tau: int = 3,
    min_chunk_sim: float = 0.75,
    max_band_freq: int = 1024,
    n_chunks: int = 4,
    num_buckets: int = 16,
    video_store_dir: str | None = None,
) -> None:
    """Audio twin of :func:`ingest_batch_video`: per-time-chunk 64-bit
    band-activity fingerprints (chunk ordinal = scene ordinal) ride the
    same store. tau=3 keeps audio in the deterministic pigeonhole regime
    (audio_neardup_pairs' contract); undecodable payloads yield no
    chunks and take the no-signature accept path (byte-exact control is
    write_dedup_ingest's job).

    ``video_store_dir`` (cdc37): also reject audio that re-masters the
    SOUNDTRACK of a committed clip — q168's chunk-ALIGNED contract
    against the video store's ``akeys``/``asigs`` shadow sub-stores
    (maintained by ``ingest_batch_video(audio_track=True)``), at this
    ingest's own tau/min_chunk_sim."""
    from ..functions.multimodal import extract_audio_chunk_sigs

    xprobes = None
    if video_store_dir is not None:
        xprobes = [dict(
            keys_dir=_audio_keys_dir(video_store_dir),
            sigs_dir=_audio_sigs_dir(video_store_dir),
            tau=tau, min_sim=min_chunk_sim, align=True,
        )]
    _ingest_batch_media(
        spark, batch, batch_id, out_dir, store_dir,
        sig_fn=lambda b: extract_audio_chunk_sigs(b, n_chunks=n_chunks),
        key_kind="audio_keys", sig_kind="audio_sigs",
        key_meta={"tau": tau, "min_chunk_sim": min_chunk_sim,
                  "n_chunks": n_chunks},
        tau=tau, min_scene_sim=min_chunk_sim,
        max_band_freq=max_band_freq, num_buckets=num_buckets,
        xprobes=xprobes,
    )


def _media_live(
    spark: SparkSession, sub_dir: str, rows: DataFrame, below: int
) -> DataFrame:
    """Apply media-id tombstones (takedowns — :func:`remove_batch_media`)
    to a direct file-source read of a media sub-store: a row is live iff
    its segment version is at/above its media_id's newest tombstone (the
    corpus stores' version-aware rule — removals run first within a
    batch). No tombstones → the read passes through untouched."""
    tomb = _committed_tombs(spark, sub_dir, below=below)
    if tomb is None:
        return rows
    dvs = tomb.groupBy("media_id").agg(F.max("dv").alias("_dv"))
    return (
        _with_seg_version(rows)
        .join(dvs, "media_id", "left")
        .filter(F.col("_dv").isNull() | (F.col("_dv") <= F.col("_v")))
        .drop("_v", "_dv")
    )


def _tomb_fold(spark: SparkSession, sub_dir: str, below: int):
    """(fold, force_single, cleanup_dirs) applying a media sub-store's
    pending media-id tombstones during compaction — shared by the
    kind-dispatched maintenance path and the offline compactor so the
    two cannot drift."""
    tomb = _committed_tombs(spark, sub_dir, below=below)
    if tomb is None:
        return None, False, ()
    dvs = tomb.groupBy("media_id").agg(F.max("dv").alias("_dv"))

    def fold(df):
        df = _with_seg_version(df)
        df = df.join(dvs, "media_id", "left").filter(
            F.col("_dv").isNull() | (F.col("_dv") <= F.col("_v"))
        )
        return df.drop("_v", "_dv").distinct()

    return fold, True, ("_tomb",)


def remove_batch_media(
    spark: SparkSession,
    media_ids: DataFrame,
    batch_id: int,
    store_dir: str,
    id_col: str = "media_id",
    audio_track: bool = False,
) -> None:
    """Take down media (legal removal, curation kill — the media twin of
    the corpus stores' delete path, completing deletion support across
    every store family): the clips'/images'/audios' band keys and
    signatures stop rejecting arrivals immediately (merge-on-read
    exclusion in every probe, cross-modal ones included) and leave the
    chains physically at the next compaction. One tiny ``_tomb``
    segment lands in EACH sub-store (keys + sigs, plus akeys/asigs with
    ``audio_track``) so every sub-store stays self-contained for its own
    kind-dispatched compaction. SEQUENCING: like every tombstone here,
    ``batch_id`` must interleave with the ingest batch ids (call between
    batches from the pipeline that controls them)."""
    tomb = media_ids.select(
        F.col(id_col).cast("long").alias("media_id")
    ).distinct().withColumn("dv", F.lit(batch_id).cast("long"))
    dirs = [_keys_dir(store_dir), _sigs_dir(store_dir)]
    if audio_track:
        dirs += [_audio_keys_dir(store_dir), _audio_sigs_dir(store_dir)]
    import shutil as _shutil

    for d in dirs:
        dst = os.path.join(d, "_tomb", f"v={batch_id}")
        _shutil.rmtree(dst, ignore_errors=True)
        tomb.coalesce(1).write.mode("overwrite").parquet(dst)
        _mark_committed(d, batch_id)


def _probe_reject(
    spark: SparkSession,
    probe_sigs: DataFrame,
    kd: str,
    sd: str,
    tau: int,
    min_scene_sim: float,
    max_band_freq: int,
    num_buckets: int,
    below: int,
    align: bool = True,
) -> DataFrame | None:
    """History probe, factored so cross-modal rejection reuses it verbatim:
    the probe sigs' band keys against ONLY the touched key buckets of an
    existing store, then popcount verify against ONLY the candidates'
    stored signatures. Returns a ``(media_id)`` frame of REJECTED probe
    ids, or None when nothing in the store can match.

    ``align=True`` is the within-modality contract (scene ordinals align,
    matched coverage ≥ min_scene_sim of the longer side — q156/q158);
    ``align=False`` is the q164 cross-modal contract (ANY (probe scene,
    stored scene) pair at hamming ≤ tau rejects — a still may duplicate
    any scene of any stored clip). Candidate generation is identical
    either way: (band, val) equality, which is also what the key buckets
    hash — so the unaligned probe reads exactly as few buckets as the
    aligned one."""
    join_keys = _KEY_COLS if align else ["band", "val"]
    pb = _capped(scene_band_rows(probe_sigs), max_band_freq, join_keys).withColumn(
        "_b", _key_bucket(num_buckets)
    )
    # touched-bucket set from the UNCAPPED band keys: bucket selection only
    # prunes which store paths are READ, so a superset is harmless (the
    # join below still sees only capped keys) — and skipping the cap here
    # drops a hash-agg + semi-join exchange from every probe's first job
    touched = sorted(
        r["_b"]
        for r in scene_band_rows(probe_sigs)
        .select(_key_bucket(num_buckets).alias("_b"))
        .distinct()
        .collect()
    )
    key_paths = _store_paths(kd, touched, below=below)
    if not key_paths:
        return None
    hist_keys = _capped(
        _media_live(spark, kd, spark.read.parquet(*key_paths), below)
        .select(*_KEY_COLS, "media_id"),
        max_band_freq,
        join_keys,
    )
    cand = (
        pb.join(hist_keys.withColumnRenamed("media_id", "_old"), join_keys)
        .select(F.col("media_id").alias("id1"), F.col("_old").alias("id2"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig_buckets = sorted(
        r["_sb"]
        for r in cand.select(
            F.pmod(F.xxhash64(F.col("id2")), F.lit(num_buckets))
            .cast("int")
            .alias("_sb")
        )
        .distinct()
        .collect()
    )
    sig_paths = _store_paths(sd, sig_buckets, below=below)
    if not sig_paths:
        return None
    hist_sigs = _media_live(
        spark, sd, spark.read.parquet(*sig_paths), below
    ).join(
        cand.select(F.col("id2").alias("media_id")).distinct(),
        "media_id",
        "left_semi",
    )
    if align:
        rejected = scene_pair_verify(
            cand, probe_sigs, hist_sigs, tau=tau, min_scene_sim=min_scene_sim
        )
    else:
        a = probe_sigs.select(
            F.col("media_id").alias("id1"),
            F.col("_hi").alias("_h1"), F.col("_lo").alias("_l1"),
        )
        b = hist_sigs.select(
            F.col("media_id").alias("id2"),
            F.col("_hi").alias("_h2"), F.col("_lo").alias("_l2"),
        )
        ham = F.bit_count(F.col("_h1").bitwiseXOR(F.col("_h2"))) + F.bit_count(
            F.col("_l1").bitwiseXOR(F.col("_l2"))
        )
        rejected = cand.join(a, "id1").join(b, "id2").filter(ham <= F.lit(tau))
    return rejected.select(F.col("id1").alias("media_id")).distinct()


def _ingest_batch_media(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    sig_fn,
    key_kind: str,
    sig_kind: str,
    key_meta: dict,
    tau: int,
    min_scene_sim: float,
    max_band_freq: int,
    num_buckets: int,
    xprobes: "list[dict] | None" = None,
    shadow: "list[dict] | None" = None,
) -> None:
    """The modality-generic ingest step all three media kinds share:
    ``sig_fn`` maps the batch to the scene-signature shape (media_id,
    scene_idx, _hi, _lo) — everything after the one decode pass (in-batch
    min-id clustering, touched-bucket history probe, ordinal-aligned
    verify, delta append) is identical, so the store semantics cannot
    drift across modalities.

    ``xprobes``: cross-modal rejection probes against OTHER stores —
    dicts of (keys_dir, sigs_dir, tau, min_sim, align); each runs the
    same touched-bucket probe against that store's COMMITTED watermark
    (its own stream's markers — a half-written batch there never rejects
    here). ``shadow``: additional signature families extracted from the
    ACCEPTED rows and appended as sibling sub-stores — dicts of (sig_fn,
    keys_dir, sigs_dir, key_kind, sig_kind, key_meta); shadow commits
    land BEFORE the main markers, so a probe can only ever see a shadow
    whose clips are (or deterministically will be, on replay) in the
    store."""
    kd, sd = _keys_dir(store_dir), _sigs_dir(store_dir)
    _ensure_meta(kd, {"kind": key_kind, "num_buckets": num_buckets,
                      "bucket_layout": _KEY_BUCKET_LAYOUT, **key_meta})
    _ensure_meta(sd, {"kind": sig_kind, "num_buckets": num_buckets})

    batch = batch.persist()
    try:
        # one decode pass; signatures reused by every stage below
        sigs = sig_fn(batch)
        # EAGER: the signature relation feeds ~5 independent exchanges that
        # AQE materializes CONCURRENTLY; computed lazily, all of them race
        # into the decode subtree at once (python-worker spawn storm + block
        # locks — profiled at 4.1s/task with ~30ms CPU). One eager pass pays
        # the decode once, then every consumer reads checkpoint blocks.
        sigs = sigs.localCheckpoint(eager=True)
        bands = _capped(scene_band_rows(sigs), max_band_freq)

        # 1. in-batch: min-id representative per near-dup cluster
        cand_in = (
            bands.alias("A")
            .join(bands.alias("B"), _KEY_COLS)
            .filter(F.col("A.media_id") < F.col("B.media_id"))
            .select(F.col("A.media_id").alias("id1"),
                    F.col("B.media_id").alias("id2"))
            .distinct()
        )
        pairs = scene_pair_verify(
            cand_in, sigs, sigs, tau=tau, min_scene_sim=min_scene_sim
        )
        clusters = dup_clusters(pairs, id1_col="id1", id2_col="id2")
        dupes = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias("media_id")
        )
        rep_sigs = sigs.join(dupes, "media_id", "left_anti").localCheckpoint(
            eager=False
        )

        # 2. probe history: touched key buckets -> candidates -> verify
        # against ONLY the candidates' stored signatures
        rejected = _probe_reject(
            spark, rep_sigs, kd, sd, tau, min_scene_sim,
            max_band_freq, num_buckets, below=batch_id,
        )
        accepted_sigs = (
            rep_sigs
            if rejected is None
            else rep_sigs.join(rejected, "media_id", "left_anti")
        )

        # 2b. cross-modal probes against other stores' committed state
        for xp in xprobes or []:
            last = _last_committed_batch(xp["keys_dir"])
            if last is None:
                continue
            x_nb = (_read_meta(xp["keys_dir"]) or {}).get(
                "num_buckets", num_buckets
            )
            xr = _probe_reject(
                spark, accepted_sigs, xp["keys_dir"], xp["sigs_dir"],
                xp["tau"], xp.get("min_sim", 0.0), max_band_freq,
                x_nb, below=last + 1, align=xp.get("align", False),
            )
            if xr is not None:
                accepted_sigs = accepted_sigs.join(xr, "media_id", "left_anti")
        accepted_sigs = accepted_sigs.localCheckpoint(eager=False)

        # 3. land survivors (+ scene-less clips) and append the deltas
        no_scene = batch.select("media_id").join(
            sigs.select("media_id").distinct(), "media_id", "left_anti"
        )
        accepted_ids = accepted_sigs.select("media_id").distinct().unionByName(
            no_scene
        )
        accepted_rows = batch.join(accepted_ids, "media_id")
        accepted_rows.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        key_delta = scene_band_rows(accepted_sigs).withColumn(
            "_b", _key_bucket(num_buckets)
        )
        _note_row_schema(kd, _row_ddl(key_delta))
        _write_delta(key_delta.select(*_KEY_COLS, "media_id", "_b"), kd, batch_id)
        sig_delta = accepted_sigs.withColumn("_b", _sig_bucket(num_buckets))
        _note_row_schema(sd, _row_ddl(sig_delta))
        _write_delta(sig_delta, sd, batch_id)
        for sh in shadow or []:
            skd, ssd = sh["keys_dir"], sh["sigs_dir"]
            _ensure_meta(skd, {"kind": sh["key_kind"],
                               "num_buckets": num_buckets,
                               "bucket_layout": _KEY_BUCKET_LAYOUT,
                               **sh.get("key_meta", {})})
            _ensure_meta(ssd, {"kind": sh["sig_kind"],
                               "num_buckets": num_buckets})
            s_sigs = sh["sig_fn"](accepted_rows)
            s_keys = scene_band_rows(s_sigs).withColumn(
                "_b", _key_bucket(num_buckets)
            )
            _note_row_schema(skd, _row_ddl(s_keys))
            _write_delta(s_keys.select(*_KEY_COLS, "media_id", "_b"), skd, batch_id)
            s_sig_delta = s_sigs.withColumn("_b", _sig_bucket(num_buckets))
            _note_row_schema(ssd, _row_ddl(s_sig_delta))
            _write_delta(s_sig_delta, ssd, batch_id)
            _mark_committed(skd, batch_id)
            _mark_committed(ssd, batch_id)
        _mark_committed(kd, batch_id)
        _mark_committed(sd, batch_id)
    finally:
        batch.unpersist()


def write_video_ingest(
    media_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    tau: int = 10,
    min_scene_sim: float = 0.6,
    max_band_freq: int = 64,
    min_change_bits: int = 12,
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
    audio_track: bool = False,
    n_chunks: int = 4,
):
    """Stream of media rows → accepted-clip batches + maintained
    key/signature stores (plus the audio-track shadow sub-stores when
    ``audio_track=True``). Returns the StreamingQuery."""
    extra = (
        [_audio_keys_dir(store_dir), _audio_sigs_dir(store_dir)]
        if audio_track
        else []
    )
    return _write_media_ingest(
        media_stream, out_dir, store_dir, checkpoint_dir,
        lambda spark, b, bid: ingest_batch_video(
            spark, b, bid, out_dir, store_dir,
            tau=tau, min_scene_sim=min_scene_sim,
            max_band_freq=max_band_freq, min_change_bits=min_change_bits,
            num_buckets=num_buckets,
            audio_track=audio_track, n_chunks=n_chunks,
        ),
        trigger_available_now, max_chain, extra_dirs=extra,
    )


def write_image_ingest(
    media_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    tau: int = 10,
    max_band_freq: int = 1024,
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
    video_store_dir: str | None = None,
    video_tau: int = 6,
):
    """Stream of image rows → accepted batches + maintained stores
    (cdc28); with ``video_store_dir``, images duplicating a committed
    video scene are rejected too (cdc37). Returns the StreamingQuery."""
    return _write_media_ingest(
        media_stream, out_dir, store_dir, checkpoint_dir,
        lambda spark, b, bid: ingest_batch_image(
            spark, b, bid, out_dir, store_dir, tau=tau,
            max_band_freq=max_band_freq, num_buckets=num_buckets,
            video_store_dir=video_store_dir, video_tau=video_tau,
        ),
        trigger_available_now, max_chain,
    )


def write_audio_ingest(
    media_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    tau: int = 3,
    min_chunk_sim: float = 0.75,
    max_band_freq: int = 1024,
    n_chunks: int = 4,
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
    video_store_dir: str | None = None,
):
    """Stream of audio rows → accepted batches + maintained stores
    (cdc29); with ``video_store_dir``, audio re-mastering a committed
    clip's soundtrack is rejected too (cdc37). Returns the
    StreamingQuery."""
    return _write_media_ingest(
        media_stream, out_dir, store_dir, checkpoint_dir,
        lambda spark, b, bid: ingest_batch_audio(
            spark, b, bid, out_dir, store_dir, tau=tau,
            min_chunk_sim=min_chunk_sim, max_band_freq=max_band_freq,
            n_chunks=n_chunks, num_buckets=num_buckets,
            video_store_dir=video_store_dir,
        ),
        trigger_available_now, max_chain,
    )


def _write_media_ingest(
    media_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    step,
    trigger_available_now: bool,
    max_chain: int | None,
    extra_dirs: "list[str] | None" = None,
):
    """Shared writer: ingest step + protected in-line maintenance on both
    sub-stores (the write_video_ingest shape) and any ``extra_dirs``
    (shadow sub-stores like akeys/asigs)."""
    spark = media_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        step(spark, batch, batch_id)
        if max_chain is not None:
            from .maintenance import maintain_store

            # protect=batch_id: a replayed batch must find its own deltas
            # and the pre-batch history intact (see compact_chains)
            for d in (_keys_dir(store_dir), _sigs_dir(store_dir),
                      *(extra_dirs or [])):
                maintain_store(spark, d, max_chain=max_chain,
                               max_overlays=max_chain, protect=batch_id)

    writer = media_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_video_ingested(
    spark: SparkSession, out_dir: str, store_dir: str | None = None
) -> DataFrame | None:
    """Accepted clips across batches (``batch`` partition column); with
    ``store_dir``, visibility is gated on the key store's commit marker
    (a crash between the output write and the store commit stays
    invisible until the retry) — the read_ingested contract. The store
    layout is modality-agnostic, so this is also the read path for the
    image/audio stores (aliased below)."""
    from .corpus_ingest import read_ingested

    return read_ingested(
        spark, out_dir, None if store_dir is None else _keys_dir(store_dir)
    )


# the accepted-output layout is identical across modalities
read_image_ingested = read_video_ingested
read_audio_ingested = read_video_ingested


def compact_video_store(spark: SparkSession, store_dir: str) -> dict[str, int | None]:
    """Fold both sub-stores' chains (distinct folds — rows are unique by
    construction), applying any pending media-id tombstones physically
    (:func:`_tomb_fold`); the compact_chains skeleton supplies the
    fold-marker crash story."""
    meta = _read_meta(_keys_dir(store_dir)) or {}
    nb = meta.get("num_buckets", 16)
    out = {}
    for name, d, expr in (
        ("keys", _keys_dir(store_dir), _key_bucket(nb)),
        ("sigs", _sigs_dir(store_dir), _sig_bucket(nb)),
    ):
        last = _last_committed_batch(d)
        fold, force_single, cleanup = (
            _tomb_fold(spark, d, below=last + 1)
            if last is not None
            else (None, False, ())
        )
        out[name] = compact_chains(
            spark, d, expr, fold=fold, force_single=force_single,
            cleanup_dirs=cleanup,
        )
    return out


def video_store_size(spark: SparkSession, store_dir: str) -> int:
    """Committed LIVE accepted-clip count (distinct media ids in the
    signature store, takedown tombstones applied) — one multi-path read
    over the committed chain."""
    sd = _sigs_dir(store_dir)
    last = _last_committed_batch(sd)
    if last is None:
        return 0
    paths = [
        p
        for p in _store_paths(sd, None, below=last + 1)
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    if not paths:
        return 0
    rows = _media_live(spark, sd, spark.read.parquet(*paths), below=last + 1)
    return rows.select("media_id").distinct().count()
