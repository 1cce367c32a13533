"""Store maintenance lifecycle — the scheduler the chain stores were
missing (r6 verdict #6): every delta-chain store has a compactor
(compact_store / compact_search_index / compact_scd2 / compact_decayed /
compact_ann_index) but nothing CALLED them, so a long-running stream's
chains — and therefore every read's segment count — grew without bound
between manual invocations.

:func:`maintain_store` is the policy: inspect the store (listdir-only,
no Spark job), compact iff a bucket's committed chain exceeds
``max_chain`` segments or pending overlays (close patches, tombstones)
have piled up past ``max_overlays``. Cheap enough to call after every
micro-batch; the streaming writers (write_scd2, write_search_index,
write_decayed_counters) accept ``max_chain`` and do exactly that, so a
10⁶-batch stream's read cost stays O(buckets · max_chain) segments
forever (lifecycle-test-pinned in tests/test_maintenance.py).

Dispatch is by the persisted ``_meta.json`` ``kind`` — the store layout
already self-describes, so one entry point covers every store a pipeline
may own: ``maintain_stores(spark, [dir, ...])`` for the nightly sweep.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .corpus_ingest import _committed_versions
from .snapshot import _last_committed_batch, _read_meta

# overlay dirs whose pending segments merge-on-read until compaction
# applies them physically (scd2 close patches, index tombstones)
_OVERLAY_DIRS = ("_closes", "_tomb", "_tombstones")

# the media ingest stores' two-sub-store kinds (video/image/audio share
# one layout — streaming/video_ingest.py's modality-generic core;
# video_audio = the audio-track shadow sub-stores cdc37's cross-modal
# probe reads, same layout)
_MEDIA_KINDS = frozenset(
    f"{m}_{part}"
    for m in ("video", "image", "audio", "video_audio")
    for part in ("keys", "sigs")
)


def _committed_segs(parent: str) -> list[str]:
    """``v=`` child dirs carrying a ``_SUCCESS`` commit marker — the same
    committed-only accounting the bucket path gets from
    ``_committed_versions``, so uncommitted/partial segments can't
    inflate the stats and trigger compaction spuriously."""
    return [
        d
        for d in os.listdir(parent)
        if d.startswith("v=")
        and os.path.exists(os.path.join(parent, d, "_SUCCESS"))
    ]


def chain_stats(store_dir: str) -> dict:
    """Filesystem-only store inspection: the longest committed bucket
    chain, total committed segments, and pending overlay segments."""
    max_chain = total = 0
    if os.path.isdir(store_dir):
        for d in os.listdir(store_dir):
            if d.startswith("b="):
                n = len(_committed_versions(os.path.join(store_dir, d)))
                max_chain = max(max_chain, n)
                total += n
        # ann_mor stores version at the root (v=, no buckets)
        if max_chain == 0:
            root_vs = _committed_segs(store_dir)
            if root_vs:
                max_chain = total = len(root_vs)
    overlays = 0
    for o in _OVERLAY_DIRS:
        odir = os.path.join(store_dir, o)
        if os.path.isdir(odir):
            overlays += len(_committed_segs(odir))
    return {"max_chain": max_chain, "total_segments": total, "overlays": overlays}


def needs_maintenance(
    store_dir: str, max_chain: int = 8, max_overlays: int = 8
) -> bool:
    st = chain_stats(store_dir)
    return st["max_chain"] > max_chain or st["overlays"] > max_overlays


def maintain_store(
    spark: SparkSession,
    store_dir: str,
    max_chain: int = 8,
    max_overlays: int = 8,
    protect: int | None = None,
) -> int | None:
    """Compact ``store_dir`` iff its chains or overlays exceed the policy
    bounds; no-op (no Spark job, two listdirs) otherwise. Returns the
    fold version when compaction ran, else None. The store's kind comes
    from its own ``_meta.json``; unknown/absent kinds are left alone
    (never guess a fold over a layout we didn't write).

    ``protect`` MUST be the current batch id when called in-line from a
    foreachBatch body (every streaming writer here does): the batch's
    store commit marker lands before Spark's streaming commit log, so
    the batch may still be REPLAYED — compaction must leave its version
    (and everything at or above it) untouched, else the retry's
    overwrite destroys the fold holding the entire history (see
    compact_chains). ann_mor compaction is offline-only by design and
    is skipped when ``protect`` is set."""
    if not needs_maintenance(store_dir, max_chain, max_overlays):
        return None
    kind = (_read_meta(store_dir) or {}).get("kind")
    if kind in ("exact", "neardup"):
        from .corpus_ingest import compact_store

        return compact_store(spark, store_dir, protect=protect)
    if kind == "postings":
        from .search_index import compact_search_index

        return compact_search_index(spark, store_dir, protect=protect)
    if kind == "scd2":
        from .scd2 import compact_scd2

        return compact_scd2(spark, store_dir, protect=protect)
    if kind == "decayed":
        from .decayed import compact_decayed

        return compact_decayed(spark, store_dir, protect=protect)
    if kind == "hh_counts":
        from .heavy_hitters import compact_heavy_hitters

        return compact_heavy_hitters(spark, store_dir, protect=protect)
    if kind == "bottomk":
        from .sketches import compact_bottomk

        return compact_bottomk(spark, store_dir, protect=protect)
    if kind == "hll_sketch":
        from .sketches import compact_hll

        return compact_hll(spark, store_dir, protect=protect)
    if kind == "hist":
        from .sketches import compact_hist

        return compact_hist(spark, store_dir, protect=protect)
    if kind in ("ann_mor", "pqann_mor"):
        # pqann_mor (r12) shares ann_mor's version/tombstone layout with a
        # packed-code payload instead of vectors — compact_ann_index is
        # payload-agnostic, so one fold serves both
        if protect is not None:
            return None  # offline-only rewrite (no replayable batches)
        from .ann_ingest import compact_ann_index

        return compact_ann_index(spark, store_dir)
    if kind in _MEDIA_KINDS:
        from .corpus_ingest import compact_chains
        from .video_ingest import _key_bucket, _sig_bucket, _tomb_fold

        nb = (_read_meta(store_dir) or {}).get("num_buckets", 16)
        expr = _key_bucket(nb) if kind.endswith("_keys") else _sig_bucket(nb)
        # media takedowns (remove_batch_media): apply pending media-id
        # tombstones physically during the fold, version-aware like the
        # corpus stores, then drop the consumed segments
        fold, force_single, cleanup = None, False, ()
        last = _last_committed_batch(store_dir)
        if last is not None:
            fold, force_single, cleanup = _tomb_fold(
                spark, store_dir,
                below=(last + 1 if protect is None else protect),
            )
        return compact_chains(
            spark, store_dir, expr, fold=fold,
            force_single=force_single, cleanup_dirs=cleanup, protect=protect,
        )
    return None


def maintain_stores(
    spark: SparkSession,
    store_dirs: list[str],
    max_chain: int = 8,
    max_overlays: int = 8,
    protect_last: bool = False,
    errors: dict[str, Exception] | None = None,
) -> dict[str, int | None]:
    """The nightly sweep: apply :func:`maintain_store` to every store a
    pipeline owns, with per-store isolation — one store's failure does not
    block the rest of the sweep. Values are always ``int | None`` (fold
    version, or None for a no-op) — never exceptions, so callers that
    treat a non-None value as "compacted at version N" or serialize the
    dict can't misread a failure as a result (r8 advisor). Failed stores
    are ABSENT from the result; by default the first failure re-raises
    after the sweep completes (fail-loud). Pass ``errors={}`` to receive
    each failed store's exception there instead of raising — the
    unattended-scheduler mode, where the caller inspects and reports.

    ``protect_last=True`` is for sweeping stores whose writing stream is
    STOPPED but may later RESUME: the newest store-committed batch may be
    missing from the stream's own commit log (a crash between the store
    marker and Spark's checkpoint commit) and would then be replayed, so
    each store's newest committed batch is excluded from its fold exactly
    as in-line maintenance excludes the live batch. Leave it False only
    for quiesced/decommissioned stores where a full fold is wanted."""
    out: dict[str, int | None] = {}
    collected: dict[str, Exception] = {}
    for d in store_dirs:
        protect = _last_committed_batch(d) if protect_last else None
        try:
            out[d] = maintain_store(
                spark, d, max_chain=max_chain, max_overlays=max_overlays,
                protect=protect,
            )
        except Exception as e:  # noqa: BLE001 — isolation is the contract
            collected[d] = e
    if errors is not None:
        errors.update(collected)
    elif collected:
        raise next(iter(collected.values()))
    return out


def discover_stores(root: str, max_depth: int = 3) -> list[str]:
    """Every maintainable store under ``root``: a dir carrying
    ``_meta.json`` with a known ``kind`` (the layouts this module wrote —
    anything else is refused by :func:`maintain_store` anyway). Bounded
    shallow walk, so a pipeline's state root can be swept without
    enumerating its stores by hand:
    ``maintain_stores(spark, discover_stores(root))``."""
    kinds = {
        "exact", "neardup", "postings", "scd2", "decayed", "ann_mor",
        "pqann_mor", "hh_counts", "bottomk", "hll_sketch", "hist",
        *_MEDIA_KINDS,
    }
    found: list[str] = []

    def walk(d: str, depth: int) -> None:
        meta = _read_meta(d)
        if meta is not None and meta.get("kind") in kinds:
            found.append(d)
            return  # stores don't nest
        if depth >= max_depth:
            return
        try:
            entries = sorted(os.listdir(d))
        except OSError:
            return
        for e in entries:
            p = os.path.join(d, e)
            if os.path.isdir(p) and not e.startswith(("b=", "v=", "_")):
                walk(p, depth + 1)

    if os.path.isdir(root):
        walk(root, 0)
    return found
