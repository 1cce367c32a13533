"""Incremental corpus ingestion with HISTORY-WIDE exact dedup — the
production form of "a new crawl arrives nightly; keep only documents never
seen in ANY previous batch".

Why a new component: ``streaming/analytics.py::stream_dedup`` bounds its
state by the watermark (the right call for event streams); a training
corpus needs the opposite — an UNBOUNDED, persistent seen-set. Holding
that set as streaming operator state would rebuild/replay it from the
changelog; here it is a PERSISTED, BUCKETED fingerprint store on the same
versioned/retry-idempotent layout as the bucketed snapshot
(streaming/snapshot.py): ``store_dir/b=<k>/v=<batch_id>`` per bucket, a
batch-level commit marker gating visibility, foreachBatch retries
overwriting their own outputs byte-identically.

Scale design (the part that matters at 100 TB of history):

* the store holds 16-byte md5 fingerprints, never text — ~16 GB per
  10^9 documents, and collision odds n²/2^129 stay negligible at any
  corpus size (a 64-bit fingerprint would already be ~3 expected
  collisions at 10^10 docs — wrong tool for exact dedup at this scale;
  the in-batch winner rule still tie-breaks on doc id);
* each ``v=<batch_id>`` is an APPEND-ONLY DELTA segment holding only the
  fingerprints that batch ADDED — per-batch store write cost is
  O(new fingerprints), never O(history). (The r4 layout rewrote the full
  bucket per touched version: a batch of random fingerprints touches
  essentially every bucket, so each nightly batch copied ≈ the whole
  history forward — the exact write-amplification class the bucketed
  snapshot fixed for table state, now fixed for the set too.) The read
  side unions a bucket's committed delta chain; :func:`compact_store`
  folds a chain back to one segment when it grows long — the Delta-log
  add-file / checkpoint split, re-expressed on plain parquet;
* ALL touched buckets' deltas land in ONE partitioned Spark write per
  batch (staging dir + directory renames), not one job per bucket —
  driver round-trips stay O(1) in bucket count;
* the membership probe is one left-anti join of the (small) batch against
  only the touched buckets' committed deltas, hash-partitioned on the
  fingerprint — the history is never scanned in full, never collected,
  never broadcast;
* store parameters are PERSISTED (``_meta.json``, written at creation,
  validated every batch): resuming with a different ``num_buckets`` would
  probe the wrong buckets (history misses → duplicates silently
  re-accepted), a different MinHash ``k/num_hashes/num_bands/seed`` would
  compare bit-incompatible signatures — both now raise instead, the same
  guard ``write_snapshot_bucketed`` carries.

Two acceptance policies share the store machinery:
* :func:`write_dedup_ingest` — EXACT: first occurrence of a text wins
  (16-byte md5 fingerprint store);
* :func:`write_neardup_ingest` — NEAR: a doc is rejected if its MinHash
  Jaccard estimate against any previously accepted doc reaches the
  threshold (banded-signature store; candidates by band-key collision,
  verified against stored signatures — minhash_banded_pairs across time).

Reference: the reference has no corpus surface at all — this extends the
engine's §2C training-data side (SURVEY §2C dedup family).
"""

from __future__ import annotations

import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .snapshot import (
    _V_RE,
    _last_committed_batch,
    _mark_committed,
    _read_meta,
    _write_meta,
)


def _fp(text_col: str) -> F.Column:
    """16-byte binary md5 fingerprint of the text. NULL text fingerprints
    as the empty string: md5(NULL) is NULL, which would both crash the
    touched-bucket sort (None unorderable against ints) and — worse —
    never match the store's anti-join (NULL != NULL), re-accepting every
    null-text row forever. Deduping NULL together with '' is the
    documented contract (both are 'no content')."""
    return F.unhex(F.md5(F.coalesce(F.col(text_col), F.lit(""))))


def _bucket(col: F.Column, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------------------
# shared store machinery (one implementation for the exact and near stores —
# the parent-read/merge/commit sequence used to exist twice and drift)
# ---------------------------------------------------------------------------


def _ensure_meta(store_dir: str, expect: dict) -> None:
    """Create-or-validate the store's persisted parameters. First call
    writes ``_meta.json``; every later call (same run, resumed run, or a
    different pipeline pointed at the same dir) must present identical
    parameters — a silent mismatch would probe the wrong buckets or
    compare bit-incompatible signatures, re-accepting duplicates without
    any error signal."""
    meta = _read_meta(store_dir)
    if meta is None:
        _write_meta(store_dir, expect)
        return
    bad = {k: (meta.get(k), v) for k, v in expect.items() if meta.get(k) != v}
    if bad:
        detail = ", ".join(
            f"{k}: store={s!r} caller={c!r}" for k, (s, c) in sorted(bad.items())
        )
        # a key ABSENT from the store's meta is a pre-versioning store
        # (written before that parameter was guarded), not evidence the
        # data disagrees — tell the operator the one-time backfill path
        # instead of only the generic mismatch (r11 advice: the
        # bucket_layout guard otherwise fails every old-but-compatible
        # store with no migration story)
        missing = sorted(k for k, (s, _) in bad.items() if s is None)
        hint = (
            (
                f" Keys {missing} are absent from the store's _meta.json "
                "(written before they were version-guarded). If the store's "
                "on-disk layout already matches the caller's value — e.g. a "
                "media keys store whose placement formula was always the "
                "current one — backfill once by adding the key(s) to "
                f"{store_dir}/_meta.json; if you are not certain, rebuild "
                "into a new store_dir."
            )
            if missing
            else ""
        )
        raise ValueError(
            f"ingest store at {store_dir} was created with different "
            f"parameters ({detail}); resuming would silently corrupt dedup "
            f"state — use a new store_dir or the original parameters.{hint}"
        )


def _row_ddl(df: DataFrame) -> str:
    """DDL of a delta frame's STORED row shape (``_b`` is a write-side
    partition column — it never lands inside the parquet files)."""
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != "_b"
    )


def _note_row_schema(store_dir: str, ddl: str) -> None:
    """Persist the segment-row schema as a non-guarded ``_meta.json`` key
    so readers can synthesize an empty TYPED frame for a store that is
    COMMITTED but holds no segments (delete-only first batch,
    tombstone-only index, empty-batch-only stream). "Store never written"
    (None) and "store written, history currently empty" (empty frame) are
    different answers, and the stream==batch read contract needs the
    distinction — the batch twin of each store returns an empty frame,
    not None, for those histories. Not part of the :func:`_ensure_meta`
    guard: the schema is derived state, not a resume parameter."""
    meta = _read_meta(store_dir) or {}
    if meta.get("row_schema") != ddl:
        _write_meta(store_dir, {**meta, "row_schema": ddl})


def _empty_rows(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The empty typed frame a committed-but-segmentless store reads as,
    or None when no schema was ever recorded (pre-contract store)."""
    ddl = (_read_meta(store_dir) or {}).get("row_schema")
    return None if ddl is None else spark.createDataFrame([], ddl)


def _committed_union(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Union of every committed delta segment — THE chain read for stores
    whose reads fold the whole history (heavy-hitter counts/docs, the
    sketch MVs). None before the first commit; the typed empty frame for
    a committed-but-segmentless history (the stream==batch distinction
    _note_row_schema exists for). One definition, shared by every store
    module — the committed-read semantics must not drift per store
    (self-review r9: two byte-identical copies had already appeared)."""
    last = _last_committed_batch(store_dir)
    if last is None:
        return None
    paths = [
        p
        for p in _store_paths(store_dir, None, below=last + 1)
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    if not paths:
        return _empty_rows(spark, store_dir)
    # leaf-dir read withOUT basePath: never infer b=/v= partition columns
    return spark.read.parquet(*paths)


_OLD_RE = re.compile(r"^_old_v=(\d+)$")


_REPAIR_RE = re.compile(r"^_repair_[0-9a-f]{32}_v=(\d+)$")

# a live repair is two renames; a claim showing no progress for this long
# has a crashed owner and may be stolen by another repairer
_REPAIR_GRACE_SECONDS = 2.0


def _restore_aside(bucket_dir: str, name: str, version: str) -> None:
    """Claim ``name`` (an ``_old_v=`` aside, or a stranded ``_repair_``
    claim whose owner crashed) by renaming it to a fresh per-attempt claim
    dir, then restore it to ``v=<version>``. The claim rename is the
    mutual-exclusion point: exactly one repairer ever owns the segment, so
    a second concurrent repairer can no longer rmtree a segment the first
    just restored (the r8 advisor's reader-reader interleave — previously
    silent loss of a committed segment). Losing the claim race returns
    quietly; the caller waits for the winner's restore to land."""
    dst = os.path.join(bucket_dir, f"v={version}")
    claim = os.path.join(bucket_dir, f"_repair_{uuid.uuid4().hex}_v={version}")
    try:
        os.replace(os.path.join(bucket_dir, name), claim)
    except OSError:
        return  # another repairer claimed it first — it owns the restore
    if os.path.exists(os.path.join(dst, "_SUCCESS")):
        # a committed segment (writer's fold, or a racing restore that
        # finished before our claim) landed: our claimed copy is the
        # superseded pre-fold garbage
        shutil.rmtree(claim, ignore_errors=True)
        return
    if os.path.isdir(dst):
        # uncommitted partial at the same version: only a crashed legacy
        # write — a live writer never exposes this state (staged renames
        # are atomic and pre-stamped), and no other repairer can have
        # restored here while we hold the claim — clear it
        shutil.rmtree(dst, ignore_errors=True)
    try:
        os.replace(claim, dst)
    except OSError:
        # lost the race with a live writer landing its fold at dst — the
        # fold REPLACES the chain, so our claimed copy is garbage; anything
        # else is a real filesystem error (the segment survives intact
        # under the claim name — nothing is lost, and the next reader's
        # recovery steals and finishes the restore after the grace period)
        if not os.path.exists(os.path.join(dst, "_SUCCESS")):
            raise
        shutil.rmtree(claim, ignore_errors=True)


def _recover_bucket(bucket_dir: str) -> None:
    """Finish a fold placement that crashed mid-swap. compact_chains moves
    the live ``v=<n>`` segment aside to ``_old_v=<n>`` before renaming the
    fold into place (it never rmtree's live data). If the crash hit between
    the two renames, the bucket has an ``_old_v=<n>`` and no committed
    ``v=<n>`` — restore the original so no reader ever loses the segment.
    If the fold DID land, the aside dir is invisible garbage (``_old_v=``
    does not match ``_V_RE``) that compaction's sweep removes. Idempotent,
    safe against concurrent repairers (each restore runs under an
    exclusive claim rename — :func:`_restore_aside`), and safe to race a
    LIVE compaction writer's swap: the writer stages its fold with
    ``_SUCCESS`` inside and renames it in atomically, so ``dst`` only ever
    transitions absent → committed; if a restore loses that race it fails
    on the now-non-empty ``dst`` and the fold's commit marker tells it to
    stand down (the writer's own swap retries symmetrically — see
    compact_chains)."""
    for d in os.listdir(bucket_dir):
        m = _OLD_RE.match(d)
        if not m:
            continue
        dst = os.path.join(bucket_dir, f"v={m.group(1)}")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            continue  # fold landed; the aside dir is compaction's garbage
        _restore_aside(bucket_dir, d, m.group(1))
    # wait out restores owned by concurrent repairers, so this read never
    # proceeds with a committed segment still in transit; a claim that
    # makes no progress for the grace period has a crashed owner — steal
    # it and finish the restore (the claim dir holds the intact segment)
    deadline = time.monotonic() + _REPAIR_GRACE_SECONDS
    while True:
        unresolved = [
            (d, m.group(1))
            for d in os.listdir(bucket_dir)
            if (m := _REPAIR_RE.match(d))
            and not os.path.exists(
                os.path.join(bucket_dir, f"v={m.group(1)}", "_SUCCESS")
            )
        ]
        if not unresolved:
            return
        if time.monotonic() >= deadline:
            break
        time.sleep(0.02)
    for d, version in unresolved:
        _restore_aside(bucket_dir, d, version)


def _committed_versions(bucket_dir: str, below: int | None = None) -> list[int]:
    """All committed (``_SUCCESS``-stamped) delta versions of one bucket,
    ascending; strictly below ``below`` when given (the chain a retried
    batch re-reads).

    A ``_FOLD``-marked segment (placed by :func:`compact_chains` at the
    last committed version) REPLACES the bucket's entire older chain, so
    versions below the newest committed fold are pruned from EVERY read.
    This closes the compaction crash window structurally: a crash between
    fold placement and old-version deletion leaves segments that no reader
    or re-run ever unions with the fold — essential for ADDITIVE folds
    (the decayed-counter store), where leftover chain segments are not
    byte-identical no-ops a distinct() could absorb but double-counted
    contributions, and a re-fold would compound them permanently."""
    if not os.path.isdir(bucket_dir):
        return []
    _recover_bucket(bucket_dir)
    versions = [
        int(m.group(1))
        for d in os.listdir(bucket_dir)
        if (m := _V_RE.match(d))
        and os.path.exists(os.path.join(bucket_dir, d, "_SUCCESS"))
    ]
    if below is not None:
        versions = [v for v in versions if v < below]
    folds = [
        v
        for v in versions
        if os.path.exists(os.path.join(bucket_dir, f"v={v}", "_FOLD"))
    ]
    if folds:
        fmax = max(folds)
        versions = [v for v in versions if v >= fmax]
    return sorted(versions)


def _store_paths(store_dir: str, buckets, below: int | None = None) -> list[str]:
    """Every committed delta-segment path of the given buckets (all
    buckets when ``buckets`` is None) with version < ``below`` — the
    union-read side of the append-only layout."""
    if buckets is None:
        if not os.path.isdir(store_dir):
            return []
        buckets = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(store_dir)
            if d.startswith("b=")
        )
    paths = []
    for b in buckets:
        bdir = f"{store_dir}/b={b}"
        paths.extend(f"{bdir}/v={v}" for v in _committed_versions(bdir, below))
    return paths


def _write_delta(delta: DataFrame, store_dir: str, batch_id: int) -> None:
    """Land one batch's NEW rows as ``b=<k>/v=<batch_id>`` delta segments
    in ONE partitioned Spark write. ``delta`` must carry an int ``_b``
    bucket column; only buckets that actually gained rows get a version
    (empty partitions are never written). Retry-idempotent: a retried
    batch overwrites its own staging dir and its own ``v=<batch_id>``
    segments, touching no other version."""
    staging = os.path.join(store_dir, f"_delta_tmp_{batch_id}")
    shutil.rmtree(staging, ignore_errors=True)
    delta.write.partitionBy("_b").parquet(staging)
    for d in os.listdir(staging):
        if not d.startswith("_b="):
            continue
        b = int(d.split("=", 1)[1])
        dst = os.path.join(store_dir, f"b={b}", f"v={batch_id}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(os.path.join(staging, d), dst)
        with open(os.path.join(dst, "_SUCCESS"), "w"):
            pass
    shutil.rmtree(staging, ignore_errors=True)


def _committed_batches(store_dir: str) -> list[int]:
    """All batch-level commit-marker ids, ascending."""
    d = os.path.join(store_dir, "_commits")
    if not os.path.isdir(d):
        return []
    return sorted(int(n) for n in os.listdir(d) if n.isdigit())


def compact_chains(
    spark: SparkSession,
    store_dir: str,
    bucket_expr: F.Column,
    fold=None,
    force_single: bool = False,
    cleanup_dirs: tuple[str, ...] = (),
    protect: int | None = None,
) -> int | None:
    """THE shared compaction skeleton for every bucketed delta-chain store
    (ingest fingerprint/signature stores, the inverted index, the SCD2
    history): fold each bucket's committed chain into ONE segment at
    ``v=<last_committed>``, delete the folded older versions, remove
    ``cleanup_dirs`` (consumed overlays: tombstones, close patches).
    Single implementation so the three stores' crash/rename/idempotence
    logic cannot drift (the duplicated-merge hazard class the r4 review
    flagged for the ingest stores themselves).

    ``bucket_expr`` recomputes the bucket id from row CONTENT — segments
    are read as leaf dirs withOUT partition-column inference, because
    Spark's case-insensitive resolution would let the lowercase partition
    column ``v`` shadow a user value column ``V`` (bitten once, in the
    SCD2 store). Same hash → same bucket, so recomputation is exact.

    ``fold`` maps the unioned chain DataFrame (with ``_b``) to its folded
    form — default DISTINCT (also absorbs crash-leftover duplicate rows);
    stores with merge-on-read overlays pass a fold that applies them
    physically and set ``force_single`` so even 1-segment chains rewrite.

    Crash-safe and idempotent, via ``_FOLD`` markers: a fold segment is
    staged with its markers INSIDE, the live ``v=<last>`` segment is moved
    aside (never rmtree'd), and one atomic rename makes the fold visible.
    :func:`_committed_versions` prunes every version below a committed
    fold, so a crash between placement and old-version deletion leaves
    segments NO reader or re-fold ever unions with the fold (correct even
    for additive folds like the decayed counters, where duplicates are not
    byte-identical no-ops); a crash between the two renames is repaired by
    :func:`_recover_bucket` on the next read. The sweep below finishes any
    crashed deletion. Uncommitted versions above the marker are never
    touched. Returns the fold version, or None for an empty store.

    ``protect`` is REQUIRED for any caller that runs while a streaming
    batch might still be REPLAYED (in-line maintenance inside
    foreachBatch, or a sweep over a stopped-but-resumable stream's
    store): versions ``>= protect`` are completely invisible to this
    compaction — never folded, never swept, never deleted — and the fold
    lands at the newest committed version STRICTLY BELOW ``protect``.
    Without it, the fold lands at ``v=<last_committed>``; if Spark then
    replays that batch (its store commit marker landed but the streaming
    commit log did not), the retry's ``_write_delta`` would overwrite the
    fold segment — the entire folded history — and its ``below=<batch>``
    history read would exclude the fold while the pre-fold versions are
    already deleted: silent total data loss. With ``protect=<batch_id>``
    the replayed batch overwrites only its own plain delta segment and
    its history read still unions the fold. Overlay consumption is
    scoped the same way: callers apply only overlays below ``protect``
    to the fold, and cleanup here deletes only those overlay segments,
    not the whole overlay dir."""
    last = _last_committed_batch(store_dir)
    if last is None:
        return None
    if protect is not None:
        eligible = [v for v in _committed_batches(store_dir) if v < protect]
        if not eligible:
            return None  # nothing committed strictly below the protected batch
        last = max(eligible)
    stale: dict[int, list[int]] = {}
    for d in sorted(os.listdir(store_dir)):
        if not d.startswith("b="):
            continue
        b = int(d.split("=", 1)[1])
        bdir = os.path.join(store_dir, d)
        vs = _committed_versions(bdir, below=last + 1)  # runs recovery too
        # sweep: committed versions hidden by a fold (crashed deletion) and
        # aside dirs whose fold landed are garbage — remove them here, not
        # on the read path (reads repair, only compaction deletes)
        kept = set(vs)
        for d2 in os.listdir(bdir):
            if (m := _V_RE.match(d2)) is not None:
                v = int(m.group(1))
                if (
                    v <= last
                    and v not in kept
                    and os.path.exists(os.path.join(bdir, d2, "_SUCCESS"))
                ):
                    shutil.rmtree(os.path.join(bdir, d2), ignore_errors=True)
            elif _OLD_RE.match(d2) or _REPAIR_RE.match(d2):
                # recovery at the _committed_versions call above already
                # restored anything live; remaining aside/claim dirs are
                # superseded garbage
                shutil.rmtree(os.path.join(bdir, d2), ignore_errors=True)
        if len(vs) > 1 or (force_single and len(vs) == 1):
            stale[b] = vs
    if not stale:
        _cleanup_overlays(store_dir, cleanup_dirs, protect)
        return last
    paths = []
    for b, vs in stale.items():
        for v in vs:
            p = f"{store_dir}/b={b}/v={v}"
            # fold segments of fully-emptied buckets hold only _SUCCESS
            if any(f.endswith(".parquet") for f in os.listdir(p)):
                paths.append(p)
    staging = os.path.join(store_dir, "_compact_tmp")
    shutil.rmtree(staging, ignore_errors=True)
    if paths:
        df = spark.read.parquet(*paths).withColumn("_b", bucket_expr)
        df = fold(df) if fold is not None else df.distinct()
        df.write.partitionBy("_b").parquet(staging)
    for b, vs in stale.items():
        bdir = os.path.join(store_dir, f"b={b}")
        staged = os.path.join(staging, f"_b={b}")
        dst = os.path.join(bdir, f"v={last}")
        if not os.path.isdir(staged):
            # chain folded to nothing -> empty (marker-only) segment
            os.makedirs(staged, exist_ok=True)
        # markers go INSIDE the staged dir so the rename below is the one
        # atomic commit point — no window where dst exists half-stamped
        open(os.path.join(staged, "_FOLD"), "w").close()
        open(os.path.join(staged, "_SUCCESS"), "w").close()
        old = os.path.join(bdir, f"_old_v={last}")
        shutil.rmtree(old, ignore_errors=True)
        # swap, tolerant of a concurrent reader's _recover_bucket: if the
        # reader restores the aside dir between our two renames, the fold
        # rename fails on the non-empty dst — re-move it aside and retry
        # (the reader only restores while no committed fold sits at dst,
        # so each retry strictly shrinks its window; reads concurrent
        # with the retries see the intact pre-fold chain)
        for _ in range(8):
            if os.path.isdir(dst):
                os.replace(dst, old)  # move the live segment aside, never rmtree
            try:
                os.replace(staged, dst)  # fold lands, committed, atomically
                break
            except OSError:
                continue
        else:
            raise OSError(
                f"compact_chains: could not land fold at {dst} "
                "(persistent race with concurrent reader repair)"
            )
        shutil.rmtree(old, ignore_errors=True)
        for v in vs:  # delete only after the fold segment is visible
            if v != last:
                shutil.rmtree(os.path.join(bdir, f"v={v}"), ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    _cleanup_overlays(store_dir, cleanup_dirs, protect)
    return last


def _cleanup_overlays(
    store_dir: str, cleanup_dirs: tuple[str, ...], protect: int | None
) -> None:
    """Drop consumed overlay segments. Unprotected compaction consumed
    every pending overlay, so the whole dir goes; with ``protect`` only
    overlays at versions < protect were applied to the fold — later ones
    (none can exist committed today, but the scoping is the contract)
    stay pending for merge-on-read."""
    for d in cleanup_dirs:
        odir = os.path.join(store_dir, d)
        if protect is None:
            shutil.rmtree(odir, ignore_errors=True)
            continue
        if not os.path.isdir(odir):
            continue
        for seg in os.listdir(odir):
            # same name filter readers use (_committed_batches): a stray
            # non-numeric entry (editor artifact, crashed "v=tmp") must not
            # raise ValueError here, failing maintenance inside foreachBatch
            # where the unprotected whole-dir rmtree tolerated anything
            if seg.startswith("v=") and seg[2:].isdigit() and int(seg[2:]) < protect:
                shutil.rmtree(os.path.join(odir, seg), ignore_errors=True)


def compact_store(
    spark: SparkSession, store_dir: str, protect: int | None = None
) -> int | None:
    """Fold the ingest store's delta chains (see :func:`compact_chains`)
    — the checkpoint half of the delta-log layout, and the store's ONLY
    retention mechanism (a version-count vacuum would delete membership:
    with append-only deltas, old versions ARE the state). Run it when
    chains grow long; cadence is a policy call, e.g. nightly or at chain
    length ≥ N. The bucket id is recomputed from row content per the
    store's persisted kind (exact: xxhash64(fp); near: xxhash64(band,
    key)) — identical to the write-side expression."""
    meta = _read_meta(store_dir) or {}
    nb = meta.get("num_buckets", 16)
    if meta.get("kind") == "neardup":
        bucket_expr = F.pmod(
            F.xxhash64(F.col("band"), F.col("key")), F.lit(nb)
        ).cast("int")
    else:
        bucket_expr = _bucket(F.col("fp"), nb)
    # stores with pending tombstones apply them PHYSICALLY during the
    # fold, then drop the consumed segments. Exact stores: version-aware
    # on fingerprints (an add newer than its fp's newest tombstone
    # survives — module note at _tomb_dir). Near stores: id-keyed
    # anti-join (accepted ids are never re-added). protect scopes both:
    # only tombstones strictly below it are applied/consumed.
    fold = None
    force_single = False
    cleanup: tuple[str, ...] = ()
    last = _last_committed_batch(store_dir)
    if last is not None:
        tomb = _committed_tombs(
            spark, store_dir, below=(last + 1 if protect is None else protect)
        )
        if tomb is not None and meta.get("kind") == "neardup":
            id_dvs = tomb.groupBy("id").agg(F.max("dv").alias("_dv"))

            def fold(df):  # noqa: F811 — version-aware id-tombstone fold
                df = _with_seg_version(df)
                df = df.join(id_dvs, "id", "left").filter(
                    F.col("_dv").isNull() | (F.col("_dv") <= F.col("_v"))
                )
                return df.drop("_v", "_dv").distinct()

            force_single = True
            cleanup = ("_tomb",)
        elif tomb is not None:
            dvs = tomb.groupBy("fp").agg(F.max("dv").alias("_dv"))

            def fold(df):  # noqa: F811 — version-aware fp-tombstone fold
                df = _with_seg_version(df)
                df = df.join(dvs, "fp", "left").filter(
                    F.col("_dv").isNull() | (F.col("_dv") <= F.col("_v"))
                )
                return df.drop("_v", "_dv").distinct()

            force_single = True
            cleanup = ("_tomb",)
    out = compact_chains(
        spark, store_dir, bucket_expr, fold=fold,
        force_single=force_single, cleanup_dirs=cleanup, protect=protect,
    )
    bd = _bloom_dir(store_dir)
    if meta.get("bloom_bits") and os.path.isdir(bd):
        # the bloom sidecar folds by bit_or — idempotent, so crash
        # leftovers and replays are no-ops by algebra, not just by the
        # fold-marker protocol
        compact_chains(
            spark,
            bd,
            _bloom_bucket(),
            fold=lambda df: df.groupBy("_b", "word_idx").agg(
                F.bit_or("bits").alias("bits")
            ),
            protect=protect,
        )
    return out


def store_size(spark: SparkSession, store_dir: str) -> int:
    """Committed seen-set cardinality (distinct fingerprints for the exact
    store, distinct accepted docs for the signature store) — ONE multi-path
    Spark job over every committed segment, not a job per bucket."""
    last = _last_committed_batch(store_dir)
    if last is None:
        return 0
    paths = _store_paths(store_dir, None, below=last + 1)
    if not paths:
        return 0
    df = spark.read.parquet(*paths)
    if "fp" in df.columns:
        # tombstone-aware (no-op when no _tomb overlay exists)
        return _live_fps(spark, store_dir, df, tomb_below=last + 1).distinct().count()
    # id-keyed (near-dup) stores: same tombstone semantics — taken-down /
    # deleted docs are not members (r10 advice: the two store families
    # must report consistent post-deletion sizes)
    tomb = _committed_tombs(spark, store_dir, below=last + 1)
    if tomb is None:
        return df.select("id").distinct().count()
    av = _with_seg_version(df).groupBy("id").agg(F.max("_v").alias("_av"))
    dv = tomb.groupBy("id").agg(F.max("dv").alias("_dv"))
    return (
        av.join(dv, "id", "left")
        .filter(F.col("_dv").isNull() | (F.col("_dv") <= F.col("_av")))
        .count()
    )


# ---------------------------------------------------------------------------
# exact-dedup ingestion
# ---------------------------------------------------------------------------


# ---- fingerprint tombstones (r10, the CDC→corpus bridge's delete path) ----
#
# A corpus fed by a CDC stream must FORGET deleted content: after a doc is
# deleted (or updated away), a later arrival of the same text is novel
# again. Tombstones are the search_index._tomb overlay pattern applied to
# fingerprints, made VERSION-AWARE so re-adds survive compaction: a tomb
# row is (fp, dv) where dv is the delete batch; an add is live iff its
# newest segment version is AT OR ABOVE the fp's newest tombstone —
# within one batch removals run first (the bridge/takedown convention),
# so a same-batch add re-establishes membership in the batch the old
# owner left. Segment versions come from the delta-chain layout
# itself (the v=<batch> path component via _metadata.file_path), so no row
# format change is needed on the add side; compaction folds survivors to
# the fold version, which only ever RAISES an add's effective version —
# monotone against past tombstones, and pending tombstones (>= protect)
# still compare correctly against it.


def _tomb_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "_tomb")


def _with_seg_version(df: DataFrame) -> DataFrame:
    """Attach the delta-chain segment version (the ``v=<batch>`` path
    component) as ``_v`` — valid only directly on a file-source read."""
    return df.withColumn(
        "_v",
        F.regexp_extract(
            F.col("_metadata.file_path"), r"/v=(\d+)/", 1
        ).cast("long"),
    )


def _committed_tombs(
    spark: SparkSession, store_dir: str, below: int
) -> DataFrame | None:
    """Committed fingerprint tombstones ``(fp, dv)`` with dv < below."""
    tdir = _tomb_dir(store_dir)
    if not os.path.isdir(tdir):
        return None
    paths = [
        f"{tdir}/v={v}"
        for v in sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(tdir)
            if d.startswith("v=") and int(d.split("=", 1)[1]) < below
        )
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _live_fps(
    spark: SparkSession, store_dir: str, seen: DataFrame, tomb_below: int
) -> DataFrame:
    """The LIVE fingerprints among ``seen`` (a direct file-source read of
    committed add segments): tombstones applied version-aware (module
    note above). One column ``fp``."""
    tomb = _committed_tombs(spark, store_dir, below=tomb_below)
    if tomb is None:
        return seen.select("fp")
    av = _with_seg_version(seen).groupBy("fp").agg(F.max("_v").alias("_av"))
    dv = tomb.groupBy("fp").agg(F.max("dv").alias("_dv"))
    return (
        av.join(dv, "fp", "left")
        .filter(F.col("_dv").isNull() | (F.col("_dv") <= F.col("_av")))
        .select("fp")
    )


def remove_batch_exact(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Tombstone the fingerprints OWNED by the given deleted (or
    updated-away) rows — the exact store's delete path (cdc39).

    OWNER CHECK: dedup-at-ingest means each text has exactly one corpus
    member — the accepted owner. A duplicate row that was REJECTED at
    ingest never owned its fingerprint, so deleting it must not free
    membership while the owner remains; the store carries the owner id
    per fp (``ingest_batch_exact(store_owner_ids=True)``) precisely for
    this check. Touched-bucket bounded: only the delete fps' buckets are
    read. Stores written without owner ids tombstone unconditionally
    (the caller asserts deletes are owners). O(deleted rows) writes —
    one tiny ``_tomb/v=<batch>`` segment; the add chains are never
    rewritten here (compaction applies tombstones physically later)."""
    meta = _read_meta(store_dir) or {}
    nb = meta.get("num_buckets", 16)
    dels = (
        batch.select(
            F.col(id_col).cast("long").alias("id"), _fp(text_col).alias("fp")
        )
        .distinct()
        .withColumn("_b", _bucket(F.col("fp"), nb))
    )
    touched = sorted(r["_b"] for r in dels.select("_b").distinct().collect())
    paths = _store_paths(store_dir, touched, below=batch_id)
    if paths:
        seen = spark.read.parquet(*paths)
        if "id" in seen.columns:
            # owner = the CURRENT LIVE owner (the corpus_members rule):
            # among a live fp's add rows, the newest segment version's id.
            # Matching ANY historical (fp, id) pair would let a STALE pair
            # — a previous owner whose fp was tombstoned and re-owned
            # since — free the new owner's membership (r10 advice), and
            # make the outcome depend on compaction timing (compaction
            # physically drops stale pairs). live fps only: deleting
            # already-dead content is a no-op, not a newer tombstone.
            live = _live_fps(spark, store_dir, seen, tomb_below=batch_id)
            owners = (
                _with_seg_version(seen)
                .groupBy("fp")
                .agg(F.max_by("id", "_v").alias("id"))
                .join(live, "fp", "left_semi")
            )
            owned = dels.join(owners, ["fp", "id"], "left_semi")
        else:
            owned = dels
        tomb = (
            owned.select("fp")
            .distinct()
            .withColumn("dv", F.lit(batch_id).cast("long"))
        )
        dst = os.path.join(_tomb_dir(store_dir), f"v={batch_id}")
        shutil.rmtree(dst, ignore_errors=True)
        tomb.coalesce(1).write.mode("overwrite").parquet(dst)
    _mark_committed(store_dir, batch_id)


def remove_batch_neardup(
    spark: SparkSession,
    doc_ids: DataFrame,
    batch_id: int,
    store_dir: str,
    id_col: str = "doc_id",
) -> None:
    """Tombstone accepted documents in the NEAR-dup signature store
    (takedown / curation kill cdc40; bridge deletes and updates cdc41):
    their banded signatures stop rejecting arrivals immediately
    (merge-on-read exclusion) and leave the chains physically at the
    next compaction. Id-keyed and VERSION-AWARE like the exact store's
    fingerprints — an UPDATE re-adds signatures under the same id in
    the same or a later batch, and those survive (live iff segment
    version >= the id's newest tombstone; removals run first within a
    batch). O(removed ids) write: one tiny ``_tomb/v=<batch>`` segment;
    the signature chains are not touched here."""
    tomb = doc_ids.select(
        F.col(id_col).cast("long").alias("id")
    ).distinct().withColumn("dv", F.lit(batch_id).cast("long"))
    dst = os.path.join(_tomb_dir(store_dir), f"v={batch_id}")
    shutil.rmtree(dst, ignore_errors=True)
    tomb.coalesce(1).write.mode("overwrite").parquet(dst)
    _mark_committed(store_dir, batch_id)


# the bloom sidecar's bitmap relation is m/32 rows — a handful of buckets
# keeps per-batch delta file counts tiny without losing write parallelism
_BLOOM_BUCKETS = 4


def _bloom_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "_bloom")


def _bloom_bucket() -> F.Column:
    return F.pmod(F.col("word_idx"), F.lit(_BLOOM_BUCKETS)).cast("int")


def _read_bloom(spark: SparkSession, store_dir: str, below: int) -> DataFrame | None:
    """The committed bloom bitmap strictly below ``below`` — per-batch
    deltas bit_or-folded to one (word_idx, bits) relation. None when no
    delta committed yet."""
    paths = _store_paths(_bloom_dir(store_dir), None, below=below)
    if not paths:
        return None
    return (
        spark.read.parquet(*paths)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def ingest_batch_exact(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    bloom_bits: int | None = None,
    bloom_hashes: int = 5,
    store_owner_ids: bool = False,
) -> None:
    """One exact-dedup ingest step (the foreachBatch body, public so batch
    pipelines and job-count tests can drive it directly): keep the batch's
    never-seen texts, land them in ``out_dir/batch=<id>``, append their
    fingerprints as delta segments, then commit. Driver-side job count is
    O(1) in bucket count: probe collect + output write + one partitioned
    delta write.

    ``store_owner_ids=True`` (r10) records the accepted row's ``id_col``
    next to each fingerprint, enabling :func:`remove_batch_exact`'s
    owner check (the CDC→corpus bridge's delete path); the probe also
    becomes TOMBSTONE-AWARE — a fingerprint whose newest tombstone is
    newer than its newest add no longer rejects (the content left the
    corpus; a re-send is novel again). Stores without tombstones pay no
    extra work (the probe short-circuits to the plain anti-join).

    ``bloom_bits`` (opt-in, r9) adds the functions/bloom.py PRE-SCREEN as
    a ``_bloom`` sidecar chain: per batch the new fingerprints' bitmap
    delta lands next to the fp delta, and the history anti-join runs only
    for the batch rows the bitmap might contain — a fresh crawl's
    definitely-new majority never touches the fp chains, and the
    touched-bucket read shrinks to the might-contain rows' buckets. The
    accepted set is EXACTLY the non-bloom one (no false negatives by
    construction; equivalence test-pinned). Write/commit order keeps the
    no-FN invariant across crashes: fp delta → bloom delta → bloom commit
    → store commit, so a committed store batch ALWAYS has its bloom bits
    (a crash in between leaves the batch invisible and the retry rewrites
    both). The parameter is _meta-guarded like num_buckets: resuming a
    bloom store without it (or vice versa, or with different bits/hashes)
    raises instead of silently risking false negatives."""
    _ensure_meta(
        store_dir,
        {
            "kind": "exact",
            "num_buckets": num_buckets,
            "bloom_bits": bloom_bits,
            "bloom_hashes": bloom_hashes if bloom_bits else None,
            # meta-guarded like num_buckets: chains mixing rows with and
            # without the owner-id column would make the union read's
            # schema (and the owner check) depend on file order
            "owner_ids": store_owner_ids,
        },
    )
    fps = batch.withColumn("_fp", _fp(text_col)).withColumn(
        "_b", _bucket(F.col("_fp"), num_buckets)
    )
    # in-batch first-occurrence rule: one candidate row per fingerprint
    w = Window.partitionBy("_b", "_fp").orderBy(id_col)
    firsts = (
        fps.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    try:
        probe = firsts
        fresh = flagged = None
        if bloom_bits is not None:
            from ..functions.bloom import bloom_probe

            bloom = _read_bloom(spark, store_dir, below=batch_id)
            if bloom is not None:
                flags = bloom_probe(
                    firsts.select("_fp"),
                    F.col("_fp"),
                    bloom,
                    ["_fp"],
                    num_bits=bloom_bits,
                    num_hashes=bloom_hashes,
                )
                flagged = firsts.join(flags, "_fp").persist()
                probe = flagged.filter(F.col("might_contain")).drop("might_contain")
                fresh = flagged.filter(~F.col("might_contain")).drop("might_contain")
        touched = sorted(r["_b"] for r in probe.select("_b").distinct().collect())
        paths = _store_paths(store_dir, touched, below=batch_id)
        if paths:
            # tombstone-aware: live fps only (tomb read includes the CURRENT
            # batch's own removals — the bridge tombstones before it adds,
            # so a same-batch delete+insert of one text nets to membership)
            seen = spark.read.parquet(*paths)
            live = _live_fps(spark, store_dir, seen, tomb_below=batch_id + 1)
            survivors = probe.join(
                live.select(F.col("fp").alias("_fp")), "_fp", "left_anti"
            )
        else:
            survivors = probe
        new = (
            survivors if fresh is None else survivors.unionByName(fresh)
        ).persist()
        try:
            (
                new.drop("_fp", "_b")
                .write.mode("overwrite")
                .parquet(f"{out_dir}/batch={batch_id}")
            )
            delta_cols = [F.col("_fp").alias("fp"), F.col("_b")]
            if store_owner_ids:
                delta_cols.insert(1, F.col(id_col).cast("long").alias("id"))
            _write_delta(new.select(*delta_cols), store_dir, batch_id)
            if bloom_bits is not None:
                from ..functions.bloom import bloom_build

                bd = _bloom_dir(store_dir)
                _ensure_meta(
                    bd,
                    {
                        "kind": "bloom",
                        "num_buckets": _BLOOM_BUCKETS,
                        "bits": bloom_bits,
                        "hashes": bloom_hashes,
                    },
                )
                delta = bloom_build(
                    new.select("_fp"),
                    F.col("_fp"),
                    num_bits=bloom_bits,
                    num_hashes=bloom_hashes,
                ).withColumn("_b", _bloom_bucket())
                _note_row_schema(bd, _row_ddl(delta))
                _write_delta(delta, bd, batch_id)
                _mark_committed(bd, batch_id)
            _mark_committed(store_dir, batch_id)
        finally:
            new.unpersist()
            if flagged is not None:
                flagged.unpersist()
    finally:
        firsts.unpersist()


def write_dedup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
    bloom_bits: int | None = None,
    bloom_hashes: int = 5,
):
    """Stream of documents → ``out_dir/batch=<id>`` containing ONLY the
    never-seen-before documents (first occurrence wins, min ``id_col``
    inside a batch), with the seen-set growing by delta segments in the
    bucketed fingerprint store. Returns the StreamingQuery.

    Exactly-once: a retried batch re-reads the same committed delta chain
    (versions strictly below its batch_id per bucket) and overwrites its
    own ``batch=<id>`` output and ``v=<batch_id>`` delta segments; the
    commit marker is written last, so a crash mid-batch is never visible.

    ``max_chain`` schedules in-line maintenance after each batch (parity
    with every other chain-store writer, r8): listdir-cheap check,
    compaction with ``protect=batch_id`` so a replayed batch keeps its
    own delta and the fold (see compact_chains); None leaves scheduling
    to an external sweep.

    ``bloom_bits`` enables the Bloom pre-screen sidecar (see
    :func:`ingest_batch_exact`): accepted set identical, history
    anti-join paid only by might-contain rows."""
    spark = docs_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_exact(
            spark, batch, batch_id, out_dir, store_dir,
            id_col=id_col, text_col=text_col, num_buckets=num_buckets,
            bloom_bits=bloom_bits, bloom_hashes=bloom_hashes,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            maintain_store(spark, store_dir, max_chain=max_chain,
                           max_overlays=max_chain, protect=batch_id)

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# near-dup ingestion
# ---------------------------------------------------------------------------


def ingest_batch_neardup(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    threshold: float = 0.5,
    num_buckets: int = 16,
    star_bucket_size: int | None = None,
    bloom_bits: int | None = None,
    bloom_hashes: int = 5,
) -> None:
    """One near-dup ingest step (foreachBatch body of
    :func:`write_neardup_ingest`, public for batch use and job-count
    tests). Same store mechanics as the exact path — delta-segment write,
    touched-bucket probe, commit marker — with MinHash acceptance.

    ``bloom_bits`` (opt-in, r9): the exact path's pre-screen applied to
    BAND KEYS — the bloom holds every committed ``band:key``, so a batch
    band row the bitmap rejects can produce no history candidate and is
    excluded from the touched-bucket read entirely (a fresh crawl with no
    colliding keys reads zero store buckets). Acceptance is EXACTLY the
    non-bloom run's (no false negatives ⇒ no candidate lost; false
    positives only cost a bucket read). Same crash-ordering and _meta
    guard as :func:`ingest_batch_exact`."""
    from ..functions.dedup import (
        _banded_pairs_from_sigs,
        dup_clusters,
        minhash_agree_frac,
        minhash_band_keys,
        minhash_signatures,
    )

    _ensure_meta(
        store_dir,
        {
            "kind": "neardup",
            "num_buckets": num_buckets,
            "k": k,
            "num_hashes": num_hashes,
            "num_bands": num_bands,
            "seed": seed,
            "threshold": threshold,
            "bloom_bits": bloom_bits,
            "bloom_hashes": bloom_hashes if bloom_bits else None,
        },
    )
    bucket_of = F.pmod(
        F.xxhash64(F.col("band"), F.col("key")), F.lit(num_buckets)
    ).cast("int")
    batch = batch.persist()
    try:
        # signatures computed ONCE for the whole batch (persisted: they
        # feed the in-batch pair stage, the history probe, and the delta
        # write — the shingle+minhash pass is the batch's priciest kernel
        # and used to run twice, once inside minhash_banded_pairs and
        # once on the representatives)
        sigs_all = minhash_signatures(
            batch, text_col, id_col, k=k, num_hashes=num_hashes, seed=seed
        ).localCheckpoint()
        # EAGER (was a lazy persist): the signature relation feeds the band
        # keys and BOTH verify sides — AQE materializes those exchanges as
        # concurrent jobs that would otherwise race into the shingle+minhash
        # UDF subtree (block-lock serialization, duplicated python work —
        # the q105 profile). localCheckpoint also cuts the lineage so each
        # consumer's plan stays flat.
        # 1. in-batch: one representative per near-dup cluster.
        # star_bucket_size forwards the giant-bucket guard: a batch
        # containing one page duplicated 10^6 times must not build a
        # 5*10^11-pair array inside a single posting row
        pairs = _banded_pairs_from_sigs(
            sigs_all, num_hashes=num_hashes, num_bands=num_bands,
            star_bucket_size=star_bucket_size,
        ).filter(F.col("jaccard_est") >= threshold)
        clusters = dup_clusters(pairs)
        dup_ids = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias("id")
        )
        reps = batch.join(
            dup_ids.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
        sigs = sigs_all.join(dup_ids, "id", "left_anti")
        bands = minhash_band_keys(
            sigs, num_hashes=num_hashes, num_bands=num_bands
        ).withColumn("_b", bucket_of)

        # 2. probe history: only the buckets this batch's keys land in —
        # and with the bloom sidecar, only the keys the bitmap might hold
        bands_maybe = bands
        if bloom_bits is not None:
            from ..functions.bloom import bloom_probe

            bloom = _read_bloom(spark, store_dir, below=batch_id)
            if bloom is not None:
                keys = bands.select("band", "key").distinct()
                flags = bloom_probe(
                    keys,
                    F.concat_ws(":", F.col("band"), F.col("key")),
                    bloom,
                    ["band", "key"],
                    num_bits=bloom_bits,
                    num_hashes=bloom_hashes,
                )
                bands_maybe = bands.join(
                    flags.filter(F.col("might_contain")).select("band", "key"),
                    ["band", "key"],
                    "left_semi",
                )
        touched = sorted(
            r["_b"] for r in bands_maybe.select("_b").distinct().collect()
        )
        paths = _store_paths(store_dir, touched, below=batch_id)
        if paths:
            hist = spark.read.parquet(*paths)
            # id tombstones (takedowns cdc40, bridge deletes/updates
            # cdc41): a removed doc's signatures no longer reject
            # arrivals. VERSION-AWARE like the exact store's fps — an
            # UPDATE re-adds signatures under the SAME id, so a row is
            # live iff its segment version is at/above the id's newest
            # tombstone (removals run first within a batch)
            tomb = _committed_tombs(spark, store_dir, below=batch_id + 1)
            if tomb is not None:
                dvs = tomb.groupBy("id").agg(F.max("dv").alias("_dv"))
                hist = (
                    _with_seg_version(hist)
                    .join(dvs, "id", "left")
                    .filter(
                        F.col("_dv").isNull() | (F.col("_dv") <= F.col("_v"))
                    )
                    .drop("_v", "_dv")
                )
            cand = (
                bands_maybe.join(
                    hist.select("band", "key", F.col("sig").alias("_hsig")),
                    ["band", "key"],
                )
                .select("id", "_hsig")
                .distinct()
            )
            rejected = (
                cand.join(sigs, "id")
                .filter(
                    minhash_agree_frac(F.col("sig"), F.col("_hsig"), num_hashes)
                    >= threshold
                )
                .select("id")
                .distinct()
            )
            accepted_ids = sigs.select("id").join(rejected, "id", "left_anti")
        else:
            accepted_ids = sigs.select("id")
        accepted_ids = accepted_ids.persist()
        try:
            # 3. land survivors + append their banded signatures.
            # Docs shorter than k tokens carry no shingles/signature
            # (minhash_signatures drops them) — they cannot participate
            # in MinHash similarity at all, so they are accepted as-is
            # (exact-dup control for them is write_dedup_ingest's job).
            no_sig = reps.select(F.col(id_col).alias("id")).join(
                sigs.select("id"), "id", "left_anti"
            )
            (
                batch.join(
                    accepted_ids.unionByName(no_sig)
                    .select(F.col("id").alias(id_col)),
                    id_col,
                )
                .write.mode("overwrite")
                .parquet(f"{out_dir}/batch={batch_id}")
            )
            _write_delta(
                bands.join(accepted_ids, "id")
                .join(sigs, "id")
                .select("band", "key", "id", "sig", "_b"),
                store_dir,
                batch_id,
            )
            if bloom_bits is not None:
                from ..functions.bloom import bloom_build

                bd = _bloom_dir(store_dir)
                _ensure_meta(
                    bd,
                    {
                        "kind": "bloom",
                        "num_buckets": _BLOOM_BUCKETS,
                        "bits": bloom_bits,
                        "hashes": bloom_hashes,
                    },
                )
                delta = bloom_build(
                    bands.join(accepted_ids, "id").select("band", "key"),
                    F.concat_ws(":", F.col("band"), F.col("key")),
                    num_bits=bloom_bits,
                    num_hashes=bloom_hashes,
                ).withColumn("_b", _bloom_bucket())
                _note_row_schema(bd, _row_ddl(delta))
                _write_delta(delta, bd, batch_id)
                _mark_committed(bd, batch_id)
            _mark_committed(store_dir, batch_id)
        finally:
            accepted_ids.unpersist()
            sigs_all.unpersist()
    finally:
        batch.unpersist()


def write_neardup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    threshold: float = 0.5,
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    star_bucket_size: int | None = None,
    max_chain: int | None = 64,
    bloom_bits: int | None = None,
    bloom_hashes: int = 5,
):
    """NEAR-dup sibling of :func:`write_dedup_ingest`: a new document is
    accepted only if its MinHash Jaccard estimate against EVERY previously
    accepted document is below ``threshold`` — "don't ingest another copy
    of a page the corpus already has, even lightly edited".

    Per-batch semantics (deterministic, run-order-independent):
      1. in-batch near-dup clusters (banded MinHash pairs ≥ threshold →
         connected components) keep one representative per cluster (min
         id — the same rule as corpus_pipeline stage 03);
      2. representatives are probed against the HISTORY: band-key
         collisions against the persisted signature store propose
         candidates, the stored signatures verify the estimate (the same
         two-step as minhash_banded_pairs, across time instead of within
         a frame); any rep at/above threshold is rejected — the history
         already carries a representative covering it;
      3. surviving reps land in ``out_dir/batch=<id>``, and their banded
         signature rows append to the store as that batch's delta.

    Store layout/scale: rows (band, key, id, sig) bucketed by
    ``xxhash64(band, key) mod num_buckets``, append-only delta segments
    under the same versioned ``b=<k>/v=<batch_id>`` retry-idempotent
    chain as the exact store. The signature is duplicated per band
    (num_bands × H longs per doc) so the verify step needs NO second join
    against a separate signature table — the classic space-for-join
    trade; the probe is one equi-join on (band, key) against only the
    TOUCHED buckets' chains. Signatures are deterministic in
    (k, num_hashes, seed) (minhash_signatures) and those parameters are
    pinned in ``_meta.json``, so signatures written in batch 0 are
    bit-comparable in batch 1000 — and a resume that would break that
    raises instead of silently re-accepting duplicates.
    """
    spark = docs_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_neardup(
            spark, batch, batch_id, out_dir, store_dir,
            id_col=id_col, text_col=text_col, k=k, num_hashes=num_hashes,
            num_bands=num_bands, seed=seed, threshold=threshold,
            num_buckets=num_buckets, star_bucket_size=star_bucket_size,
            bloom_bits=bloom_bits, bloom_hashes=bloom_hashes,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            # protect=batch_id: a replayed batch must find its own delta
            # and the pre-batch history intact (see compact_chains)
            maintain_store(spark, store_dir, max_chain=max_chain,
                           max_overlays=max_chain, protect=batch_id)

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ingested(spark, out_dir: str, store_dir: str | None = None) -> DataFrame | None:
    """All accepted documents across batches (``batch`` partition column),
    or None before the first batch.

    Pass ``store_dir`` to gate on the store's commit marker: a crash
    between the output write and the store commit leaves a ``batch=<id>``
    dir whose dedup state never persisted — with the gate, such torn
    batches stay invisible until their retry commits (the same
    marker-bounded visibility read_snapshot_bucketed enforces). Without
    ``store_dir`` every batch dir is surfaced (the pre-gate behavior,
    fine for post-hoc analysis of a finished stream)."""
    if not os.path.isdir(out_dir):
        return None
    if store_dir is not None:
        last = _last_committed_batch(store_dir)
        if last is None:  # nothing committed yet → nothing visible
            return None
    else:
        last = None
    dirs = [
        d
        for d in os.listdir(out_dir)
        if d.startswith("batch=")
        and (last is None or int(d.split("=")[1]) <= last)
    ]
    if not dirs:
        return None
    return spark.read.option("basePath", out_dir).parquet(
        *[f"{out_dir}/{d}" for d in dirs]
    )
