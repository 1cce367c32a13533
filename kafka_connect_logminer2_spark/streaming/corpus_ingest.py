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
* the store is hash-BUCKETED on the fingerprint: a batch rewrites only
  the buckets its new fingerprints land in — per-batch store cost is
  O(touched buckets), not O(history) (the write-amplification fix
  write_snapshot_bucketed proves for table state, applied to a set);
* the membership probe is one left-anti join of the (small) batch against
  only the touched buckets' current versions, hash-partitioned on the
  fingerprint — the history is never scanned in full, never collected,
  never broadcast.

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

from pyspark.sql import DataFrame, Window, functions as F

from .snapshot import _last_committed_batch, _mark_committed, latest_version

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


def write_dedup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    trigger_available_now: bool = True,
):
    """Stream of documents → ``out_dir/batch=<id>`` containing ONLY the
    never-seen-before documents (first occurrence wins, min ``id_col``
    inside a batch), with the seen-set folded forward in the bucketed
    fingerprint store. Returns the StreamingQuery.

    Exactly-once: a retried batch re-reads the same parent store versions
    (largest v strictly below its batch_id per bucket) and overwrites its
    own ``batch=<id>`` output and ``v=<batch_id>`` store versions; the
    commit marker is written last, so a crash mid-batch is never visible.
    """
    spark = docs_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
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
            touched = sorted(
                r["_b"] for r in firsts.select("_b").distinct().collect()
            )
            paths = []
            parents: dict[int, int | None] = {}
            for b in touched:
                parents[b] = latest_version(f"{store_dir}/b={b}", below=batch_id)
                if parents[b] is not None:
                    paths.append(f"{store_dir}/b={b}/v={parents[b]}")
            if paths:
                seen = spark.read.option("basePath", store_dir).parquet(*paths)
                new = firsts.join(
                    seen.select(F.col("fp").alias("_fp")), "_fp", "left_anti"
                ).persist()
            else:
                new = firsts
            try:
                (
                    new.drop("_fp", "_b")
                    .write.mode("overwrite")
                    .parquet(f"{out_dir}/batch={batch_id}")
                )
                # version only buckets that actually GAINED fingerprints —
                # a duplicate-heavy batch probes many buckets but must not
                # rewrite them (prev ∪ ∅ copies are pure write
                # amplification; the r4-review finding)
                add_touched = sorted(
                    r["_b"] for r in new.select("_b").distinct().collect()
                )
                for b in add_touched:
                    prev = (
                        spark.read.parquet(f"{store_dir}/b={b}/v={parents[b]}")
                        if parents[b] is not None
                        else None
                    )
                    add = new.filter(F.col("_b") == b).select(
                        F.col("_fp").alias("fp")
                    )
                    merged = add if prev is None else prev.unionByName(add)
                    merged.write.mode("overwrite").parquet(
                        f"{store_dir}/b={b}/v={batch_id}"
                    )
                _mark_committed(store_dir, batch_id)
            finally:
                if new is not firsts:
                    new.unpersist()
        finally:
            firsts.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
         signature rows append to the store.

    Store layout/scale: rows (band, key, id, sig) bucketed by
    ``xxhash64(band, key) mod num_buckets`` under the same versioned
    ``b=<k>/v=<batch_id>`` retry-idempotent chain as the exact store. The
    signature is duplicated per band (num_bands × H longs per doc) so the
    verify step needs NO second join against a separate signature table —
    the classic space-for-join trade; the probe is one equi-join on
    (band, key) against only the TOUCHED buckets. Signatures are
    deterministic in (k, num_hashes, seed) (minhash_signatures), so
    signatures written in batch 0 are bit-comparable in batch 1000.
    """
    from ..functions.dedup import (
        dup_clusters,
        minhash_agree_frac,
        minhash_band_keys,
        minhash_banded_pairs,
        minhash_signatures,
    )

    spark = docs_stream.sparkSession
    bucket_of = F.pmod(F.xxhash64(F.col("band"), F.col("key")), F.lit(num_buckets)).cast(
        "int"
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            # 1. in-batch: one representative per near-dup cluster
            # star_bucket_size forwards the giant-bucket guard: a batch
            # containing one page duplicated 10^6 times must not build a
            # 5*10^11-pair array inside a single posting row
            pairs = minhash_banded_pairs(
                batch, text_col, id_col, k=k, num_hashes=num_hashes,
                num_bands=num_bands, seed=seed,
                star_bucket_size=star_bucket_size,
            ).filter(F.col("jaccard_est") >= threshold)
            clusters = dup_clusters(pairs)
            reps = (
                batch.join(
                    clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
                        F.col("doc_id").alias(id_col)
                    ),
                    id_col,
                    "left_anti",
                )
            )
            sigs = minhash_signatures(
                reps, text_col, id_col, k=k, num_hashes=num_hashes, seed=seed
            ).persist()
            bands = minhash_band_keys(
                sigs, num_hashes=num_hashes, num_bands=num_bands
            ).withColumn("_b", bucket_of)

            # 2. probe history: only the buckets this batch's keys land in
            touched = sorted(
                r["_b"] for r in bands.select("_b").distinct().collect()
            )
            paths, parents = [], {}
            for b in range(num_buckets):
                parents[b] = latest_version(f"{store_dir}/b={b}", below=batch_id)
            for b in touched:
                if parents[b] is not None:
                    paths.append(f"{store_dir}/b={b}/v={parents[b]}")
            if paths:
                hist = spark.read.option("basePath", store_dir).parquet(*paths)
                cand = (
                    bands.join(
                        hist.select(
                            "band", "key", F.col("sig").alias("_hsig")
                        ),
                        ["band", "key"],
                    )
                    .select("id", "_hsig")
                    .distinct()
                )
                rejected = (
                    cand.join(sigs, "id")
                    .filter(
                        minhash_agree_frac(
                            F.col("sig"), F.col("_hsig"), num_hashes
                        )
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
                add = (
                    bands.join(accepted_ids, "id")
                    .join(sigs, "id")
                    .select("band", "key", "id", "sig", "_b")
                )
                add = add.persist()
                add_touched = sorted(
                    r["_b"] for r in add.select("_b").distinct().collect()
                )
                for b in add_touched:
                    prev = (
                        spark.read.parquet(f"{store_dir}/b={b}/v={parents[b]}")
                        if parents[b] is not None
                        else None
                    )
                    rows = add.filter(F.col("_b") == b).drop("_b")
                    merged = rows if prev is None else prev.select(
                        "band", "key", "id", "sig"
                    ).unionByName(rows)
                    merged.write.mode("overwrite").parquet(
                        f"{store_dir}/b={b}/v={batch_id}"
                    )
                add.unpersist()
                _mark_committed(store_dir, batch_id)
            finally:
                accepted_ids.unpersist()
                sigs.unpersist()
        finally:
            batch.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_store(store_dir: str, keep: int = 2) -> dict[str, list[int]]:
    """Retention for a bucketed ingest store: vacuum each bucket's version
    chain down to its ``keep`` newest committed versions (delegates to
    snapshot.vacuum_versions per ``b=<k>`` dir). Every bucket rewrite
    carries the FULL bucket content, so old versions exist only for retry
    re-reads and time travel — without retention a hot bucket's storage
    grows with batch count, not corpus size.

    ``keep`` must be ≥ 2: a retried batch re-reads the version strictly
    below its own batch id, so the latest version's PARENT must survive
    vacuum (keep=1 could delete it while an uncommitted retry target is
    the latest — silent history loss for that bucket)."""
    from .snapshot import vacuum_versions

    if keep < 2:
        raise ValueError("keep must be >= 2 (retry re-reads the parent version)")
    removed: dict[str, list[int]] = {}
    if not os.path.isdir(store_dir):
        return removed
    for d in sorted(os.listdir(store_dir)):
        if d.startswith("b="):
            doomed = vacuum_versions(os.path.join(store_dir, d), keep=keep)
            if doomed:
                removed[d] = doomed
    return removed


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


def store_size(spark, store_dir: str) -> int:
    """Committed distinct-fingerprint count (the seen-set cardinality)."""
    last = _last_committed_batch(store_dir)
    if last is None:
        return 0
    total = 0
    for d in os.listdir(store_dir):
        if not d.startswith("b="):
            continue
        v = latest_version(f"{store_dir}/{d}", below=last + 1)
        if v is not None:
            total += spark.read.parquet(f"{store_dir}/{d}/v={v}").count()
    return total
