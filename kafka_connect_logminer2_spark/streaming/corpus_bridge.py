"""CDC → corpus bridge: a database table's CDC feed maintained as corpus
membership — the junction the engine's two halves (cdc01-15 CDC dataflow;
cdc17+ corpus ingest) meet at (r9 verdict #6).

"The documents live in an OLTP table; the training corpus must track it:
an inserted doc enters the corpus front door (normalize → quality floor →
exact dedup), an updated doc's OLD content leaves membership and its NEW
content re-enters the door, and a DELETED doc's content leaves the dedup
store's accept set going forward — re-crawled or re-inserted content that
matches a deleted doc is novel again."

Composition — every stage is an existing component, wired per batch:

1. **Snapshot materialization** (:func:`~.snapshot._merge_one_table`):
   the envelope batch nets to one change per key and merges into the
   versioned snapshot — exactly ``write_snapshot``'s kernel, so the
   bridge's view of "what changed" is the snapshot's own change feed;
2. **Change feed** (:func:`~.snapshot.diff_states` on the batch's touched
   keys, with before-images) — O(changed keys), never O(table);
3. **Removals first**: DELETE rows' and UPDATE rows' BEFORE-image text →
   :func:`~.corpus_ingest.remove_batch_exact` — fingerprint tombstones,
   OWNER-CHECKED (deleting a row whose text is represented in the corpus
   by a different, still-live owner must not free membership — dedup
   refcounts are 1 by construction, the owner is the accepted row);
4. **Adds through the front door**: INSERT rows' and UPDATE rows'
   AFTER-image text → optional normalization → token floor →
   :func:`~.corpus_ingest.ingest_batch_exact` with
   ``store_owner_ids=True`` (the owner check's data) and the
   tombstone-aware probe (a same-batch delete+insert of one text nets to
   membership; the removal landed first).

Crash story: the store commit marker is written by the ADD step, last;
a crash after the removal but before the add leaves the batch's tombstone
segment present but the streaming batch un-checkpointed — the replay
overwrites both its tombstone and its delta byte-identically (both are
``v=<batch_id>``-keyed overwrites). Scale: every stage is touched-bucket
/ touched-key bounded; the snapshot merge is O(changed keys), the
tombstone write O(deleted rows), the probe O(batch ∩ touched buckets).

Reference: no single equivalent — the reference emits Kafka envelopes and
leaves consumption to sinks; this is the §2C training-data consumer the
engine's corpus half implies, driven end-to-end by cdc39.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EngineConfig
from ..operators.schema_registry import SchemaRegistry
from .corpus_ingest import ingest_batch_exact, remove_batch_exact
from .snapshot import _merge_one_table, diff_states, latest_version


def bridge_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    registry: SchemaRegistry,
    owner: str,
    table: str,
    pk_col: str,
    snap_dir: str,
    out_dir: str,
    store_dir: str,
    text_col: str = "TEXT",
    min_tokens: int = 1,
    normalize: bool = False,
    num_buckets: int = 16,
    config: EngineConfig | None = None,
    content_neardup: bool = False,
    near_threshold: float = 0.5,
    near_k: int = 3,
) -> None:
    """One bridge step (public foreachBatch body): envelope batch →
    snapshot merge → change feed → remove-then-ingest. See module
    docstring for the stage contract.

    ``content_neardup`` (cdc41) chains the banded MinHash near store
    behind the exact gate (the web_ingest tier layout: ``<store>/exact``
    + ``<store>/near``, exact survivors staged then near-ingested into
    the final ``out_dir``; the near marker commits last and gates
    visibility). Removals then tombstone BOTH tiers: the old text's
    fingerprint (owner-checked) and the doc id's banded signatures —
    version-aware on both, so an UPDATE's re-added signatures under the
    same id stay live."""
    import os

    from ..functions.text import normalize_text, token_count

    parent, keys = _merge_one_table(
        spark, batch, batch_id, registry, owner, table, [pk_col], snap_dir,
        config,
    )
    if keys is None:
        # nothing for this table in the batch (or schema unavailable):
        # snapshot version unchanged, corpus membership unchanged
        return
    exact_store = (
        os.path.join(store_dir, "exact") if content_neardup else store_dir
    )
    new = spark.read.parquet(f"{snap_dir}/v={batch_id}").join(
        F.broadcast(keys), [pk_col], "left_semi"
    )
    prev = (
        None
        if parent is None
        else spark.read.parquet(f"{snap_dir}/v={parent}").join(
            F.broadcast(keys), [pk_col], "left_semi"
        )
    )
    cdf = diff_states(prev, new, [pk_col], include_before=True).persist()
    try:
        removals = cdf.filter(
            F.col("change_type").isin("DELETE", "UPDATE")
        ).select(
            F.col(pk_col).cast("long").alias("doc_id"),
            F.col(f"{text_col}_before").alias("text"),
        )
        remove_batch_exact(spark, removals, batch_id, exact_store)
        if content_neardup:
            from .corpus_ingest import remove_batch_neardup

            remove_batch_neardup(
                spark, removals.select("doc_id"), batch_id,
                os.path.join(store_dir, "near"),
            )
        adds = cdf.filter(
            F.col("change_type").isin("INSERT", "UPDATE")
        ).select(
            F.col(pk_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        if normalize:
            adds = adds.withColumn("text", normalize_text(F.col("text")))
        adds = adds.filter(token_count(F.col("text")) >= min_tokens)
        if not content_neardup:
            ingest_batch_exact(
                spark, adds, batch_id, out_dir, store_dir,
                num_buckets=num_buckets, store_owner_ids=True,
            )
        else:
            from .corpus_ingest import ingest_batch_neardup

            stage_dir = out_dir.rstrip("/") + "_exactgate"
            ingest_batch_exact(
                spark, adds, batch_id, stage_dir, exact_store,
                num_buckets=num_buckets, store_owner_ids=True,
            )
            survivors = spark.read.parquet(f"{stage_dir}/batch={batch_id}")
            ingest_batch_neardup(
                spark, survivors, batch_id, out_dir,
                os.path.join(store_dir, "near"),
                k=near_k, threshold=near_threshold,
                num_buckets=num_buckets,
            )
            # staging copy consumed once the near tier commits; drop it so
            # a long-running stream doesn't accumulate an uncommitted
            # shadow of accepted output (r10 advice). Replay-safe: a
            # retried batch rewrites batch=<id> before re-reading.
            import shutil

            shutil.rmtree(f"{stage_dir}/batch={batch_id}", ignore_errors=True)
    finally:
        cdf.unpersist()


def write_cdc_corpus_bridge(
    envelope_stream: DataFrame,
    registry: SchemaRegistry,
    owner: str,
    table: str,
    pk_col: str,
    snap_dir: str,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "TEXT",
    min_tokens: int = 1,
    normalize: bool = False,
    num_buckets: int = 16,
    max_chain: int | None = 64,
    config: EngineConfig | None = None,
    trigger_available_now: bool = True,
    content_neardup: bool = False,
    near_threshold: float = 0.5,
    near_k: int = 3,
):
    """Maintain BOTH the table snapshot and the corpus accept-set implied
    by a CDC envelope stream (module docstring). Returns the
    StreamingQuery. ``out_dir/batch=<id>`` holds each batch's newly
    accepted (doc_id, text) rows — read them with
    :func:`~.corpus_ingest.read_ingested` gated on the store's marker
    (``<store>/near`` when ``content_neardup``, its marker commits
    last)."""
    import os

    spark = envelope_stream.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        bridge_batch(
            spark, batch, batch_id, registry, owner, table, pk_col,
            snap_dir, out_dir, store_dir,
            text_col=text_col, min_tokens=min_tokens, normalize=normalize,
            num_buckets=num_buckets, config=config,
            content_neardup=content_neardup,
            near_threshold=near_threshold, near_k=near_k,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            dirs = (
                [os.path.join(store_dir, "exact"),
                 os.path.join(store_dir, "near")]
                if content_neardup
                else [store_dir]
            )
            for d in dirs:
                maintain_store(spark, d, max_chain=max_chain,
                               max_overlays=max_chain, protect=batch_id)

    writer = envelope_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def corpus_members(
    spark: SparkSession, store_dir: str, out_dir: str
) -> DataFrame | None:
    """The CURRENT corpus accept-set: accepted rows whose fingerprint is
    still live (not tombstoned by a later delete/update) AND who are that
    fingerprint's CURRENT owner — so a text deleted and later re-accepted
    under a new id contributes exactly its newest accepted row, never the
    dead one. One bounded read of the store's committed chains + tomb
    overlay; without tombstones this is just the accepted output."""
    from .corpus_ingest import (
        _committed_tombs,
        _live_fps,
        _store_paths,
        _with_seg_version,
        read_ingested,
    )
    from .snapshot import _last_committed_batch

    acc = read_ingested(spark, out_dir, store_dir=store_dir)
    if acc is None:
        return None
    last = _last_committed_batch(store_dir)
    tomb = _committed_tombs(spark, store_dir, below=last + 1)
    if tomb is None:
        return acc
    paths = _store_paths(store_dir, None, below=last + 1)
    if not paths:
        return acc
    seen = spark.read.parquet(*paths)
    live = _live_fps(spark, store_dir, seen, tomb_below=last + 1)
    # current owner per live fp = the newest add's id (ties impossible:
    # one add per fp per batch by the first-occurrence rule)
    owners = (
        _with_seg_version(seen)
        .groupBy("fp")
        .agg(F.max_by("id", "_v").alias("_oid"))
        .join(live, "fp", "left_semi")
    )
    fp = F.unhex(F.md5(F.coalesce(F.col("text"), F.lit(""))))
    return (
        acc.withColumn("_fp", fp)
        .join(owners.select(F.col("fp").alias("_fp"), "_oid"), "_fp")
        .filter(F.col("doc_id") == F.col("_oid"))
        .drop("_fp", "_oid")
    )
