"""Streaming WEB ingest — the CommonCrawl-shaped front door, composed
from this round's web-prep operators and the exact-dedup ingest store:

    raw (url, html) batch
      → URL canonicalization        (functions/text.py::url_canonicalize)
      → HTML → text extraction      (functions/text.py::html_to_text)
      → token-count quality floor
      → history-wide EXACT dedup BY CANONICAL URL
        (corpus_ingest.ingest_batch_exact keyed on the canon column —
         the same fingerprint store, Bloom sidecar included, so one page
         crawled twice under casing/utm/port variants lands once)

Order is deliberate: extraction+floor run BEFORE the dedup probe, so
junk pages never cost a store write; canonicalization runs before both
(it is what makes two raw variants one fingerprint). Per-batch store
cost is the cdc17 contract — O(new canonical URLs), never O(history) —
and the accepted output carries the full row (id, url, canon, extracted
text), the shape downstream corpus stages consume.

CONTENT NEAR-DUP TIER (r9 verdict #5, ``content_neardup=True``): URL
dedup alone misses the second face of crawl duplication — the same
article republished under a DIFFERENT canonical URL in different
boilerplate. The tier chains cdc18's banded-MinHash-signature store
BEHIND the URL gate: URL-gate survivors land in a ``<out>_urlgate``
staging dir, then run :func:`~.corpus_ingest.ingest_batch_neardup` on
their EXTRACTED text into the final ``out_dir``. Store layout forks on
the flag (backward compatible): flat exact store without the tier,
``<store>/url`` (exact, canon-keyed) + ``<store>/near`` (banded
signatures, text-keyed) with it. Probe cost stays the two stores'
own contracts — touched canon-fingerprint buckets + touched band-key
buckets, never O(history). Crash story: the near store's commit marker
is written last and gates visibility (read accepted output with
``store_dir=<store>/near``); a crash between the two tiers leaves the
batch invisible and the retry overwrites both tiers' segments.

Reference: no equivalent in the reference (its surface stops at CDC
envelopes); §2C web-curation surface composing q169/q170 with cdc17's
store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .corpus_ingest import ingest_batch_exact, ingest_batch_neardup


def ingest_batch_web(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    min_tokens: int = 1,
    num_buckets: int = 16,
    bloom_bits: int | None = None,
    content_neardup: bool = False,
    near_k: int = 3,
    near_num_hashes: int = 16,
    near_num_bands: int = 4,
    near_threshold: float = 0.5,
    near_seed: int = 42,
    op_col: str | None = None,
) -> None:
    """One web-ingest step (public foreachBatch body): canonicalize,
    extract, floor, then the exact-ingest step keyed on ``canon``; with
    ``content_neardup``, URL-gate survivors additionally run the banded
    MinHash near-dup ingest on their EXTRACTED text (module docstring) —
    a same-article-different-URL republication is rejected there.

    ``op_col`` (cdc40): rows whose ``op_col`` equals ``'takedown'`` are
    REMOVAL control rows riding the same stream (doc_id + url suffice);
    they tombstone first, then the batch's page rows ingest — one
    sequencing authority, so tombstone versions always interleave
    correctly with the stream's own batch ids (a taken-down page and its
    re-crawl can even share a batch: removals run first)."""
    from ..functions.text import html_to_text, token_count, url_canonicalize

    if op_col is not None and op_col in batch.columns:
        takedowns = batch.filter(F.col(op_col) == "takedown")
        if takedowns.take(1):  # skip the tombstone write for pure-page batches
            takedown_batch_web(
                spark, takedowns, batch_id, store_dir,
                id_col=id_col, url_col=url_col,
                content_neardup=content_neardup,
            )
        batch = batch.filter(
            F.col(op_col).isNull() | (F.col(op_col) != "takedown")
        ).drop(op_col)

    b = batch.withColumn("canon", url_canonicalize(F.col(url_col)))
    b = b.withColumn("text", html_to_text(F.col(html_col))).drop(html_col)
    b = b.filter(token_count(F.col("text")) >= min_tokens)
    if not content_neardup:
        ingest_batch_exact(
            spark, b, batch_id, out_dir, store_dir,
            id_col=id_col, text_col="canon", num_buckets=num_buckets,
            bloom_bits=bloom_bits,
        )
        return
    stage_dir = out_dir.rstrip("/") + "_urlgate"
    ingest_batch_exact(
        spark, b, batch_id, stage_dir, os.path.join(store_dir, "url"),
        id_col=id_col, text_col="canon", num_buckets=num_buckets,
        bloom_bits=bloom_bits,
    )
    url_accepted = spark.read.parquet(f"{stage_dir}/batch={batch_id}")
    ingest_batch_neardup(
        spark, url_accepted, batch_id, out_dir, os.path.join(store_dir, "near"),
        id_col=id_col, text_col="text", k=near_k,
        num_hashes=near_num_hashes, num_bands=near_num_bands,
        seed=near_seed, threshold=near_threshold, num_buckets=num_buckets,
    )
    # the staging copy is consumed the moment the near tier commits —
    # dropping it here keeps a long-running stream from accumulating an
    # unbounded, uncommitted shadow of accepted output (r10 advice).
    # Replay-safe: a retried batch rewrites batch=<id> before re-reading.
    import shutil

    shutil.rmtree(f"{stage_dir}/batch={batch_id}", ignore_errors=True)


def takedown_batch_web(
    spark: SparkSession,
    pages: DataFrame,
    batch_id: int,
    store_dir: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    content_neardup: bool = False,
) -> None:
    """Take down accepted pages (legal removal, curation kill — cdc40):
    the page's canonical-URL fingerprint leaves the URL store's accept
    set AND (with the tier) its content signatures leave the near store,
    so a future re-crawl of the same URL or a republication of the same
    content is ingestible again. ``pages``: (doc_id, url) of rows from
    the ACCEPTED output — doc_id drives the near-store id tombstone, the
    canonicalized url drives the URL-fingerprint tombstone (the URL
    store is keyed on ``canon``; owner is implicit — the first-crawl
    rule stores one fp per canon).

    SEQUENCING: a tombstone's version must interleave correctly with the
    add versions it kills (live iff newest add >= newest tombstone), so
    for a LIVE stream ride the stream itself — ``write_web_ingest(
    op_col=...)`` routes 'takedown' control rows here with the batch's
    own id. Call this directly only from batch pipelines that control
    batch ids explicitly; an out-of-band id far above the stream's
    counter would out-version every future re-crawl."""
    from ..functions.text import url_canonicalize

    from .corpus_ingest import remove_batch_exact, remove_batch_neardup

    canon = pages.select(
        F.col(id_col).alias("doc_id"),
        url_canonicalize(F.col(url_col)).alias("text"),
    )
    if not content_neardup:
        remove_batch_exact(spark, canon, batch_id, store_dir)
        return
    remove_batch_exact(spark, canon, batch_id, os.path.join(store_dir, "url"))
    remove_batch_neardup(
        spark, pages.select(id_col), batch_id,
        os.path.join(store_dir, "near"), id_col=id_col,
    )


def write_web_ingest(
    page_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    min_tokens: int = 1,
    num_buckets: int = 16,
    bloom_bits: int | None = None,
    max_chain: int | None = 64,
    trigger_available_now: bool = True,
    content_neardup: bool = False,
    near_k: int = 3,
    near_num_hashes: int = 16,
    near_num_bands: int = 4,
    near_threshold: float = 0.5,
    near_seed: int = 42,
    op_col: str | None = None,
):
    """Stream of raw pages → ``out_dir/batch=<id>`` holding only the
    quality-passing FIRST crawl of each canonical URL, with the seen-set
    growing by delta segments (exactly-once, retry-idempotent — the
    write_dedup_ingest contract on a canon fingerprint). With
    ``content_neardup``, the output further excludes republished
    near-duplicate CONTENT (cdc38; read accepted batches with
    ``store_dir=<store>/near`` — its marker commits last). With
    ``op_col``, 'takedown' control rows in the stream free their page's
    URL fingerprint and content signatures for future re-ingest (cdc40).
    ``max_chain`` self-schedules PROTECTED in-line compaction of every
    tier's store."""

    def process(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_web(
            batch.sparkSession, batch, batch_id, out_dir, store_dir,
            id_col=id_col, url_col=url_col, html_col=html_col,
            min_tokens=min_tokens, num_buckets=num_buckets,
            bloom_bits=bloom_bits, content_neardup=content_neardup,
            near_k=near_k, near_num_hashes=near_num_hashes,
            near_num_bands=near_num_bands, near_threshold=near_threshold,
            near_seed=near_seed, op_col=op_col,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            dirs = (
                [os.path.join(store_dir, "url"), os.path.join(store_dir, "near")]
                if content_neardup
                else [store_dir]
            )
            for d in dirs:
                maintain_store(
                    batch.sparkSession, d, max_chain=max_chain,
                    protect=batch_id,
                )

    writer = page_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
