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

Reference: no equivalent in the reference (its surface stops at CDC
envelopes); §2C web-curation surface composing q169/q170 with cdc17's
store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .corpus_ingest import ingest_batch_exact


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
) -> None:
    """One web-ingest step (public foreachBatch body): canonicalize,
    extract, floor, then the exact-ingest step keyed on ``canon``."""
    from ..functions.text import html_to_text, token_count, url_canonicalize

    b = batch.withColumn("canon", url_canonicalize(F.col(url_col)))
    b = b.withColumn("text", html_to_text(F.col(html_col))).drop(html_col)
    b = b.filter(token_count(F.col("text")) >= min_tokens)
    ingest_batch_exact(
        spark, b, batch_id, out_dir, store_dir,
        id_col=id_col, text_col="canon", num_buckets=num_buckets,
        bloom_bits=bloom_bits,
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
):
    """Stream of raw pages → ``out_dir/batch=<id>`` holding only the
    quality-passing FIRST crawl of each canonical URL, with the seen-set
    growing by delta segments (exactly-once, retry-idempotent — the
    write_dedup_ingest contract on a canon fingerprint). ``max_chain``
    self-schedules PROTECTED in-line compaction of the URL store."""

    def process(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_web(
            batch.sparkSession, batch, batch_id, out_dir, store_dir,
            id_col=id_col, url_col=url_col, html_col=html_col,
            min_tokens=min_tokens, num_buckets=num_buckets,
            bloom_bits=bloom_bits,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            maintain_store(
                batch.sparkSession, store_dir, max_chain=max_chain,
                protect=batch_id,
            )

    writer = page_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
