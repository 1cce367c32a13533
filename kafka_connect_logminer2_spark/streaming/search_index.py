"""Incrementally-maintained positional inverted index — the persisted,
continuously-growing form of functions/search.py's postings, with document
deletion. "The corpus ingests nightly; phrase search (verbatim-leakage
audits, boilerplate lookups) must see every committed batch without ever
rebuilding the index, and a removed document (dedup kill, takedown) must
leave the index without a rebuild."

Layout — the same append-only delta-chain contract as the ingest stores
(streaming/corpus_ingest.py, whose machinery this reuses directly):

* postings rows ``(h, doc_id, pos)`` bucketed by ``pmod(h, num_buckets)``
  land as ``b=<k>/v=<batch_id>`` delta segments — ONE partitioned write
  per batch, O(new postings) bytes, never O(index);
* doc tombstones are tiny ``(doc_id)`` segments under ``_tomb/v=<id>``
  (the ann_ingest deletion model): the read side anti-joins committed
  tombstones, :func:`compact_search_index` folds chains AND applies
  tombstones physically, after which they are dropped;
* ``_meta.json`` pins ``num_buckets`` — a resumed writer with a different
  bucket count would route term hashes to the wrong buckets and searches
  would silently miss; it raises instead;
* the batch-level commit marker gates visibility; retried batches
  overwrite their own segments byte-identically.

THE scale property (why bucket-by-term-hash): a phrase search reads ONLY
the buckets its terms hash into — |phrase| buckets of num_buckets,
pruned by construction before any Spark job runs. At a 10^12-posting
index with 1024 buckets, a 3-term phrase touches ≤0.3% of the index
regardless of corpus size; the subsequent candidate groupBy is bounded by
those terms' posting lists, exactly as in phrase_match_counts_indexed.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.search import phrase_match_counts_indexed, positional_postings
from .corpus_ingest import (
    _empty_rows,
    _ensure_meta,
    _note_row_schema,
    _row_ddl,
    _store_paths,
    _write_delta,
)
from .snapshot import _last_committed_batch, _mark_committed

# canonical postings row shape (positional_postings output) — the fallback
# row schema for a store whose FIRST committed batch was tombstone-only
# (delete_docs on a virgin dir records no segments and no _row_ddl)
_POSTINGS_DDL = "h bigint, doc_id bigint, pos int"


def index_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    text_col: str = "text",
    num_buckets: int = 16,
) -> None:
    """One index-maintenance step (public foreachBatch body): append the
    batch's postings as bucketed delta segments and commit."""
    _ensure_meta(index_dir, {"kind": "postings", "num_buckets": num_buckets})
    postings = positional_postings(batch, text_col).withColumn(
        "_b", F.pmod(F.col("h"), F.lit(num_buckets)).cast("int")
    )
    _note_row_schema(index_dir, _row_ddl(postings))
    _write_delta(postings, index_dir, batch_id)
    _mark_committed(index_dir, batch_id)


def write_search_index(
    doc_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
):
    """Stream of documents → continuously-maintained positional index.
    Returns the StreamingQuery. ``max_chain`` schedules in-line
    maintenance (see streaming/maintenance.py): compact once any bucket
    chain or the tombstone overlay exceeds the bound — read cost stays
    O(buckets · max_chain) segments on an unbounded stream; None leaves
    scheduling to an external sweep."""
    spark = doc_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        index_batch(
            spark, batch, batch_id, index_dir,
            text_col=text_col, num_buckets=num_buckets,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            # protect=batch_id: a replayed batch must find its own delta
            # and the pre-batch history intact (see compact_chains)
            maintain_store(spark, index_dir, max_chain=max_chain,
                           max_overlays=max_chain, protect=batch_id)

    writer = doc_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame, batch_id: int
) -> None:
    """Tombstone documents (dedup kill, takedown): their ids land as the
    tiny segment ``_tomb/v=<batch_id>``; every read from then on excludes
    them, and the next compaction removes their postings physically.
    O(deleted ids) — the index itself is not touched. ``batch_id`` must
    exceed the last committed batch (it advances the marker)."""
    last = _last_committed_batch(index_dir)
    if last is not None and batch_id <= last:
        raise ValueError(
            f"delete batch_id {batch_id} must exceed last committed {last}"
        )
    dst = os.path.join(index_dir, "_tomb", f"v={batch_id}")
    shutil.rmtree(dst, ignore_errors=True)
    doc_ids.select("doc_id").distinct().coalesce(1).write.mode(
        "overwrite"
    ).parquet(dst)
    _mark_committed(index_dir, batch_id)


def _committed_tombstones(
    spark: SparkSession, index_dir: str, below: int
) -> DataFrame | None:
    tdir = os.path.join(index_dir, "_tomb")
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
    return spark.read.parquet(*paths).select("doc_id").distinct()


def read_postings(
    spark: SparkSession, index_dir: str, buckets: list[int] | None = None
) -> DataFrame | None:
    """Committed postings (tombstoned docs excluded), optionally restricted
    to the given buckets — the pruned read the phrase path uses."""
    last = _last_committed_batch(index_dir)
    if last is None:
        return None
    # a fully-tombstoned bucket's fold segment is empty (just _SUCCESS) —
    # skip those, spark.read.parquet cannot infer a schema from them
    paths = [
        p
        for p in _store_paths(index_dir, buckets, below=last + 1)
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    if not paths:
        # committed but segmentless (tombstone-only history): the index
        # EXISTS and is empty — an empty typed postings frame, not None
        postings = _empty_rows(spark, index_dir)
        if postings is None:
            postings = spark.createDataFrame([], _POSTINGS_DDL)
        postings = postings.select("h", "doc_id", "pos")
    else:
        # no read-side distinct(): _committed_versions prunes versions
        # below a committed _FOLD segment, so a compaction crash can no
        # longer surface duplicate postings — the full extra shuffle of
        # the store's largest relation this read used to pay is gone
        postings = (
            spark.read.option("basePath", index_dir)
            .parquet(*paths)
            .select("h", "doc_id", "pos")
        )
    tomb = _committed_tombstones(spark, index_dir, below=last + 1)
    if tomb is not None:
        postings = postings.join(tomb, "doc_id", "left_anti")
    return postings


def search_phrase(
    spark: SparkSession, index_dir: str, phrase: list[str], num_buckets: int = 16
) -> DataFrame:
    """Phrase search over the persisted index, reading ONLY the buckets
    the phrase's term hashes land in (path-level pruning, before any job
    runs), then the one-exchange indexed phrase plan."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [t.lower() for t in phrase]
    hashes = (
        spark.range(1)
        .select([F.xxhash64(F.lit(t)).alias(f"h{i}") for i, t in enumerate(terms)])
        .collect()[0]
    )
    buckets = sorted({hashes[f"h{i}"] % num_buckets for i in range(len(terms))})
    postings = read_postings(spark, index_dir, buckets)
    if postings is None:
        return spark.createDataFrame([], "doc_id long, n_matches long")
    return phrase_match_counts_indexed(postings, phrase, spark=spark)


def compact_search_index(
    spark: SparkSession, index_dir: str, protect: int | None = None
) -> int | None:
    """Fold every bucket's delta chain to one segment at the last
    committed version, applying tombstones PHYSICALLY (the deleted docs'
    postings leave the index), then drop the consumed tombstone segments
    — the shared :func:`~..streaming.corpus_ingest.compact_chains`
    skeleton with a tombstone-anti-join fold. With tombstones pending,
    even single-segment chains rewrite (their dead postings must leave).
    Returns the fold version, or None for an empty index."""
    from .corpus_ingest import compact_chains
    from .snapshot import _read_meta

    last = _last_committed_batch(index_dir)
    if last is None:
        return None
    nb = (_read_meta(index_dir) or {}).get("num_buckets", 16)
    # with `protect` (in-line scheduling, see compact_chains) only
    # tombstones strictly below it are applied and consumed; postings a
    # possibly-replayed batch wrote at v>=protect are untouched, so its
    # retry stays byte-idempotent
    tomb = _committed_tombstones(
        spark, index_dir, below=(last + 1 if protect is None else protect)
    )

    def fold(df):
        df = df.distinct()
        return df if tomb is None else df.join(tomb, "doc_id", "left_anti")

    return compact_chains(
        spark,
        index_dir,
        F.pmod(F.col("h"), F.lit(nb)).cast("int"),
        fold=fold,
        force_single=tomb is not None,
        cleanup_dirs=("_tomb",),
        protect=protect,
    )
