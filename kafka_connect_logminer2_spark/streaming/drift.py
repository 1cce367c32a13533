"""Streaming corpus drift monitor — per-micro-batch token-distribution
divergence against a reference histogram. The ingest-health gate a
production corpus pipeline runs continuously: a crawler change, an
encoding bug, or a source mix shift shows up as a KL spike long before
any downstream quality metric moves.

Design for scale:
- The distribution lives in a FIXED number of hashed buckets (B), so the
  monitor's state is B rows regardless of corpus or vocabulary size —
  the same bounded-sketch discipline as DSIR's hashed features (q130).
  Bucketing uses the engine-portable md5_bucket because the hash IS the
  semantics (the oracle must land tokens in the same buckets).
- Per batch: one explode + one B-bucket partial-aggregated groupBy; the
  reference histogram (B rows) rides a broadcast join; the KL reduction
  is a scalar aggregate. Nothing vocabulary-sized exists anywhere.
- Each batch appends one metrics row as ``v=<batch_id>`` (the versioned
  retry-idempotent layout shared with every other streaming state here):
  a retried batch overwrites its own row, and readers see only
  committed versions.

KL definition (pinned so the oracle can reproduce it exactly):
p = batch bucket distribution, q = reference bucket distribution, both
add-1 smoothed over the B buckets: p_b = (c_b + 1)/(n + B). KL(p‖q) =
Σ_b p_b · ln(p_b/q_b) over ALL B buckets (empty buckets contribute via
smoothing — that is what makes the sum finite and the oracle a closed
SQL expression over the bucket union).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.sharding import md5_bucket


def token_histogram(docs: DataFrame, n_buckets: int, text_col: str = "text") -> DataFrame:
    """(bucket, c) counts of whitespace tokens hashed into ``n_buckets``
    md5 buckets — B-row result at any corpus size."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
        )
        .select(md5_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def kl_to_reference(
    batch_hist: DataFrame, ref_hist: DataFrame, n_buckets: int
) -> DataFrame:
    """One-row (n_tokens, kl) from two (bucket, c) histograms, add-1
    smoothed over the full bucket range. The bucket union is built from a
    range frame so buckets absent from BOTH histograms still contribute
    their smoothing mass — the oracle does the same."""
    spark = batch_hist.sparkSession
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    j = (
        grid.join(F.broadcast(batch_hist.withColumnRenamed("c", "cb")), "bucket", "left")
        .join(F.broadcast(ref_hist.withColumnRenamed("c", "cr")), "bucket", "left")
        .na.fill({"cb": 0, "cr": 0})
    )
    totals = j.agg(F.sum("cb").alias("nb"), F.sum("cr").alias("nr"))
    jj = j.join(F.broadcast(totals))
    p = (F.col("cb") + 1) / (F.col("nb") + n_buckets)
    q = (F.col("cr") + 1) / (F.col("nr") + n_buckets)
    return jj.agg(
        F.first("nb").cast("long").alias("n_tokens"),
        F.sum(p * F.log(p / q)).alias("kl"),
    )


def write_drift_monitor(
    doc_stream: DataFrame,
    ref_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 1024,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Monitor a document stream's token distribution against
    ``ref_docs``: per micro-batch, append (batch_id, n_docs, n_tokens,
    kl) as a versioned one-row segment. The reference histogram is
    computed ONCE at stream start (B rows, localCheckpoint) — the stream
    never re-reads the reference corpus."""
    spark = doc_stream.sparkSession
    ref_hist = token_histogram(ref_docs, n_buckets, text_col).localCheckpoint()

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            n_docs = batch.count()
            if n_docs == 0:
                return
            hist = token_histogram(batch, n_buckets, text_col)
            row = kl_to_reference(hist, ref_hist, n_buckets).select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.lit(n_docs).cast("long").alias("n_docs"),
                "n_tokens",
                "kl",
            )
            row.write.mode("overwrite").parquet(f"{out_dir}/v={batch_id}")
        finally:
            batch.unpersist()

    writer = doc_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_drift_metrics(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """All committed per-batch metric rows, batch order."""
    if not os.path.isdir(out_dir):
        return None
    versions = [d for d in sorted(os.listdir(out_dir)) if d.startswith("v=")]
    if not versions:
        return None
    return spark.read.option("basePath", out_dir).parquet(
        *[f"{out_dir}/{v}" for v in versions]
    ).drop("v").orderBy("batch_id")
