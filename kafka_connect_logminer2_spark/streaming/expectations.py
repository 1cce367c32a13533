"""Streaming data-quality gate — the one-pass expectation suite
(functions/expectations.py) run per micro-batch, with batch-level
quarantine: a landing batch either passes EVERY check and becomes
visible, or is diverted whole to a quarantine area with its failing
report. The Deequ "verification result gates the load" pattern, run
continuously at the ingest edge.

Why batch-granular (not row-granular): the checks are DISTRIBUTIONAL
(completeness rate, uniqueness ratio, bounds over the batch) — a failing
metric indicts the batch as a unit (a broken crawler run, a schema-drifted
export), and row-level salvage from a batch with, say, 40% null texts is
exactly the corruption a quality gate exists to stop. Row-granular
filtering belongs to the corpus pipeline's clean stage (q47/q119), not
the gate.

Scale/correctness shape:
- per batch: ONE aggregation pass for all metrics (see
  functions/expectations.py) + the verdict — a collect of N_check rows,
  O(checks), never O(rows);
- the report lands as a versioned one-segment-per-batch parquet
  (``metrics_dir/v=<batch_id>``, the drift-monitor layout): retried
  batches overwrite their own report idempotently;
- accepted rows land under ``out_dir/batch=<id>``, quarantined rows
  under ``quarantine_dir/batch=<id>`` — both written BEFORE the report
  segment, so a report's existence implies its batch's rows are fully
  on disk (the report is the commit marker).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.expectations import Check, expectation_report


def write_expectation_gate(
    doc_stream: DataFrame,
    checks: list[Check],
    out_dir: str,
    quarantine_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Gate a document stream on the expectation suite: per micro-batch,
    evaluate ``checks`` in one aggregation pass; if all pass, the batch's
    rows land in ``out_dir/batch=<id>``; otherwise they land in
    ``quarantine_dir/batch=<id>``. Either way the per-check report (with
    ``batch_id`` and an ``accepted`` verdict column) is appended as the
    versioned segment ``metrics_dir/v=<batch_id>``. Returns the
    StreamingQuery."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            if batch.isEmpty():
                return
            report = expectation_report(batch, checks).collect()
            ok = all(r["passed"] for r in report)
            dest = out_dir if ok else quarantine_dir
            batch.write.mode("overwrite").parquet(f"{dest}/batch={batch_id}")
            spark = batch.sparkSession
            (
                spark.createDataFrame(report)
                .select(
                    F.lit(batch_id).cast("long").alias("batch_id"),
                    "check_name",
                    "metric",
                    "passed",
                    F.lit(ok).alias("accepted"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{metrics_dir}/v={batch_id}")
            )
        finally:
            batch.unpersist()

    writer = doc_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_gate_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame | None:
    """All committed per-batch check reports, batch order."""
    if not os.path.isdir(metrics_dir):
        return None
    versions = [d for d in sorted(os.listdir(metrics_dir)) if d.startswith("v=")]
    if not versions:
        return None
    return (
        spark.read.option("basePath", metrics_dir)
        .parquet(*[f"{metrics_dir}/{v}" for v in versions])
        .drop("v")
        .orderBy("batch_id", "check_name")
    )


def read_gated(
    spark: SparkSession, data_dir: str, metrics_dir: str
) -> DataFrame | None:
    """Rows of every batch whose report segment is committed (the report
    is the commit marker — a crash between the data write and the report
    write leaves the batch invisible until its retry), with the ``batch``
    partition column."""
    if not (os.path.isdir(data_dir) and os.path.isdir(metrics_dir)):
        return None
    committed = {
        int(d.split("=", 1)[1])
        for d in os.listdir(metrics_dir)
        if d.startswith("v=")
    }
    dirs = [
        d
        for d in os.listdir(data_dir)
        if d.startswith("batch=") and int(d.split("=", 1)[1]) in committed
    ]
    if not dirs:
        return None
    return spark.read.option("basePath", data_dir).parquet(
        *[f"{data_dir}/{d}" for d in dirs]
    )
