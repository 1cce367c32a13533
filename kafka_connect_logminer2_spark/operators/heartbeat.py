"""Heartbeat branch + run-manifest + status bookkeeping (A19-A21).

The reference routes rows from ``heartbeat.table`` down a side path: extract
``HEARTBEAT_TIME`` from the parsed data, record lag (SP2_UPD_LOGMINER_RECEIVED),
and re-topic to ``<topic>.<CONNECTOR>`` (LogMinerThread2.java:198-211,
OracleSqlUtils2.java:147-163). It also inserts a run-manifest row at start
(TM2_LOGMINER_OFFSET, OracleSqlUtils2.java:121-146) and flips a status row to
FAILED on errors (SP2_UPD_SERVER_STATUS, OracleSqlUtils2.java:164-178).

Spark shape: the heartbeat branch is a stream split (filter on TABLE_NAME);
lag metrics and run manifests are append-only parquet tables under a
``_meta`` directory; failure status comes from a StreamingQueryListener.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EngineConfig


def split_heartbeat(envelope: DataFrame, config: EngineConfig) -> tuple[DataFrame, DataFrame]:
    """Split the envelope stream into (data_rows, heartbeat_rows) — the
    reference's per-row branch at LogMinerThread2.java:198, as one predicate.

    Heartbeat rows get the reference's re-topic:
    ``row.topic + "." + upper(connector name)`` (:207).
    """
    if not config.heartbeat_table:
        return envelope, envelope.filter(F.lit(False))
    is_hb = F.col("TABLE_NAME") == F.lit(config.heartbeat_table)
    data = envelope.filter(~is_hb)
    hb = envelope.filter(is_hb).withColumn(
        "topic", F.concat_ws(".", F.col("topic"), F.lit(config.name.upper()))
    )
    return data, hb


def heartbeat_lag_metrics(hb: DataFrame) -> DataFrame:
    """updateLogminerReceived analog (OracleSqlUtils2.java:147-163): one row
    per heartbeat with {scn, heartbeat_time, received_time, lag_seconds}.

    ``HEARTBEAT_TIME`` is pulled from the parsed after-image JSON — no typed
    schema needed for the metrics path.
    """
    hb_time = F.get_json_object(F.col("data_json"), "$.HEARTBEAT_TIME").cast("timestamp_ntz")
    received = F.now().cast("timestamp_ntz")
    # timestamp_ntz has no direct double cast in Spark 4 — hop through ltz
    secs = lambda c: c.cast("timestamp").cast("double")
    return hb.select(
        F.col("CONNECTOR").alias("connector"),
        F.col("SCN").alias("scn"),
        hb_time.alias("heartbeat_time"),
        received.alias("received_time"),
        (secs(received) - secs(hb_time)).alias("lag_seconds"),
    )


def observe_rows(df, observation, scn_col: str = "scn"):
    """A27 analog (logRawMinerData, OracleSourceTask2.java:422-432): the
    reference logs every raw cursor column at DEBUG; the Spark-native shape
    is an ``observe`` metric set — per-(micro)batch row count and SCN range
    collected by the engine for free, no per-row logging in the hot path.
    Pass a ``pyspark.sql.Observation`` for batch or a string name for
    streaming (read via StreamingQueryProgress.observedMetrics)."""
    return df.observe(
        observation,
        F.count(F.lit(1)).alias("n_rows"),
        F.min(scn_col).alias("min_scn"),
        F.max(scn_col).alias("max_scn"),
    )


def write_run_manifest(
    spark: SparkSession, config: EngineConfig, meta_dir: str, start_scn: int | None = None
) -> None:
    """insertOffSet analog (A20): append one run row with the serialized
    config (the reference Jackson-serializes it, OracleSourceTask2.java:201-202)."""
    row = {
        "connector": config.name,
        "config_json": json.dumps(asdict(config)),
        "reset_offset": config.reset_offset,
        "start_scn": start_scn,
        "started_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "status": "RUNNING",
    }
    spark.createDataFrame([row]).write.mode("append").parquet(f"{meta_dir}/runs")


class StatusListener:
    """A21: flips run status on stream termination — the Spark-native stand-in
    for SP2_UPD_SERVER_STATUS. Register with spark.streams.addListener.

    Writes JSONL with plain file I/O: listener callbacks arrive on the py4j
    callback thread, where launching Spark jobs is unreliable (and the
    session may already be tearing down on FAILED — exactly when the status
    row matters most)."""

    def __init__(self, spark: SparkSession, config: EngineConfig, meta_dir: str):
        import os

        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                outer._append({"event": "STARTED", "query_id": str(event.id)})

            def onQueryProgress(self, event):
                pass

            def onQueryTerminated(self, event):
                status = "FAILED" if event.exception else "STOPPED"
                outer._append(
                    {
                        "event": status,
                        "query_id": str(event.id),
                        "error": str(event.exception) if event.exception else None,
                    }
                )

        self.spark = spark
        self.config = config
        self.meta_dir = meta_dir
        self.status_path = os.path.join(meta_dir, "status.jsonl")
        os.makedirs(meta_dir, exist_ok=True)
        self.listener = _L()

    def _append(self, row: dict) -> None:
        row = {
            "connector": self.config.name,
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
            **row,
        }
        with open(self.status_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def register(self) -> None:
        self.spark.streams.addListener(self.listener)

    def unregister(self) -> None:
        self.spark.streams.removeListener(self.listener)
