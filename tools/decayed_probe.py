"""Decayed-counter MV cost probe: is the per-batch store write O(batch),
independent of the resident key population?

For m in (1, 4, 10): seed a store with m×BASE distinct keys, then fold ONE
fixed-size batch (touching a fixed key subset) and record wall-seconds and
the BYTES that batch's delta segments added. The delta-chain claim is this
curve: batch seconds and delta bytes stay FLAT as the key population grows
10× (the r5 design rewrote the full O(keys) table per batch — its bytes
column would be ∝ m). One JSON line per m; BASELINE.md records them.

Usage: python tools/decayed_probe.py            # BASE=100_000 keys
       python tools/decayed_probe.py 20000      # smaller base
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.streaming.decayed import (  # noqa: E402
    decayed_batch_step,
)

MULTIPLIERS = (1, 4, 10)
BATCH_EVENTS = 10_000
BATCH_KEYS = 2_000


def _delta_bytes(store: str, batch_id: int) -> int:
    total = 0
    for b in os.listdir(store):
        vdir = os.path.join(store, b, f"v={batch_id}")
        if os.path.isdir(vdir):
            for f in os.listdir(vdir):
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(vdir, f))
    return total


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(
        app_name="decayed_probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for m in MULTIPLIERS:
        tmp = tempfile.mkdtemp(prefix="decayed_probe_")
        try:
            store = os.path.join(tmp, "state")
            n_keys = m * base
            seed = spark.range(n_keys).select(
                F.col("id").alias("user_id"),
                F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
                F.lit(1.0).alias("value"),
            )
            decayed_batch_step(spark, seed, 0, store)
            batch = spark.range(BATCH_EVENTS).select(
                F.pmod(F.col("id"), F.lit(BATCH_KEYS)).alias("user_id"),
                F.lit("2024-01-02 00:00:00").cast("timestamp").alias("ts"),
                F.lit(2.0).alias("value"),
            )
            t0 = time.time()
            decayed_batch_step(spark, batch, 1, store)
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "probe": "decayed_batch",
                        "key_population": n_keys,
                        "batch_events": BATCH_EVENTS,
                        "batch_keys": BATCH_KEYS,
                        "sec": round(dt, 2),
                        "delta_bytes": _delta_bytes(store, 1),
                    }
                )
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
