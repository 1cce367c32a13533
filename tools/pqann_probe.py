"""Maintained IVF-PQ store scale probe (cdc43 family, r12): how does the
per-batch maintenance cost grow with the resident index size?

For m in (1, 4, 10): seed the store with m×BASE synthetic vectors as
batch 0 (deterministic JVM-side hash vectors — no driver materialization),
then time ONE fixed mixed changelog batch — 500 novel inserts + 300
updates + 200 deletes — through the full ``ingest_batch_pqann`` body
(in-batch dedup check, tombstone discovery against the committed history,
packed encode, versioned write, commit marker).

What the layout predicts (stated honestly, then measured): the encode,
write, and dedup-check are O(batch); the tombstone-discovery step is a
COLUMN-PRUNED scan of committed segments — (id, _cell, v) only, never the
code payload — semi-joined to the touched ids, so its cost grows with
history SIZE but on ~3 narrow columns, and compaction bounds the segment
COUNT. The probe records the actual curve; a steep super-linear slope
would mean the pruning is not landing.

Usage: python tools/pqann_probe.py [BASE]      # default 20000 vectors
Prints one JSON line per m — BASELINE.md records them.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.streaming.ann_ingest import (  # noqa: E402
    read_ann_index,
)
from kafka_connect_logminer2_spark.streaming.pq_ann_ingest import (  # noqa: E402
    ingest_batch_pqann,
)

DIM = 64


def _vecs(spark, lo: int, n: int):
    """Deterministic synthetic vectors, built JVM-side: component j of id
    i is a hash-uniform value in [-0.5, 0.5) — no driver materialization,
    reproducible across runs."""
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(100000)) / 100000.0
                - 0.5
            ).cast("float"),
        ).alias("embedding"),
    )


def main(base: int) -> None:
    spark = get_spark(
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for m in (1, 4, 10):
        n = base * m
        tmp = tempfile.mkdtemp(prefix="pqprobe_")
        try:
            idx = f"{tmp}/index"
            seed = _vecs(spark, 0, n).selectExpr(
                "'I' as op", "vec_id", "embedding"
            )
            t0 = time.time()
            ingest_batch_pqann(
                spark, seed, 0, idx, n_centroids=64, m=32, n_codes=16
            )
            seed_s = time.time() - t0

            change = (
                _vecs(spark, n, 500)  # novel inserts
                .selectExpr("'I' as op", "vec_id", "embedding")
                .unionByName(
                    _vecs(spark, 1000, 300)  # updates: new vectors for old ids
                    .selectExpr("'U' as op", "vec_id", "embedding")
                )
                .unionByName(
                    spark.range(2000, 2200).selectExpr(
                        "'D' as op",
                        "id as vec_id",
                        "cast(null as array<float>) as embedding",
                    )
                )
            )
            t0 = time.time()
            ingest_batch_pqann(
                spark, change, 1, idx, n_centroids=64, m=32, n_codes=16
            )
            batch_s = time.time() - t0
            live = read_ann_index(spark, idx).count()
            print(json.dumps({
                "m": m, "history": n, "seed_sec": round(seed_s, 1),
                "change_batch_sec": round(batch_s, 1),
                "live_after": live,
                "live_expected": n + 500 - 200,
            }), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
