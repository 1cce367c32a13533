"""CDC→corpus bridge scale probe (cdc39/cdc41 families, r10 verdict #5):
is the per-batch bridge step O(changed keys), independent of the resident
TABLE and CORPUS size?

For m in (1, 4, 10): seed the bridge state by pushing m×BASE document
INSERT transactions through the REAL bridge step (snapshot merge + exact
ingest with owner ids) as batch 0, then time ONE fixed mixed change
batch — 300 updates + 200 deletes + 500 novel inserts, all as parsed
envelope rows through the full ``bridge_batch`` body (snapshot
merge-on-touched-keys, change feed with before-images, owner-checked
fingerprint tombstones, front-door ingest). The O(changed keys) claim is
the curve: batch-1 seconds FLAT as the table/corpus grows 10×.

Usage: python tools/bridge_probe.py [BASE]       # default 10000 docs
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

from kafka_connect_logminer2_spark.plans.cdc import (  # noqa: E402
    default_config,
    documents_registry,
)
from kafka_connect_logminer2_spark.plans.cdc import cdc_envelope  # noqa: E402
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.sources.redo import (  # noqa: E402
    redo_documents_dml,
)
from kafka_connect_logminer2_spark.streaming.corpus_bridge import (  # noqa: E402
    bridge_batch,
)

WORDS = 30


def _docs(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(WORDS - 1)),
                lambda j: F.concat(F.lit("d"), F.col("id"), F.lit("_"),
                                   j.cast("string")),
            ),
        ).alias("text"),
        F.lit("probe").alias("source"),
    )


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark(app_name="bridge_probe", extra_conf={
        "spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    cfg = default_config()
    for m in (1, 4, 10):
        n = base * m
        tmp = tempfile.mkdtemp(prefix=f"bridge{m}_")
        try:
            reg = documents_registry()
            seed_env = cdc_envelope(
                redo_documents_dml(_docs(spark, n), "INSERT", 10_000_000, "90"),
                cfg,
            ).localCheckpoint()
            t0 = time.time()
            bridge_batch(
                spark, seed_env, 0, reg, "TPCH", "DOCUMENTS", "DOC_ID",
                f"{tmp}/snap", f"{tmp}/out", f"{tmp}/store",
                min_tokens=5, config=cfg,
            )
            seed_sec = time.time() - t0
            # fixed change batch: 300 updates, 200 deletes, 500 novel inserts
            upd = redo_documents_dml(
                _docs(spark, 300, offset=0).withColumn(
                    "new_text", F.concat(F.col("text"), F.lit(" v2"))
                ),
                "UPDATE", 20_000_000, "91",
            )
            dele = redo_documents_dml(
                _docs(spark, 200, offset=500), "DELETE", 21_000_000, "92"
            )
            ins = redo_documents_dml(
                _docs(spark, 500, offset=50_000_000), "INSERT",
                22_000_000, "93",
            )
            change_env = cdc_envelope(
                upd.unionByName(dele).unionByName(ins), cfg
            ).localCheckpoint()
            t0 = time.time()
            bridge_batch(
                spark, change_env, 1, reg, "TPCH", "DOCUMENTS", "DOC_ID",
                f"{tmp}/snap", f"{tmp}/out", f"{tmp}/store",
                min_tokens=5, config=cfg,
            )
            change_sec = time.time() - t0
            accepted = spark.read.parquet(f"{tmp}/out/batch=1").count()
            print(json.dumps({
                "m": m, "seed_docs": n, "seed_sec": round(seed_sec, 2),
                "change_batch_sec": round(change_sec, 2),
                "accepted_batch1": accepted,
            }), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
