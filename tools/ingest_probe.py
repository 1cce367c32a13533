"""Ingest-store cost probe: is the per-batch store write O(new docs) and is
the history probe sub-linear in history size?

Two measurements, one JSON line each (BASELINE.md records them):

1. ``e2e``  — write_neardup_ingest end-to-end at the given SF: the
   documents table split into 3 file batches, streamed with
   maxFilesPerTrigger=1 through the full foreachBatch pipeline (in-batch
   clustering, history band-key probe, signature verify, delta write,
   commit markers).

2. ``hist x1/x4/x10`` — for BOTH stores: seed a history of m× the base
   documents (distinct texts), then ingest ONE fixed-size new batch
   (half duplicates of history, half genuinely new) and record
   wall-seconds plus the BYTES the store write added. The delta layout's
   claim is exactly this curve: delta_bytes stays flat as history grows
   10× (write cost ∝ new fingerprints), while probe time may grow mildly
   (the touched buckets' committed chains get longer).

Usage: python tools/ingest_probe.py [sf_dir]   # default /root/testdata/sf0.1
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
from kafka_connect_logminer2_spark.streaming.corpus_ingest import (  # noqa: E402
    ingest_batch_exact,
    ingest_batch_neardup,
    write_neardup_ingest,
)

MULTIPLIERS = (1, 4, 10)


def _dir_bytes(root: str, version: int) -> int:
    """Total bytes under every bucket's v=<version> delta segment."""
    total = 0
    for b in os.listdir(root):
        vdir = os.path.join(root, b, f"v={version}")
        if os.path.isdir(vdir):
            for f in os.listdir(vdir):
                total += os.path.getsize(os.path.join(vdir, f))
    return total


def _hist_docs(docs, m: int):
    """m distinct-text copies of the base docs (suffix defeats both exact
    fingerprints and — with a unique token per copy inside the shingle
    window — near-dup collapse across copies)."""
    n = docs.count()
    out = None
    for i in range(m):
        c = docs.selectExpr(
            f"doc_id + {i} * {10 * n} as doc_id",
            f"concat(text, ' hist{i} copy{i} tag{i}') as text",
        )
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ingest_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="ingest_probe_")
    try:
        # --- 1. end-to-end streaming near-dup ingest: n_docs over 3 batches
        src = os.path.join(work, "src")
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"part{i}"))
        files = [
            os.path.join(src, d, f)
            for d in sorted(os.listdir(src))
            for f in os.listdir(os.path.join(src, d))
            if f.endswith(".parquet")
        ]
        flat = os.path.join(work, "flat")
        os.makedirs(flat)
        for i, f in enumerate(files):
            shutil.copy(f, os.path.join(flat, f"b{i}.parquet"))
        t0 = time.time()
        q = write_neardup_ingest(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(flat),
            os.path.join(work, "e2e_out"),
            os.path.join(work, "e2e_store"),
            os.path.join(work, "e2e_ckpt"),
        )
        q.awaitTermination(600)
        el = time.time() - t0
        accepted = spark.read.parquet(os.path.join(work, "e2e_out")).count()
        print(
            json.dumps(
                {
                    "op": "neardup_ingest_e2e",
                    "docs": n_docs,
                    "batches": 3,
                    "sec": round(el, 2),
                    "accepted": accepted,
                    "sf_dir": sf_dir,
                }
            )
        )

        # --- 2. history-scale probe: fixed new batch vs m× history
        half = n_docs // 2
        for kind, runner in (("exact", ingest_batch_exact), ("neardup", ingest_batch_neardup)):
            for m in MULTIPLIERS:
                store = os.path.join(work, f"{kind}_store_x{m}")
                out = os.path.join(work, f"{kind}_out_x{m}")
                hist = _hist_docs(docs, m)
                runner(spark, hist, 0, out, store)  # seed (unmeasured)
                # new batch: half dups of history copy 0, half new texts
                dups = docs.filter(F.col("doc_id") < half).selectExpr(
                    f"doc_id + {100 * n_docs * m} as doc_id",
                    "concat(text, ' hist0 copy0 tag0') as text",
                )
                # genuinely novel texts (reversed chars → disjoint shingles),
                # so `accepted` stays ~constant across history multipliers
                # and delta_bytes measures a fixed new-row load
                fresh = docs.filter(F.col("doc_id") >= half).selectExpr(
                    f"doc_id + {200 * n_docs * m} as doc_id",
                    "concat(reverse(text), ' novel ', doc_id) as text",
                )
                batch = dups.unionByName(fresh).persist()
                batch.count()
                t0 = time.time()
                runner(spark, batch, 1, out, store)
                el = time.time() - t0
                batch.unpersist()
                print(
                    json.dumps(
                        {
                            "op": f"{kind}_ingest_batch",
                            "hist_mult": m,
                            "hist_docs": n_docs * m,
                            "batch_docs": n_docs,
                            "sec": round(el, 2),
                            "delta_bytes": _dir_bytes(store, 1),
                            "accepted": spark.read.parquet(
                                os.path.join(out, "batch=1")
                            ).count(),
                        }
                    )
                )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
