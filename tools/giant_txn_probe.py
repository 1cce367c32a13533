"""Single-giant-transaction stress for the stateful assemblers (A15,
r10 verdict #6).

The reference's known flaw is unbounded per-transaction heap
(LogMinerThread2.java:81 — one LinkedHashMap entry buffering every row
until COMMIT). The Spark engine bounds ABANDONED transactions with
timeouts, but a single LEGITIMATE xid carrying millions of rows still
stresses each assembler differently:

* ``apply`` (applyInPandasWithState): per-xid state is ONE JSON string
  (GroupState is single-row by API) rewritten each micro-batch the txn
  spans — O(buffered) serialization per batch, O(N²/batches) over the
  txn's life — and the commit emits the whole buffer (chunked into
  bounded frames since r11).
* ``fb`` (foreachBatch + versioned parquet open-txn state): pending rows
  are columnar parquet, rewritten per batch (O(open set) but
  JVM-columnar, no Python buffer), commit assembly is the batch window
  program — no Python materialization at all.
* ``tws`` (transformWithState ListState): O(increment) appends; commit
  reads the list back through the state server.

One committed single-xid transaction of N DML rows (START, N inserts,
COMMIT in the last file) streamed as 8 availableNow micro-batches
through the full production plan (parse included, per-table typed sink).
Prints one JSON line per (assembler, N): sec, events/s, out_rows, and
"err" when the run died — the measured ceiling goes to BASELINE.md.

Usage: python tools/giant_txn_probe.py [Ns] [assemblers] [sf_dir]
       python tools/giant_txn_probe.py 250000,1000000 apply,fb
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, ".")

from kafka_connect_logminer2_spark.plans.cdc import (  # noqa: E402
    customer_registry,
    default_config,
)
from kafka_connect_logminer2_spark.session import (  # noqa: E402
    enable_vendored_protobuf,
    get_spark,
)


def giant_txn(spark, sf_dir: str, n: int):
    """START + n INSERT rows + COMMIT, all one xid, scn == row order."""
    from pyspark.sql import Window, functions as F

    from kafka_connect_logminer2_spark.sources.redo import (
        redo_inserts_from_customer,
    )

    base = redo_inserts_from_customer(spark, sf_dir).filter(
        F.col("operation") == "INSERT"
    )
    n_base = base.count()
    copies = -(-n // n_base)  # ceil
    dml = base.crossJoin(
        spark.range(copies).select(F.col("id").alias("_copy"))
    ).limit(n)
    w = Window.orderBy("_copy", "scn")
    dml = (
        dml.withColumn("scn", F.row_number().over(w).cast("long"))
        .drop("_copy")
        .withColumn("xid", F.lit("GIANT.1.1"))
        .withColumn("commit_scn", F.lit(None).cast("long"))
        .withColumn("commit_timestamp", F.lit(None).cast("timestamp"))
    )
    bound = spark.createDataFrame(
        [("START", 0), ("COMMIT", n + 1)], "operation string, scn long"
    )
    ctrl = (
        dml.limit(1)
        .drop("operation", "scn")
        .crossJoin(bound)
        .withColumn("xid", F.lit("GIANT.1.1"))
        .withColumn("sql_redo", F.lit(None).cast("string"))
        .withColumn(
            "commit_scn",
            F.when(F.col("operation") == "COMMIT", F.col("scn")),
        )
        .withColumn(
            "commit_timestamp",
            F.when(F.col("operation") == "COMMIT", F.col("timestamp")),
        )
    )
    return dml.unionByName(ctrl.select(dml.columns))


def run_one(spark, redo_dir: str, assembler: str, n_events: int) -> dict:
    from kafka_connect_logminer2_spark.streaming.pipeline import (
        cdc_stream,
        read_redo_stream_files,
        write_per_table,
    )

    tmp = tempfile.mkdtemp(prefix=f"giant_{assembler}_")
    try:
        t0 = time.time()
        if assembler == "fb":
            from kafka_connect_logminer2_spark.streaming.transactions_fb import (
                write_cdc_foreachbatch,
            )

            q = write_cdc_foreachbatch(
                read_redo_stream_files(spark, redo_dir),
                customer_registry(),
                f"{tmp}/out", f"{tmp}/ckpt", f"{tmp}/state",
                default_config(),
            )
        else:
            q = write_per_table(
                cdc_stream(
                    read_redo_stream_files(spark, redo_dir),
                    default_config(),
                    assembler=assembler,
                ),
                customer_registry(),
                f"{tmp}/out", f"{tmp}/ckpt",
            )
        finished = q.awaitTermination(1800)
        if not finished:
            q.stop()
            return {"err": "timeout(1800s)"}
        sec = time.time() - t0
        got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER").count()
        return {
            "sec": round(sec, 2), "out_rows": got,
            "events_per_s": int(n_events / sec),
        }
    except Exception as e:  # noqa: BLE001 — the ceiling IS the datapoint
        traceback.print_exc()
        return {"err": f"{type(e).__name__}: {str(e)[:200]}"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ns = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else
                           "250000,1000000").split(",")]
    has_protobuf = enable_vendored_protobuf()
    which = (sys.argv[2].split(",") if len(sys.argv) > 2 else
             ["apply", "fb"] + (["tws"] if has_protobuf else []))
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="giant_txn_probe", extra_conf={
        "spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        stage = tempfile.mkdtemp(prefix="giant_stage_")
        try:
            redo = giant_txn(spark, sf_dir, n)
            redo.repartitionByRange(8, "scn").write.parquet(f"{stage}/s")
            os.makedirs(f"{stage}/redo")
            now = time.time()
            # repartitionByRange file order == scn order only after sorting
            # parts by their min scn; name order is NOT range order, so map
            # each part to its min scn with a cheap arrow read
            import pyarrow.parquet as pq

            parts = []
            for p in glob.glob(f"{stage}/s/part*"):
                t = pq.read_table(p, columns=["scn"])
                parts.append((t["scn"].to_pylist() and min(t["scn"].to_pylist()) or 0, p))
            for i, (_, p) in enumerate(sorted(parts)):
                dst = f"{stage}/redo/f{i}.parquet"
                shutil.copy(p, dst)
                os.utime(dst, (now + i * 10,) * 2)
            n_events = n + 2
            for assembler in which:
                res = run_one(spark, f"{stage}/redo", assembler, n_events)
                print(json.dumps({
                    "assembler": assembler, "n": n, **res,
                }), flush=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
