"""CDC throughput measurement: batch and streaming paths over the synthetic
redo stream at a given SF. Prints one JSON line per path —

    {"path": "batch",  "events": N, "out_rows": M, "sec": s, "events_per_s": r}
    {"path": "stream", ...}

Batch = run_cdc_batch (single-pass window assembly + Arrow parse).
Stream = read_redo_stream_files → applyInPandasWithState assembler →
foreachBatch per-table typed sink, availableNow over 8 files — the full
production plan including stream startup and sink writes.

Usage: python tools/cdc_throughput.py [sf_dir] [mult] [shape]

``mult`` > 1 replicates the redo stream that many times with disjoint
SCN/xid ranges (copy i shifts scn/commit_scn by i*10^9 and suffixes the
xid), so transaction count and assembler state grow linearly — a real
scale probe of the assembly+parse path, not a re-read of cached rows.

``shape`` = ``mixed`` (default: the per-customer tiny-txn stream, per-group
overhead dominates) or ``longtxn`` (50 transactions spanning every
micro-batch with commits only at the end — buffer-growth stress where the
GroupState whole-buffer rewrite degrades and ListState should not).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from kafka_connect_logminer2_spark.plans.cdc import (  # noqa: E402
    customer_registry,
    default_config,
    run_cdc_batch,
)
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.sources.redo import (  # noqa: E402
    redo_inserts_from_customer,
)
from kafka_connect_logminer2_spark.streaming.pipeline import (  # noqa: E402
    cdc_stream,
    read_redo_stream_files,
    write_per_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    # before JVM launch so PYTHONPATH reaches python workers (tws assembler)
    from kafka_connect_logminer2_spark.session import enable_vendored_protobuf

    has_protobuf = enable_vendored_protobuf()
    spark = get_spark(
        app_name="cdc_throughput",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    shape = sys.argv[3] if len(sys.argv) > 3 else "mixed"
    if shape == "longtxn":
        from kafka_connect_logminer2_spark.sources.redo import (
            redo_long_txns_from_customer,
        )

        base = redo_long_txns_from_customer(spark, sf_dir)
    else:
        base = redo_inserts_from_customer(spark, sf_dir)
    if mult > 1:
        copies = [
            base.withColumn("scn", F.col("scn") + F.lit(i * 1_000_000_000))
            .withColumn("commit_scn", F.col("commit_scn") + F.lit(i * 1_000_000_000))
            .withColumn("xid", F.concat_ws(".", "xid", F.lit(str(i))))
            for i in range(mult)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        base = out
    redo = base.localCheckpoint()
    n_events = redo.count()

    # batch: warm once, then best-of-2
    run_cdc_batch(redo).count()
    best, out_rows = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        out_rows = run_cdc_batch(redo).count()
        best = min(best, time.time() - t0)
    print(json.dumps({
        "path": "batch", "events": n_events, "out_rows": out_rows,
        "sec": round(best, 2), "events_per_s": int(n_events / best),
    }))

    # streaming: 8 files, availableNow, per-table typed parquet sink — once
    # per stateful assembler (applyInPandasWithState vs transformWithState)
    assemblers = ["apply", "fb"] + (["tws"] if has_protobuf else [])
    for assembler in assemblers:
        tmp = tempfile.mkdtemp(prefix="cdc_tp_")
        try:
            redo.orderBy("scn").repartitionByRange(8, "scn").write.parquet(f"{tmp}/stage")
            os.makedirs(f"{tmp}/redo")
            now = time.time()
            for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
                dst = f"{tmp}/redo/f{i}.parquet"
                shutil.copy(p, dst)
                os.utime(dst, (now + i * 10, now + i * 10))
            t0 = time.time()
            if assembler == "fb":
                from kafka_connect_logminer2_spark.streaming.transactions_fb import (
                    write_cdc_foreachbatch,
                )

                q = write_cdc_foreachbatch(
                    read_redo_stream_files(spark, f"{tmp}/redo"),
                    customer_registry(),
                    f"{tmp}/out",
                    f"{tmp}/ckpt",
                    f"{tmp}/state",
                    default_config(),
                )
            else:
                q = write_per_table(
                    cdc_stream(
                        read_redo_stream_files(spark, f"{tmp}/redo"),
                        default_config(),
                        assembler=assembler,
                    ),
                    customer_registry(),
                    f"{tmp}/out",
                    f"{tmp}/ckpt",
                )
            q.awaitTermination(600)
            sec = time.time() - t0
            got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER").count()
            print(json.dumps({
                "path": f"stream_{assembler}", "events": n_events, "out_rows": got,
                "sec": round(sec, 2), "events_per_s": int(n_events / sec),
            }))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
