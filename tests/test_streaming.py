"""Streaming tests: stateful assembly across micro-batches, checkpoint
resume, rollback across batches. (Slower — these spin availableNow queries.)"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.plans.cdc import (
    customer_registry,
    default_config,
    run_cdc_batch,
)
from kafka_connect_logminer2_spark.sources.redo import (
    redo_events_from_rows,
    redo_inserts_from_customer,
)
from kafka_connect_logminer2_spark.streaming.pipeline import (
    cdc_stream,
    read_redo_stream_files,
    write_per_table,
)

INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_NATIONKEY","C_ACCTBAL","C_MKTSEGMENT") values ({k},\'n\',1,1.5,\'s\')'


def _write_ordered(df, path, i):
    df.coalesce(1).write.parquet(path)
    t = time.time() + i * 10
    for f in glob.glob(f"{path}/part*"):
        os.utime(f, (t, t))


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    redo.orderBy("scn").repartitionByRange(3, "scn").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    stream = read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1)
    q = write_per_table(
        cdc_stream(stream, default_config()), customer_registry(), f"{tmp}/out", f"{tmp}/ckpt"
    )
    q.awaitTermination(300)
    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    batch = run_cdc_batch(redo_inserts_from_customer(spark, sf_dir))
    flat = lambda df: df.select(F.col("data.C_CUSTKEY"), F.col("SCN"), F.col("data.C_ACCTBAL"))
    assert flat(got).exceptAll(flat(batch)).count() == 0
    assert flat(batch).exceptAll(flat(got)).count() == 0


def test_rollback_across_batches_and_resume(spark, tmp_path):
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")
    b1 = redo_events_from_rows(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER", sql_redo=INS.format(k=1), row_id="r1"),
            dict(scn=3, operation="START", xid="B"),
            dict(scn=4, operation="INSERT", xid="B", table_name="CUSTOMER", sql_redo=INS.format(k=2), row_id="r2"),
        ],
    )
    _write_ordered(b1, f"{tmp}/b1", 0)
    shutil.copy(sorted(glob.glob(f"{tmp}/b1/part*"))[0], f"{tmp}/redo/a.parquet")
    os.utime(f"{tmp}/redo/a.parquet", (time.time() - 100, time.time() - 100))

    reg = customer_registry()
    # phase 1: open transactions only — nothing emitted, state buffered
    q1 = write_per_table(
        cdc_stream(read_redo_stream_files(spark, f"{tmp}/redo"), default_config()),
        reg, f"{tmp}/out", f"{tmp}/ckpt",
    )
    q1.awaitTermination(300)
    assert not os.path.exists(f"{tmp}/out/TPCH.CUSTOMER")

    # phase 2: restart on the same checkpoint; A commits, B rolls back
    b2 = redo_events_from_rows(
        spark,
        [
            dict(scn=5, operation="COMMIT", xid="A", commit_scn=5),
            dict(scn=6, operation="ROLLBACK", xid="B"),
        ],
    )
    _write_ordered(b2, f"{tmp}/b2", 1)
    shutil.copy(sorted(glob.glob(f"{tmp}/b2/part*"))[0], f"{tmp}/redo/b.parquet")
    q2 = write_per_table(
        cdc_stream(read_redo_stream_files(spark, f"{tmp}/redo"), default_config()),
        reg, f"{tmp}/out", f"{tmp}/ckpt",
    )
    q2.awaitTermination(300)
    rows = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER").collect()
    assert [r["data"]["C_CUSTKEY"] for r in rows] == [1]
    assert rows[0]["COMMIT_SCN"] == 5
