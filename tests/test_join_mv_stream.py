"""write_join_mv end-to-end: the streamed two-table CDC path with
checkpoint RESUME — a second run over new redo files must fold onto the
persisted snapshots/MV (not reprocess, not resurrect), covering left
inserts, a right update that rewrites existing MV rows, and a right
delete that cascades. cdc20's oracle covers the single-run value path at
fixture scale; this covers the stop/restart contract.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.plans.cdc import (
    customer_orders_registry,
    default_config,
)
from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows
from kafka_connect_logminer2_spark.streaming.join_mv import (
    read_join_mv,
    write_join_mv,
)
from kafka_connect_logminer2_spark.streaming.pipeline import (
    cdc_stream,
    read_redo_stream_files,
)

C_INS = (
    'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_NATIONKEY",'
    '"C_ACCTBAL","C_MKTSEGMENT") values ({k},\'c{k}\',1,10.5,\'SEG\')'
)
C_UPD = (
    'update "TPCH"."CUSTOMER" set "C_NAME" = \'renamed\' where '
    '"C_CUSTKEY" = {k} and "C_NAME" = \'c{k}\''
)
C_DEL = 'delete from "TPCH"."CUSTOMER" where "C_CUSTKEY" = {k}'
O_INS = (
    'insert into "TPCH"."ORDERS"("O_ORDERKEY","O_CUSTKEY","O_ORDERSTATUS",'
    '"O_TOTALPRICE") values ({o},{k},\'O\',99.5)'
)


def _txn(scn, xid, table, sql):
    ts = "2026-01-01T00:00:00"
    return [
        dict(scn=scn, xid=xid, operation="START", timestamp=ts),
        dict(
            scn=scn + 1, xid=xid, operation=("INSERT" if "insert" in sql else
                                             "UPDATE" if "update" in sql else "DELETE"),
            table_name=table, sql_redo=sql, row_id=f"AAA{scn:015d}", timestamp=ts,
        ),
        dict(scn=scn + 2, xid=xid, operation="COMMIT", commit_scn=scn + 2,
             timestamp=ts, commit_timestamp=ts),
    ]


def _stage_file(spark, rows, path, i):
    df = redo_events_from_rows(spark, rows)
    stage = f"{path}_stage{i}"
    df.coalesce(1).write.parquet(stage)
    (part,) = glob.glob(f"{stage}/part*")
    os.makedirs(path, exist_ok=True)
    dst = f"{path}/f{i}.parquet"
    shutil.copy(part, dst)
    t = time.time() + i * 10
    os.utime(dst, (t, t))


def _run(spark, tmp):
    stream = read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1)
    return write_join_mv(
        cdc_stream(stream, default_config()),
        customer_orders_registry(),
        "TPCH",
        "ORDERS",
        ["O_ORDERKEY"],
        "O_CUSTKEY",
        "CUSTOMER",
        "C_CUSTKEY",
        f"{tmp}/snap",
        f"{tmp}/mv",
        f"{tmp}/ckpt",
    )


def _mv_rows(spark, tmp):
    mv = read_join_mv(spark, f"{tmp}/mv")
    return sorted(
        (r["O_ORDERKEY"], r["O_CUSTKEY"], r["C_NAME"])
        for r in mv.select("O_ORDERKEY", "O_CUSTKEY", "C_NAME").collect()
    )


def test_resume_folds_onto_persisted_state(spark, tmp_path):
    tmp = str(tmp_path)
    # run 1 — batch 0: customers 1,2 + orders 100→1, 200→2
    rows0 = (
        _txn(1000, "1.1.1", "CUSTOMER", C_INS.format(k=1))
        + _txn(1010, "1.2.1", "CUSTOMER", C_INS.format(k=2))
        + _txn(1020, "1.3.1", "ORDERS", O_INS.format(o=100, k=1))
        + _txn(1030, "1.4.1", "ORDERS", O_INS.format(o=200, k=2))
    )
    _stage_file(spark, rows0, f"{tmp}/redo", 0)
    q = _run(spark, tmp)
    assert q.awaitTermination(300)
    assert _mv_rows(spark, tmp) == [(100, 1, "c1"), (200, 2, "c2")]

    # run 2 — batch 1 only (checkpoint must skip f0): rename customer 1
    # (rewrites order 100's row), delete customer 2 (order 200 leaves),
    # insert order 300→1
    rows1 = (
        _txn(2000, "2.1.1", "CUSTOMER", C_UPD.format(k=1))
        + _txn(2010, "2.2.1", "CUSTOMER", C_DEL.format(k=2))
        + _txn(2020, "2.3.1", "ORDERS", O_INS.format(o=300, k=1))
    )
    _stage_file(spark, rows1, f"{tmp}/redo", 1)
    q2 = _run(spark, tmp)
    assert q2.awaitTermination(300)
    assert _mv_rows(spark, tmp) == [(100, 1, "renamed"), (300, 1, "renamed")]

    # the MV history keeps both versions (VERSION AS OF contract)
    versions = sorted(d for d in os.listdir(f"{tmp}/mv") if d.startswith("v="))
    assert len(versions) == 2
    v0 = spark.read.parquet(f"{tmp}/mv/{versions[0]}")
    assert v0.count() == 2  # pre-restart state intact


def test_batch_touching_one_table_only(spark, tmp_path):
    tmp = str(tmp_path)
    rows0 = (
        _txn(1000, "1.1.1", "CUSTOMER", C_INS.format(k=1))
        + _txn(1020, "1.3.1", "ORDERS", O_INS.format(o=100, k=1))
    )
    rows1 = _txn(2000, "2.1.1", "ORDERS", O_INS.format(o=101, k=1))
    _stage_file(spark, rows0, f"{tmp}/redo", 0)
    _stage_file(spark, rows1, f"{tmp}/redo", 1)
    q = _run(spark, tmp)
    assert q.awaitTermination(300)
    assert _mv_rows(spark, tmp) == [(100, 1, "c1"), (101, 1, "c1")]
