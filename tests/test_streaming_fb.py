"""Parity + state tests for the foreachBatch carry-over assembler
(streaming/transactions_fb.py): streaming the redo log file-by-file must
land on EXACTLY the typed rows the one-shot batch pipeline computes —
including transactions spanning micro-batches, partial-rollback repair,
CSF merge, and full rollback discard — while carrying only open
transactions as state."""

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
from kafka_connect_logminer2_spark.streaming.pipeline import read_redo_stream_files
from kafka_connect_logminer2_spark.streaming.transactions_fb import (
    write_cdc_foreachbatch,
)

INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY") values ({k})'


def _stage(spark, redo, tmp, n_files):
    redo.orderBy("scn").repartitionByRange(n_files, "scn").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return f"{tmp}/redo"


def _typed_rows(df):
    return sorted(
        (r.SCN, r.COMMIT_SCN, r.OPERATION, r.data["C_CUSTKEY"])
        for r in df.select("SCN", "COMMIT_SCN", "OPERATION", "data").collect()
    )


def test_fb_stream_equals_batch(spark, sf_dir, tmp_path):
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp, 4)

    q = write_cdc_foreachbatch(
        read_redo_stream_files(spark, path, max_files_per_trigger=1),
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        f"{tmp}/state",
        default_config(),
    )
    assert q.awaitTermination(300)

    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    want = run_cdc_batch(redo)
    assert _typed_rows(got) == _typed_rows(want)
    assert got.count() > 0


def test_fb_cross_batch_txn_partial_and_full_rollback(spark, tmp_path):
    tmp = str(tmp_path)
    # A spans two batches; B holds a partial-rollback pair; C rolls back
    b1 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER", sql_redo=INS.format(k=1), row_id="r1"),
        dict(scn=3, operation="START", xid="B"),
        dict(scn=4, operation="INSERT", xid="B", table_name="CUSTOMER", sql_redo=INS.format(k=2), row_id="r2"),
        dict(scn=5, operation="INSERT", xid="B", table_name="CUSTOMER", sql_redo=INS.format(k=3), row_id="r3", rollback="1"),
        dict(scn=6, operation="START", xid="C"),
        dict(scn=7, operation="INSERT", xid="C", table_name="CUSTOMER", sql_redo=INS.format(k=4), row_id="r4"),
    ]
    b2 = [
        dict(scn=8, operation="INSERT", xid="A", table_name="CUSTOMER", sql_redo=INS.format(k=5), row_id="r5"),
        dict(scn=9, operation="COMMIT", xid="A", commit_scn=9),
        dict(scn=10, operation="COMMIT", xid="B", commit_scn=10),
        dict(scn=11, operation="ROLLBACK", xid="C"),
    ]
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, rows in enumerate([b1, b2]):
        redo_events_from_rows(spark, rows).coalesce(1).write.parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)

    q = write_cdc_foreachbatch(
        read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        f"{tmp}/state",
        default_config(),
    )
    assert q.awaitTermination(300)

    rows = {
        (r.SCN, r.COMMIT_SCN)
        for r in spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER").collect()
    }
    # A: both rows with commit stamped — emitted only once COMMIT arrived
    assert (2, 9) in rows and (8, 9) in rows
    # B: rollback pair removed entirely; C: fully discarded
    assert not any(scn in (4, 5, 7) for scn, _ in rows)

    # state hygiene: after batch 0, A/B/C were all open (pending non-empty);
    # after the final batch every txn closed -> latest state version is empty
    v0 = spark.read.parquet(f"{tmp}/state/v=0")
    assert v0.select("xid").distinct().count() == 3
    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(f"{tmp}/state") if d.startswith("v=")
    )
    last = spark.read.parquet(f"{tmp}/state/v={versions[-1]}")
    assert last.count() == 0


def test_fb_pending_ttl_evicts_abandoned_txn(spark, tmp_path):
    tmp = str(tmp_path)
    batches = [
        [
            dict(scn=1, operation="START", xid="Z"),
            dict(scn=2, operation="INSERT", xid="Z", table_name="CUSTOMER", sql_redo=INS.format(k=1), row_id="r1"),
        ],
        [dict(scn=10, operation="START", xid="Y"),
         dict(scn=11, operation="INSERT", xid="Y", table_name="CUSTOMER", sql_redo=INS.format(k=2), row_id="r2")],
        [dict(scn=20, operation="COMMIT", xid="Y", commit_scn=20)],
    ]
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, rows in enumerate(batches):
        redo_events_from_rows(spark, rows).coalesce(1).write.parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)

    q = write_cdc_foreachbatch(
        read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        f"{tmp}/state",
        default_config(),
        pending_ttl_batches=2,
    )
    assert q.awaitTermination(300)

    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(f"{tmp}/state") if d.startswith("v=")
    )
    last = spark.read.parquet(f"{tmp}/state/v={versions[-1]}")
    # Z (abandoned, first seen batch 0) evicted by batch 2; Y committed
    assert last.filter(F.col("xid") == "Z").count() == 0
    assert last.count() == 0


def test_fb_ddl_schema_evolution_mid_stream(spark, tmp_path):
    """DDL-before-DML ordering in the foreachBatch assembler: a DDL adding a
    column mid-stream invalidates the registry before the same batch's DML
    materializes, so rows after the DDL carry the new column typed."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )

    tmp = str(tmp_path)
    mk = lambda name, **kw: ColumnMeta("TPCH", "CUSTOMER", name, True, **kw)
    v1 = [
        mk("C_CUSTKEY", data_type="NUMBER", data_precision=18),
        mk("C_NAME", data_type="VARCHAR2", data_length=25),
    ]
    v2 = v1 + [mk("C_TIER", data_type="NUMBER", data_precision=4)]
    reg = SchemaRegistry()
    reg.register(v1)
    reg._loader = lambda o, t: v2 if (o, t) == ("TPCH", "CUSTOMER") else None

    INS2 = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'a\')'
    INS3 = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_TIER")'
        " values ({k},'b',7)"
    )
    b1 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS2.format(k=1), row_id="r1"),
        dict(scn=3, operation="COMMIT", xid="A", commit_scn=3),
    ]
    b2 = [
        dict(scn=4, operation="START", xid="D"),
        dict(scn=5, operation="DDL", xid="D", table_name="CUSTOMER",
             sql_redo="alter table TPCH.CUSTOMER add C_TIER number(4)"),
        dict(scn=6, operation="COMMIT", xid="D", commit_scn=6),
        dict(scn=7, operation="START", xid="B"),
        dict(scn=8, operation="INSERT", xid="B", table_name="CUSTOMER",
             sql_redo=INS3.format(k=2), row_id="r2"),
        dict(scn=9, operation="COMMIT", xid="B", commit_scn=9),
    ]
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, rows in enumerate([b1, b2]):
        redo_events_from_rows(spark, rows).coalesce(1).write.parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)

    q = write_cdc_foreachbatch(
        read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
        reg,
        f"{tmp}/out",
        f"{tmp}/ckpt",
        f"{tmp}/state",
        default_config(),
    )
    assert q.awaitTermination(300)

    got = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/out/TPCH.CUSTOMER")
    rows = {r.data["C_CUSTKEY"]: r for r in got.collect()}
    assert rows[1].data["C_NAME"] == "a"
    # the post-DDL row must carry the evolved column, typed
    assert rows[2].data["C_TIER"] == 7


def _crash_at(point: str, batch_id: int):
    """Fault injector raising at one (point, batch) — simulating a kill in
    that crash window; the StreamingQuery fails and is restarted."""

    def inject(p: str, b: int) -> None:
        if p == point and b == batch_id:
            raise RuntimeError(f"injected crash {point}@{b}")

    return inject


def _run_fb(spark, path, tmp, injector=None):
    return write_cdc_foreachbatch(
        read_redo_stream_files(spark, path, max_files_per_trigger=1),
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        f"{tmp}/state",
        default_config(),
        _fault_injector=injector,
    )


def _await_failure(q, timeout=300):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    try:
        q.awaitTermination(timeout)
        raise AssertionError("query should have failed on the injected crash")
    except StreamingQueryException as e:
        assert "injected crash" in str(e)


def test_fb_chaos_kill_after_state_write_then_restart(spark, sf_dir, tmp_path):
    """Kill between the carry-over state write and the checkpoint commit
    (the 'after_state' window): on restart Structured Streaming re-runs the
    SAME batch_id; the assembler must re-read the parent state STRICTLY
    below it (never its own half-committed v=<id>) and overwrite its own
    state + sink outputs — final typed rows byte-equal the batch truth."""
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp, 4)

    _await_failure(_run_fb(spark, path, tmp, _crash_at("after_state", 1)))
    # the crash window is real: batch 1's state version landed...
    assert os.path.isdir(f"{tmp}/state/v=1")
    # ...but the restart re-runs batch 1 (checkpoint never saw it commit)
    q2 = _run_fb(spark, path, tmp)
    assert q2.awaitTermination(300)

    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    assert _typed_rows(got) == _typed_rows(run_cdc_batch(redo))
    # exactly one sink dir per batch — the re-run overwrote, not duplicated
    bdirs = os.listdir(f"{tmp}/out/TPCH.CUSTOMER")
    assert sorted(d for d in bdirs if d.startswith("batch=")) == [
        "batch=0", "batch=1", "batch=2", "batch=3",
    ]


def test_fb_chaos_kill_after_sink_before_state_then_restart(spark, sf_dir, tmp_path):
    """Kill between the sink write and the state write (the 'after_sink'
    window): batch 1's typed output exists but its carry-over state does
    not — the restart must regenerate BOTH from the parent state, and the
    final rows still match the batch truth (no loss of the open
    transactions that were only in the unwritten state)."""
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp, 4)

    _await_failure(_run_fb(spark, path, tmp, _crash_at("after_sink", 1)))
    assert os.path.isdir(f"{tmp}/out/TPCH.CUSTOMER/batch=1")  # sink landed
    assert not os.path.isdir(f"{tmp}/state/v=1")  # state did not
    q2 = _run_fb(spark, path, tmp)
    assert q2.awaitTermination(300)

    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    assert _typed_rows(got) == _typed_rows(run_cdc_batch(redo))
