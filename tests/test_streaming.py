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


def test_giant_commit_chunked_emission(spark):
    """r11 (r10 verdict #6): a commit larger than the emit chunk yields
    MULTIPLE bounded frames whose concatenation is exactly the unchunked
    emission (same rows, same order) — no giant pandas frame / Arrow
    batch at the worst moment. The assembler closure is driven directly
    (chunk size is a closure arg precisely because it must pickle by
    value to the workers); plumbing through the real stream is covered by
    the other tests in this module."""
    import pandas as pd

    from kafka_connect_logminer2_spark.streaming.transactions import (
        make_assembler,
    )

    class StubState:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.exists = True

        def remove(self):
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    rows = [dict(scn=1, operation="START", xid="G")]
    rows += [
        dict(scn=2 + i, operation="INSERT", xid="G", table_name="CUSTOMER",
             sql_redo=INS.format(k=i), row_id=f"r{i}")
        for i in range(25)
    ]
    rows.append(dict(scn=100, operation="COMMIT", xid="G", commit_scn=100))
    events = redo_events_from_rows(spark, rows).toPandas()

    def run(chunk):
        fn = make_assembler(None, emit_chunk_rows=chunk)
        return list(fn(("G",), iter([events.copy()]), StubState()))

    chunked, whole = run(7), run(1 << 17)
    assert len(whole) == 1 and len(whole[0]) == 25
    assert [len(c) for c in chunked] == [7, 7, 7, 4]  # bounded frames
    got = pd.concat(chunked, ignore_index=True)
    pd.testing.assert_frame_equal(got, whole[0].reset_index(drop=True))
    assert (got["commit_scn"] == 100).all()


def test_apply_path_buffer_ceiling_fails_fast(spark):
    """r12 (r11 verdict #7): a transaction whose UNCOMMITTED buffer exceeds
    max_buffered_rows raises TransactionBufferCeiling immediately, with a
    diagnostic naming the foreachBatch assembler — instead of dying later
    as an opaque JVM StackOverflow at the measured ~4M rows/xid ceiling
    (BASELINE.md, tools/giant_txn_probe.py). A same-size transaction that
    COMMITS within the batch never persists the giant buffer, so it does
    not trip the ceiling; ceiling=0 disables the check."""
    import pytest as _pytest

    from kafka_connect_logminer2_spark.streaming.transactions import (
        TransactionBufferCeiling,
        make_assembler,
    )

    class StubState:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.exists = True

        def remove(self):
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    def mk_events(n, commit):
        rows = [dict(scn=1, operation="START", xid="G")]
        rows += [
            dict(scn=2 + i, operation="INSERT", xid="G",
                 table_name="CUSTOMER", sql_redo=INS.format(k=i),
                 row_id=f"r{i}")
            for i in range(n)
        ]
        if commit:
            rows.append(
                dict(scn=100, operation="COMMIT", xid="G", commit_scn=100)
            )
        return redo_events_from_rows(spark, rows).toPandas()

    open_txn = mk_events(12, commit=False)
    fn = make_assembler(None, max_buffered_rows=10)
    with _pytest.raises(TransactionBufferCeiling) as exc:
        list(fn(("G",), iter([open_txn.copy()]), StubState()))
    msg = str(exc.value)
    assert "write_cdc_foreachbatch" in msg and "10" in msg

    # same size but committed in-batch: buffer is cleared at COMMIT, the
    # giant state value is never persisted — no ceiling trip
    committed = mk_events(12, commit=True)
    out = list(fn(("G",), iter([committed.copy()]), StubState()))
    assert sum(len(c) for c in out) == 12

    # ceiling disabled
    fn0 = make_assembler(None, max_buffered_rows=0)
    assert list(fn0(("G",), iter([open_txn.copy()]), StubState())) == []


def test_ddl_schema_evolution_mid_stream(spark, tmp_path):
    """SURVEY §7 hard part 4: a DDL event invalidates the cached schema and
    the table's NEXT DML lazily reloads fresh columns from the dictionary
    loader (reload-on-miss, OracleSourceConnectorUtils2.java:249,368-371)."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )

    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")
    mk = lambda name, **kw: ColumnMeta("TPCH", "CUSTOMER", name, True, **kw)
    v2_cols = [
        mk("C_CUSTKEY", data_type="NUMBER", data_precision=18),
        mk("C_NAME", data_type="VARCHAR2", data_length=25),
        mk("C_NATIONKEY", data_type="NUMBER", data_precision=9),
        mk("C_ACCTBAL", data_type="NUMBER", data_precision=12, data_scale=2),
        mk("C_MKTSEGMENT", data_type="VARCHAR2", data_length=10),
        mk("C_TIER", data_type="NUMBER", data_precision=4),  # ALTER TABLE ADD
    ]
    from kafka_connect_logminer2_spark.plans.cdc import customer_registry

    reg = customer_registry()
    reg._loader = lambda owner, table: (
        v2_cols if (owner, table) == ("TPCH", "CUSTOMER") else None
    )

    INS6 = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_NATIONKEY",'
        "\"C_ACCTBAL\",\"C_MKTSEGMENT\",\"C_TIER\") values ({k},'n',1,1.5,'s',7)"
    )
    events = redo_events_from_rows(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
                 sql_redo=INS.format(k=1), row_id="r1"),
            dict(scn=3, operation="COMMIT", xid="A", commit_scn=3),
            # Oracle auto-commits DDL: it rides its own transaction
            dict(scn=4, operation="START", xid="D"),
            dict(scn=5, operation="DDL", xid="D", table_name="CUSTOMER",
                 sql_redo="alter table TPCH.CUSTOMER add C_TIER number(4)"),
            dict(scn=6, operation="COMMIT", xid="D", commit_scn=6),
            dict(scn=7, operation="START", xid="B"),
            dict(scn=8, operation="INSERT", xid="B", table_name="CUSTOMER",
                 sql_redo=INS6.format(k=2), row_id="r2"),
            dict(scn=9, operation="COMMIT", xid="B", commit_scn=9),
        ],
    )
    _write_ordered(events, f"{tmp}/stage", 0)
    shutil.copy(sorted(glob.glob(f"{tmp}/stage/part*"))[0], f"{tmp}/redo/a.parquet")

    q = write_per_table(
        cdc_stream(read_redo_stream_files(spark, f"{tmp}/redo"), default_config()),
        reg, f"{tmp}/out", f"{tmp}/ckpt",
    )
    q.awaitTermination(300)
    got = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/out/TPCH.CUSTOMER")
    rows = {r["data"]["C_CUSTKEY"]: r for r in got.collect()}
    assert set(rows) == {1, 2}
    # post-DDL row got the v2 schema with the added, typed column
    r2 = rows[2]["data"].asDict()
    assert r2.get("C_TIER") == 7
    # the registry now caches v2 (reloaded on miss after invalidation)
    assert len(reg.columns("TPCH", "CUSTOMER")) == 6


def _wait_until(pred, timeout_s=120, interval=0.25):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return False


def test_abandoned_txn_timeout_eviction(spark, tmp_path):
    """The state-bounding guard the reference lacks (its trnCollection grows
    forever, LogMinerThread2.java:81): an open transaction with no activity
    past the timeout is evicted, so even a late COMMIT emits nothing.

    NOTE: with ProcessingTimeTimeout the engine schedules micro-batches
    continuously (every expired timeout forces a batch), so
    ``processAllAvailable()`` never sees a quiescent stream and hangs —
    progress must be observed by polling ``lastProgress``/the sink instead."""
    from kafka_connect_logminer2_spark.streaming.transactions import (
        assemble_transactions_stream,
    )

    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")

    def drop(name, rows, i):
        df = redo_events_from_rows(spark, rows)
        _write_ordered(df, f"{tmp}/stage{i}", i)
        shutil.copy(sorted(glob.glob(f"{tmp}/stage{i}/part*"))[0], f"{tmp}/redo/{name}")
        os.utime(f"{tmp}/redo/{name}", (time.time() + i, time.time() + i))

    # f1: A opens and stays idle past the 10 ms timeout. f2 (newer mtime):
    # B opens and commits — its output proves f1+f2 were both consumed
    # (maxFilesPerTrigger=1 processes files in mtime order).
    drop("f1.parquet", [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="rA"),
    ], 0)
    drop("f2.parquet", [
        dict(scn=10, operation="START", xid="B"),
        dict(scn=11, operation="INSERT", xid="B", table_name="CUSTOMER",
             sql_redo=INS.format(k=2), row_id="rB"),
        dict(scn=12, operation="COMMIT", xid="B", commit_scn=12),
    ], 1)

    stream = read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1)
    out = assemble_transactions_stream(stream, timeout_ms=10)
    q = (
        out.writeStream.format("memory")
        .queryName("evict_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        sink_xids = lambda: {
            r["xid"] for r in spark.sql("select xid from evict_out").collect()
        }
        assert _wait_until(lambda: "B" in sink_xids()), "B never committed"

        # A's state was set no later than B's batch; wait 2 more batches so
        # the expired timeout invocation (hasTimedOut → remove) has run
        b0 = q.lastProgress["batchId"]
        assert _wait_until(lambda: q.lastProgress["batchId"] >= b0 + 2)

        # late COMMIT for the evicted A — must be a no-op
        drop("f3.parquet", [
            dict(scn=20, operation="COMMIT", xid="A", commit_scn=20),
        ], 2)
        b1 = q.lastProgress["batchId"]
        assert _wait_until(lambda: q.lastProgress["batchId"] >= b1 + 6)
        assert sink_xids() == {"B"}  # A evicted; its COMMIT emitted nothing
    finally:
        q.stop()
        q.awaitTermination(60)
