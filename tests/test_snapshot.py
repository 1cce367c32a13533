"""Incrementally-maintained snapshot (streaming/snapshot.py): streaming the
change log file-by-file through write_snapshot must land on EXACTLY the
state the one-shot batch fold (operators/merge.py::apply_changes) computes —
including patch semantics (UPDATE carries untouched columns), tombstones
(DELETE removes the key) and cross-batch column carry-forward."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.operators.merge import apply_changes
from kafka_connect_logminer2_spark.plans.cdc import (
    customer_registry,
    default_config,
    run_cdc_batch,
)
from kafka_connect_logminer2_spark.sources.redo import (
    redo_deletes_from_customer,
    redo_inserts_from_customer,
    redo_updates_from_customer,
)
from kafka_connect_logminer2_spark.streaming.pipeline import (
    cdc_stream,
    read_redo_stream_files,
)
from kafka_connect_logminer2_spark.streaming.snapshot import (
    latest_version,
    read_snapshot,
    write_snapshot,
)


def _rows(df):
    return sorted(
        (r.C_CUSTKEY, r.C_NAME, r.C_NATIONKEY, round(r.C_ACCTBAL, 2), r.C_MKTSEGMENT)
        for r in df.collect()
    )


def test_incremental_snapshot_equals_batch_fold(spark, sf_dir, tmp_path):
    tmp = str(tmp_path)
    keysel = F.split(F.col("xid"), r"\.").getItem(1).cast("long") % 10
    ins = redo_inserts_from_customer(spark, sf_dir)
    upd = redo_updates_from_customer(spark, sf_dir).filter(keysel.isin(0, 1, 2))
    dele = redo_deletes_from_customer(spark, sf_dir).filter(keysel.isin(6, 7))
    redo = ins.unionByName(upd).unionByName(dele)

    expected = _rows(apply_changes(run_cdc_batch(redo), ["C_CUSTKEY"]))

    # stage as 6 SCN-ordered files picked up one per micro-batch, so the
    # insert → update → delete history spans several incremental merges
    redo.orderBy("scn").repartitionByRange(6, "scn").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    stream = read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1)
    q = write_snapshot(
        cdc_stream(stream, default_config()),
        customer_registry(),
        "TPCH",
        "CUSTOMER",
        ["C_CUSTKEY"],
        f"{tmp}/snap",
        f"{tmp}/ckpt",
    )
    q.awaitTermination(300)

    assert latest_version(f"{tmp}/snap") is not None
    versions = [d for d in os.listdir(f"{tmp}/snap") if d.startswith("v=")]
    assert len(versions) > 1  # state evolved across micro-batches

    got = read_snapshot(spark, f"{tmp}/snap")
    assert _rows(got) == expected


def test_snapshot_merge_step_patch_tombstone_reborn(spark):
    """merge_step unit semantics: patch coalesces with prev, delete removes,
    reborn does NOT inherit pre-tombstone columns."""
    from kafka_connect_logminer2_spark.streaming.snapshot import merge_step

    prev = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "bal"]
    )
    net = spark.createDataFrame(
        [
            # patch: name untouched (null) -> carries "a"
            (1, None, 11.0, False, False),
            # tombstone: key 2 leaves
            (2, None, None, True, False),
            # reborn: key 3 re-inserted with NULL name -> must NOT resurrect "c"
            (3, None, 33.0, False, True),
        ],
        "k long, name string, bal double, _deleted boolean, _reborn boolean",
    )
    got = sorted(
        (r.k, r.name, r.bal) for r in merge_step(prev, net, ["k"]).collect()
    )
    assert got == [(1, "a", 11.0), (3, None, 33.0)]


def test_snapshot_resumes_across_runs(spark, sf_dir, tmp_path):
    """Two separate availableNow runs over a growing redo directory with the
    same checkpoint: the second run resumes past the first run's batches and
    folds only the NEW files into the existing snapshot — landing on the
    same state as a one-shot batch fold over everything."""
    tmp = str(tmp_path)
    keysel = F.split(F.col("xid"), r"\.").getItem(1).cast("long") % 10
    ins = redo_inserts_from_customer(spark, sf_dir)
    upd = redo_updates_from_customer(spark, sf_dir).filter(keysel.isin(0, 1, 2))
    dele = redo_deletes_from_customer(spark, sf_dir).filter(keysel.isin(6, 7))
    redo = ins.unionByName(upd).unionByName(dele)
    expected = _rows(apply_changes(run_cdc_batch(redo), ["C_CUSTKEY"]))

    redo.orderBy("scn").repartitionByRange(6, "scn").write.parquet(f"{tmp}/stage")
    parts = sorted(glob.glob(f"{tmp}/stage/part*"))
    os.makedirs(f"{tmp}/redo")
    now = time.time()

    def run():
        stream = read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1)
        q = write_snapshot(
            cdc_stream(stream, default_config()),
            customer_registry(),
            "TPCH",
            "CUSTOMER",
            ["C_CUSTKEY"],
            f"{tmp}/snap",
            f"{tmp}/ckpt",
        )
        q.awaitTermination(300)

    for i, p in enumerate(parts[:3]):
        shutil.copy(p, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)
    run()
    v_first = latest_version(f"{tmp}/snap")
    assert v_first is not None

    for i, p in enumerate(parts[3:], start=3):
        shutil.copy(p, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)
    run()

    assert latest_version(f"{tmp}/snap") > v_first  # resumed, not re-folded
    assert _rows(read_snapshot(spark, f"{tmp}/snap")) == expected


def test_multi_table_snapshots(spark, tmp_path):
    """write_snapshots maintains independent folded state per table from ONE
    stream/checkpoint: customer gets insert+update+delete, nation gets an
    insert+patch — each snapshot dir holds exactly its table's final state."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )
    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows
    from kafka_connect_logminer2_spark.streaming.snapshot import write_snapshots

    tmp = str(tmp_path)
    reg = SchemaRegistry()
    mkc = lambda name, **kw: ColumnMeta("TPCH", "CUSTOMER", name, True, **kw)
    mkn = lambda name, **kw: ColumnMeta("TPCH", "NATION", name, True, **kw)
    reg.register(
        [
            mkc("C_CUSTKEY", data_type="NUMBER", data_precision=18),
            mkc("C_NAME", data_type="VARCHAR2", data_length=25),
            mkn("N_NATIONKEY", data_type="NUMBER", data_precision=18),
            mkn("N_NAME", data_type="VARCHAR2", data_length=25),
            mkn("N_COMMENT", data_type="VARCHAR2", data_length=80),
        ]
    )

    CINS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'{v}\')'
    CDEL = 'delete from "TPCH"."CUSTOMER" where "C_CUSTKEY" = {k}'
    NINS = (
        'insert into "TPCH"."NATION"("N_NATIONKEY","N_NAME","N_COMMENT")'
        " values ({k},'{v}','c0')"
    )
    NUPD = (
        'update "TPCH"."NATION" set "N_COMMENT" = \'patched\' '
        "where \"N_NATIONKEY\" = {k} and \"N_COMMENT\" = 'c0'"
    )
    ev = []
    scn = 0

    def add(op, table, sql, xid):
        nonlocal scn
        scn += 1
        ev.append(
            dict(
                scn=scn,
                operation=op,
                xid=xid,
                table_name=table,
                sql_redo=sql,
                row_id=f"r{scn}",
                timestamp="2024-01-01T00:00:00",
            )
        )

    def txn(xid, items):
        nonlocal scn
        scn += 1
        ev.append(dict(scn=scn, operation="START", xid=xid))
        for op, table, sql in items:
            add(op, table, sql, xid)
        scn += 1
        ev.append(dict(scn=scn, operation="COMMIT", xid=xid))

    txn("A", [("INSERT", "CUSTOMER", CINS.format(k=1, v="a")),
              ("INSERT", "CUSTOMER", CINS.format(k=2, v="b")),
              ("INSERT", "NATION", NINS.format(k=10, v="FR"))])
    txn("B", [("DELETE", "CUSTOMER", CDEL.format(k=2)),
              ("UPDATE", "NATION", NUPD.format(k=10)),
              ("INSERT", "NATION", NINS.format(k=11, v="DE"))])

    redo_events_from_rows(spark, ev).coalesce(1).write.parquet(f"{tmp}/stage2")
    os.makedirs(f"{tmp}/redo")
    part = sorted(glob.glob(f"{tmp}/stage2/part*"))[0]
    shutil.copy(part, f"{tmp}/redo/f0.parquet")

    q = write_snapshots(
        cdc_stream(
            read_redo_stream_files(spark, f"{tmp}/redo", 1), default_config()
        ),
        reg,
        {("TPCH", "CUSTOMER"): ["C_CUSTKEY"], ("TPCH", "NATION"): ["N_NATIONKEY"]},
        f"{tmp}/snap",
        f"{tmp}/ckpt",
    )
    q.awaitTermination(300)

    cust = read_snapshot(spark, f"{tmp}/snap/TPCH.CUSTOMER")
    nat = read_snapshot(spark, f"{tmp}/snap/TPCH.NATION")
    assert sorted((r.C_CUSTKEY, r.C_NAME) for r in cust.collect()) == [(1, "a")]
    assert sorted((r.N_NATIONKEY, r.N_NAME, r.N_COMMENT) for r in nat.collect()) == [
        (10, "FR", "patched"),
        (11, "DE", "c0"),
    ]


def test_snapshot_survives_ddl_schema_evolution(spark, tmp_path):
    """DDL adds a column mid-stream: the snapshot maintainer invalidates the
    registry before that batch's DML materializes (same ordering as the
    change-stream sink) and merge_step backfills the new column as NULL for
    rows last touched under the old schema."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )
    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows

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

    INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'a\')'
    INS3 = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_TIER")'
        " values ({k},'b',7)"
    )
    b1 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="r1"),
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
    for i, rows in enumerate((b1, b2)):
        redo_events_from_rows(spark, rows).coalesce(1).write.parquet(f"{tmp}/s{i}")
        part = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(part, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)

    q = write_snapshot(
        cdc_stream(
            read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
            default_config(),
        ),
        reg,
        "TPCH",
        "CUSTOMER",
        ["C_CUSTKEY"],
        f"{tmp}/snap",
        f"{tmp}/ckpt",
    )
    q.awaitTermination(300)

    snap = read_snapshot(spark, f"{tmp}/snap")
    got = {r.C_CUSTKEY: (r.C_NAME, r.C_TIER) for r in snap.collect()}
    assert got == {1: ("a", None), 2: ("b", 7)}


def test_merge_retry_same_batch_id_is_idempotent(spark, tmp_path):
    """foreachBatch retries re-run with the SAME batch_id: _merge_one_table
    must re-read the same parent (largest version strictly below) and
    overwrite its own output, landing on identical state."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )
    from kafka_connect_logminer2_spark.streaming.snapshot import _merge_one_table

    tmp = str(tmp_path)
    reg = SchemaRegistry()
    mk = lambda name, **kw: ColumnMeta("TPCH", "CUSTOMER", name, True, **kw)
    reg.register(
        [
            mk("C_CUSTKEY", data_type="NUMBER", data_precision=18),
            mk("C_NAME", data_type="VARCHAR2", data_length=25),
        ]
    )

    def batch(rows):
        data = [
            {
                "SCN": scn, "COMMIT_SCN": scn, "OPERATION": op,
                "SEG_OWNER": "TPCH", "TABLE_NAME": "CUSTOMER",
                "SRC_TABLE": "CUSTOMER",
                "data_json": dj, "before_json": bj,
            }
            for scn, op, dj, bj in rows
        ]
        return spark.createDataFrame(
            data,
            "SCN long, COMMIT_SCN long, OPERATION string, SEG_OWNER string,"
            " TABLE_NAME string, SRC_TABLE string, data_json string,"
            " before_json string",
        )

    b0 = batch([(1, "INSERT", '{"C_CUSTKEY": "1", "C_NAME": "a"}', None)])
    b1 = batch([(2, "INSERT", '{"C_CUSTKEY": "2", "C_NAME": "b"}', None)])

    args = (reg, "TPCH", "CUSTOMER", ["C_CUSTKEY"], f"{tmp}/snap", None)
    _merge_one_table(spark, b0, 0, *args)
    _merge_one_table(spark, b1, 1, *args)
    first = _rows_simple(spark, f"{tmp}/snap")
    # retry batch 1: same batch_id, same input — must not duplicate or
    # chain off its own previous output
    _merge_one_table(spark, b1, 1, *args)
    assert _rows_simple(spark, f"{tmp}/snap") == first
    assert first == [(1, "a"), (2, "b")]


def _rows_simple(spark, snap_dir):
    return sorted(
        (r.C_CUSTKEY, r.C_NAME) for r in read_snapshot(spark, snap_dir).collect()
    )


def test_bucketed_snapshot_equals_batch_fold_and_limits_writes(spark, sf_dir, tmp_path):
    """The bucketed layout lands on the same state as the one-shot batch
    fold AND each batch writes only its touched buckets (later batches must
    not have rewritten every bucket)."""
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        read_snapshot_bucketed,
        write_snapshot_bucketed,
    )

    tmp = str(tmp_path)
    keysel = F.split(F.col("xid"), r"\.").getItem(1).cast("long") % 10
    ins = redo_inserts_from_customer(spark, sf_dir)
    upd = redo_updates_from_customer(spark, sf_dir).filter(keysel.isin(0, 1, 2))
    dele = redo_deletes_from_customer(spark, sf_dir).filter(keysel.isin(6, 7))
    redo = ins.unionByName(upd).unionByName(dele)
    expected = _rows(apply_changes(run_cdc_batch(redo), ["C_CUSTKEY"]))

    redo.orderBy("scn").repartitionByRange(6, "scn").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    q = write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
            default_config(),
        ),
        customer_registry(),
        "TPCH",
        "CUSTOMER",
        ["C_CUSTKEY"],
        f"{tmp}/snap",
        f"{tmp}/ckpt",
        num_buckets=8,
    )
    q.awaitTermination(300)

    got = read_snapshot_bucketed(spark, f"{tmp}/snap")
    assert _rows(got) == expected

    # write-amplification check: resume the stream with ONE tiny batch
    # updating exactly two keys — it must rewrite at most two buckets
    # (every other bucket keeps its older version chain untouched)
    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows
    from kafka_connect_logminer2_spark.streaming.snapshot import latest_version

    UPD = (
        'update "TPCH"."CUSTOMER" set "C_ACCTBAL" = 999.99 '
        'where "C_CUSTKEY" = {k} and "C_ACCTBAL" = 0'
    )
    ev = [
        dict(scn=10_000_001, operation="START", xid="Z"),
        dict(scn=10_000_002, operation="UPDATE", xid="Z", table_name="CUSTOMER",
             sql_redo=UPD.format(k=1), row_id="z1"),
        dict(scn=10_000_003, operation="UPDATE", xid="Z", table_name="CUSTOMER",
             sql_redo=UPD.format(k=22), row_id="z2"),
        dict(scn=10_000_004, operation="COMMIT", xid="Z", commit_scn=10_000_004),
    ]
    redo_events_from_rows(spark, ev).coalesce(1).write.parquet(f"{tmp}/tiny")
    part = sorted(glob.glob(f"{tmp}/tiny/part*"))[0]
    shutil.copy(part, f"{tmp}/redo/f9.parquet")
    os.utime(f"{tmp}/redo/f9.parquet", (now + 900,) * 2)

    q2 = write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
            default_config(),
        ),
        customer_registry(),
        "TPCH",
        "CUSTOMER",
        ["C_CUSTKEY"],
        f"{tmp}/snap",
        f"{tmp}/ckpt",
        num_buckets=8,
    )
    q2.awaitTermination(300)

    latest_per_bucket = [
        latest_version(f"{tmp}/snap/{d}")
        for d in sorted(os.listdir(f"{tmp}/snap"))
        if d.startswith("b=")
    ]
    assert len(latest_per_bucket) == 8
    newest = max(latest_per_bucket)
    assert sum(1 for v in latest_per_bucket if v == newest) <= 2

    # patch semantics across the bucketed merge: balance updated, name kept
    final = {
        r.C_CUSTKEY: (r.C_NAME, round(r.C_ACCTBAL, 2))
        for r in read_snapshot_bucketed(spark, f"{tmp}/snap").collect()
        if r.C_CUSTKEY in (1, 22)
    }
    assert final[1][1] == 999.99 and final[22][1] == 999.99
    assert final[1][0] is not None and final[22][0] is not None


def _stage_batches(spark, tmp, batches):
    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows

    os.makedirs(f"{tmp}/redo", exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        redo_events_from_rows(spark, rows).coalesce(1).write.parquet(f"{tmp}/s{i}")
        part = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(part, f"{tmp}/redo/f{i}.parquet")
        os.utime(f"{tmp}/redo/f{i}.parquet", (now + i * 10,) * 2)
    return f"{tmp}/redo"


def test_bucketed_snapshot_ddl_schema_evolution(spark, tmp_path):
    """Add-only DDL mid-stream on the BUCKETED layout: only touched buckets
    are rewritten with the new schema, yet the read must surface the new
    column for every bucket (null-backfilled where the bucket predates the
    DDL) — the _meta.json authoritative-schema alignment, not parquet
    schema inference from an arbitrary bucket file."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        read_snapshot_bucketed,
        write_snapshot_bucketed,
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

    INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'a\')'
    INS3 = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_TIER")'
        " values ({k},'b',7)"
    )
    b1 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="r1"),
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
    path = _stage_batches(spark, tmp, [b1, b2])

    q = write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, path, max_files_per_trigger=1),
            default_config(),
        ),
        reg, "TPCH", "CUSTOMER", ["C_CUSTKEY"],
        f"{tmp}/snap", f"{tmp}/ckpt", num_buckets=8,
    )
    assert q.awaitTermination(300)

    # keys 1 and 2 must hash to different buckets for this to exercise the
    # stale-bucket path; verify the precondition rather than assume it
    from pyspark.sql import Row
    bmap = spark.createDataFrame([Row(C_CUSTKEY=1), Row(C_CUSTKEY=2)]).select(
        "C_CUSTKEY", F.pmod(F.xxhash64("C_CUSTKEY"), F.lit(8)).alias("b")
    ).collect()
    assert len({r.b for r in bmap}) == 2, "fixture keys collide; pick new keys"

    snap = read_snapshot_bucketed(spark, f"{tmp}/snap")
    assert "C_TIER" in snap.columns
    got = {r.C_CUSTKEY: (r.C_NAME, r.C_TIER) for r in snap.collect()}
    assert got == {1: ("a", None), 2: ("b", 7)}


def test_bucketed_compaction_preserves_mixed_ddl_schemas(spark, tmp_path):
    """Compaction's single-job staging read spans stale buckets at DIFFERENT
    batch versions; an add-only DDL between those versions leaves mixed
    parquet file schemas in one read. Without mergeSchema the inferred
    schema comes from an arbitrary file — a column added by the DDL can be
    silently dropped from the buckets that carry it, and the loss is then
    PERSISTED into v=<last> (silent snapshot corruption; null-backfill at
    read time can't recover a value that was thrown away at write time).

    Fixture: b0 inserts keys 1 (bucket 2) and 11 (bucket 7) pre-DDL; b1
    adds C_TIER and inserts key 2 (bucket 5) with tier 7; b2 updates key 11
    only. The stale set is then {bucket 2 @ v0 (no C_TIER in file), bucket
    5 @ v1 (C_TIER=7)} — exactly the mixed-schema staging read."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        ColumnMeta,
        SchemaRegistry,
    )
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        compact_snapshot_bucketed,
        read_snapshot_bucketed,
        write_snapshot_bucketed,
        _last_committed_batch,
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

    INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'a\')'
    INS3 = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_TIER")'
        " values ({k},'b',7)"
    )
    UPD = (
        'update "TPCH"."CUSTOMER" set "C_NAME" = \'z\' '
        'where "C_CUSTKEY" = 11 and "C_NAME" = \'a\''
    )
    # batch 0: pre-DDL inserts → buckets 2 (key 1) and 7 (key 11) at v=0
    b0 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="r1"),
        dict(scn=3, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=11), row_id="r2"),
        dict(scn=4, operation="COMMIT", xid="A", commit_scn=4),
    ]
    # batch 1: DDL + post-DDL insert key 2 → bucket 5 at v=1 WITH C_TIER
    b1 = [
        dict(scn=5, operation="START", xid="D"),
        dict(scn=6, operation="DDL", xid="D", table_name="CUSTOMER",
             sql_redo="alter table TPCH.CUSTOMER add C_TIER number(4)"),
        dict(scn=7, operation="COMMIT", xid="D", commit_scn=7),
        dict(scn=8, operation="START", xid="B"),
        dict(scn=9, operation="INSERT", xid="B", table_name="CUSTOMER",
             sql_redo=INS3.format(k=2), row_id="r3"),
        dict(scn=10, operation="COMMIT", xid="B", commit_scn=10),
    ]
    # batch 2: update key 11 → bucket 7 fresh at v=2; buckets 2 (pre-DDL
    # file schema, no C_TIER) and 5 (post-DDL, C_TIER=7) are the stale mix
    b2 = [
        dict(scn=11, operation="START", xid="C"),
        dict(scn=12, operation="UPDATE", xid="C", table_name="CUSTOMER",
             sql_redo=UPD, row_id="r2"),
        dict(scn=13, operation="COMMIT", xid="C", commit_scn=13),
    ]
    path = _stage_batches(spark, tmp, [b0, b1, b2])
    q = write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, path, max_files_per_trigger=1),
            default_config(),
        ),
        reg, "TPCH", "CUSTOMER", ["C_CUSTKEY"],
        f"{tmp}/snap", f"{tmp}/ckpt", num_buckets=8,
    )
    assert q.awaitTermination(300)

    snap = f"{tmp}/snap"
    last = _last_committed_batch(snap)
    # precondition: the stale set must really mix one pre-DDL and one
    # post-DDL bucket version, with the pre-DDL dir sorting first (the
    # ordering that makes schema inference pick the C_TIER-less file)
    versions = {
        d: latest_version(os.path.join(snap, d), below=last + 1)
        for d in sorted(os.listdir(snap))
        if d.startswith("b=")
    }
    stale = {d: v for d, v in versions.items() if v != last}
    assert sorted(stale.items()) == [("b=2", 0), ("b=5", 1)]

    assert compact_snapshot_bucketed(spark, snap) == last
    got = {
        r.C_CUSTKEY: (r.C_NAME, r.C_TIER)
        for r in read_snapshot_bucketed(spark, f"{tmp}/snap").collect()
    }
    # key 2's C_TIER=7 must survive compaction — the mergeSchema guard
    assert got == {1: ("a", None), 2: ("b", 7), 11: ("z", None)}


def test_bucketed_snapshot_rejects_num_buckets_change(spark, tmp_path):
    """pmod(xxhash64(pk), N) remaps every key if N changes: resuming an
    existing snapshot dir with a different bucket count must fail fast
    instead of stranding stale row copies in old buckets."""
    import pytest as _pytest

    from kafka_connect_logminer2_spark.streaming.snapshot import (
        write_snapshot_bucketed,
    )

    tmp = str(tmp_path)
    INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'x\')'
    b1 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="r1"),
        dict(scn=3, operation="COMMIT", xid="A", commit_scn=3),
    ]
    b2 = [
        dict(scn=4, operation="START", xid="B"),
        dict(scn=5, operation="INSERT", xid="B", table_name="CUSTOMER",
             sql_redo=INS.format(k=2), row_id="r2"),
        dict(scn=6, operation="COMMIT", xid="B", commit_scn=6),
    ]
    path = _stage_batches(spark, tmp, [b1])
    mkq = lambda n, ckpt: write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, path, max_files_per_trigger=1),
            default_config(),
        ),
        customer_registry(), "TPCH", "CUSTOMER", ["C_CUSTKEY"],
        f"{tmp}/snap", f"{tmp}/{ckpt}", num_buckets=n,
    )
    assert mkq(8, "ckpt1").awaitTermination(300)

    # second file arrives; resume with a DIFFERENT bucket count -> the batch
    # must error out (StreamingQueryException wrapping the ValueError)
    now = time.time()
    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows
    redo_events_from_rows(spark, b2).coalesce(1).write.parquet(f"{tmp}/s9")
    part = sorted(glob.glob(f"{tmp}/s9/part*"))[0]
    shutil.copy(part, f"{tmp}/redo/f9.parquet")
    os.utime(f"{tmp}/redo/f9.parquet", (now + 900,) * 2)

    q = mkq(4, "ckpt2")
    with _pytest.raises(Exception, match="num_buckets"):
        q.awaitTermination(300)
        raise AssertionError("resume with different num_buckets did not fail")


def test_bucketed_snapshot_uncommitted_batch_invisible(spark, tmp_path):
    """A crash after SOME buckets wrote v=N but before the batch commit
    marker must not be observable: read_snapshot_bucketed only surfaces
    versions <= the last fully-committed batch."""
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        read_snapshot_bucketed,
        write_snapshot_bucketed,
    )

    tmp = str(tmp_path)
    INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values ({k},\'x\')'
    b1 = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="r1"),
        dict(scn=3, operation="COMMIT", xid="A", commit_scn=3),
    ]
    path = _stage_batches(spark, tmp, [b1])
    q = write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, path, max_files_per_trigger=1),
            default_config(),
        ),
        customer_registry(), "TPCH", "CUSTOMER", ["C_CUSTKEY"],
        f"{tmp}/snap", f"{tmp}/ckpt", num_buckets=4,
    )
    assert q.awaitTermination(300)
    before = {r.C_CUSTKEY for r in read_snapshot_bucketed(spark, f"{tmp}/snap").collect()}
    assert before == {1}

    # simulate a torn later batch: one bucket gains v=99 with extra data but
    # no batch-level commit marker is written
    committed = read_snapshot_bucketed(spark, f"{tmp}/snap")
    bdir = next(
        f"{tmp}/snap/{d}" for d in sorted(os.listdir(f"{tmp}/snap")) if d.startswith("b=")
    )
    committed.limit(0).unionByName(
        committed.withColumn("C_CUSTKEY", F.lit(777).cast("long"))
    ).write.mode("overwrite").parquet(f"{bdir}/v=99")

    after = {r.C_CUSTKEY for r in read_snapshot_bucketed(spark, f"{tmp}/snap").collect()}
    assert after == {1}, "uncommitted bucket version leaked into the read"


def test_bucketed_compaction_uniform_version_same_state(spark, sf_dir, tmp_path):
    """compact_snapshot_bucketed brings every stale bucket to the last
    committed version id: after it, (a) all data-bearing buckets share one
    version — the single-glob fast path in read_snapshot_bucketed (one
    FileIndex root instead of an N-path union; at 1k buckets the union is
    2.3x slower cold locally and N object-store LISTs at scale,
    BASELINE.md) — and (b) the visible state is BIT-IDENTICAL to the
    pre-compaction read, with older versions left in place for time
    travel."""
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        compact_snapshot_bucketed,
        latest_version,
        read_snapshot_bucketed,
        write_snapshot_bucketed,
        _last_committed_batch,
    )

    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows

    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    # batch 0: every bucket written; batch 1: a two-key update — only its
    # buckets advance, scattering per-bucket latest versions
    redo_inserts_from_customer(spark, sf_dir).coalesce(1).write.parquet(f"{tmp}/s0")
    UPD = (
        'update "TPCH"."CUSTOMER" set "C_ACCTBAL" = 777.77 '
        'where "C_CUSTKEY" = {k} and "C_ACCTBAL" = 0'
    )
    redo_events_from_rows(
        spark,
        [
            dict(scn=10_000_001, operation="START", xid="Z"),
            dict(scn=10_000_002, operation="UPDATE", xid="Z", table_name="CUSTOMER",
                 sql_redo=UPD.format(k=1), row_id="z1"),
            dict(scn=10_000_003, operation="UPDATE", xid="Z", table_name="CUSTOMER",
                 sql_redo=UPD.format(k=22), row_id="z2"),
            dict(scn=10_000_004, operation="COMMIT", xid="Z", commit_scn=10_000_004),
        ],
    ).coalesce(1).write.parquet(f"{tmp}/s1")
    for i, stage in enumerate(("s0", "s1")):
        part = sorted(glob.glob(f"{tmp}/{stage}/part*"))[0]
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    q = write_snapshot_bucketed(
        cdc_stream(
            read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
            default_config(),
        ),
        customer_registry(),
        "TPCH",
        "CUSTOMER",
        ["C_CUSTKEY"],
        f"{tmp}/snap",
        f"{tmp}/ckpt",
        num_buckets=8,
    )
    assert q.awaitTermination(300)

    snap = f"{tmp}/snap"
    last = _last_committed_batch(snap)
    bdirs = [d for d in sorted(os.listdir(snap)) if d.startswith("b=")]
    before_versions = {
        d: latest_version(os.path.join(snap, d), below=last + 1) for d in bdirs
    }
    # the multi-batch stream must actually have scattered the versions —
    # otherwise this test exercises nothing
    assert len(set(before_versions.values())) > 1
    before = _rows(read_snapshot_bucketed(spark, snap))

    got = compact_snapshot_bucketed(spark, snap)
    assert got == last
    after_versions = {
        d: latest_version(os.path.join(snap, d), below=last + 1) for d in bdirs
    }
    assert set(after_versions.values()) == {last}
    # glob fast path returns the identical state
    assert _rows(read_snapshot_bucketed(spark, snap)) == before
    # history preserved: every bucket that was stale still has its old version
    for d, v in before_versions.items():
        if v != last:
            assert os.path.isdir(os.path.join(snap, d, f"v={v}"))
    # idempotent
    assert compact_snapshot_bucketed(spark, snap) == last
    assert _rows(read_snapshot_bucketed(spark, snap)) == before


def test_bucketed_read_guards_bv_column_collision(spark, tmp_path):
    """A value schema that itself contains a column named ``b`` or ``v``
    must NOT take the glob fast path (hive-style discovery of the b=/v=
    dirs would collide with the data column); the N-path union has no
    discovery and reads it fine. Synthetic layout: uniform versions WITH a
    'v' value column — the collision case on the fast-path trigger."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_logminer2_spark.streaming.snapshot import (
        _mark_committed,
        _write_meta,
        read_snapshot_bucketed,
    )

    base = str(tmp_path / "snap")
    tbl = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                    "v": pa.array(["a", "b"])})
    for b in range(4):
        d = f"{base}/b={b}/v=3"
        os.makedirs(d)
        pq.write_table(tbl, f"{d}/part-0.parquet")
        open(f"{d}/_SUCCESS", "w").close()
    _write_meta(base, {
        "num_buckets": 4,
        "schema": {"type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ]},
    })
    _mark_committed(base, 3)

    got = read_snapshot_bucketed(spark, base)
    rows = sorted(map(tuple, got.collect()))
    assert rows == sorted([(1, "a"), (2, "b")] * 4)
