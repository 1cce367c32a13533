"""Connector lifecycle facade (connector.py): a reference user's entry
surface — properties-map validation, offset resolution, run manifest,
status bookkeeping, stream start/stop, and the CM batch fork — wired
end-to-end against the synthetic redo fixtures."""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pytest

from kafka_connect_logminer2_spark.connector import ConfigError, LogMinerConnector
from kafka_connect_logminer2_spark.plans.cdc import customer_registry, run_cdc_batch
from kafka_connect_logminer2_spark.sources.redo import (
    redo_cm_inserts_from_customer,
    redo_inserts_from_customer,
)

PROPS = {
    "name": "logminer",
    "db.name": "ORCLCDB",
    "db.name.alias": "orcl",
    "table.whitelist": "TPCH.*",
    "db.fetch.size": "1000",
}


def test_missing_required_props_rejected(spark):
    with pytest.raises(ConfigError, match="table.whitelist"):
        LogMinerConnector({"db.name": "X"}, spark)
    with pytest.raises(ConfigError, match="db.name"):
        LogMinerConnector({"table.whitelist": "A.*"}, spark)


def _stage(spark, redo, tmp, n_files=3):
    redo.orderBy("scn").repartitionByRange(n_files, "scn").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return f"{tmp}/redo"


@pytest.mark.parametrize("assembler", ["fb", "apply"])
def test_connector_start_to_typed_sink(spark, sf_dir, tmp_path, assembler):
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp)

    conn = LogMinerConnector(PROPS, spark)
    q = conn.start(
        path,
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        assembler=assembler,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(300)
    conn.stop()

    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    want = run_cdc_batch(redo)
    assert got.count() == want.count() > 0

    # A20 run manifest written with the serialized config and resolved SCN
    runs = spark.read.parquet(f"{tmp}/out/_meta/runs")
    r = runs.collect()[0]
    assert r["connector"] == "logminer" and r["status"] == "RUNNING"
    assert json.loads(r["config_json"])["table_whitelist"] == "TPCH.*"
    # A21 status log saw the query start and stop (not fail)
    lines = [
        json.loads(line)
        for line in open(f"{tmp}/out/_meta/status.jsonl")
    ]
    events = [line["event"] for line in lines]
    assert "STARTED" in events and "STOPPED" in events and "FAILED" not in events


def test_connector_resume_skips_delivered_scns(spark, sf_dir, tmp_path):
    """A3+A4: starting with a stored offset must deliver only SCNs beyond
    it (the reference's skip-replay loop on resume)."""
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp)

    cutoff = 1500  # somewhere inside the SCN range
    conn = LogMinerConnector(PROPS, spark)
    q = conn.start(
        path,
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        stored_offset=cutoff,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(300)
    conn.stop()
    assert conn.resolved.source == "stored" and conn.resolved.scn == cutoff

    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    assert got.count() > 0
    assert got.agg({"SCN": "min"}).collect()[0][0] > cutoff


def test_using_cm_config_key_parses(spark):
    from kafka_connect_logminer2_spark.config import EngineConfig

    assert EngineConfig.from_connect_map({"using.cm": "true"}).using_cm is True
    assert EngineConfig.from_connect_map({"using.cm": "false"}).using_cm is False
    assert EngineConfig().using_cm is False


def test_cm_fork_decision_matches_reference():
    """cm_path_selected mirrors OracleSourceTask2.java:127-131 exactly:
    CM only when using.cm AND version < 190000 (OracleConnectorSchema.java:
    65); the version number is the probe SQL's to_number(replace(...))."""
    from kafka_connect_logminer2_spark.config import EngineConfig
    from kafka_connect_logminer2_spark.connector import (
        cm_path_selected,
        db_version_number,
    )

    assert db_version_number("18.4.0.0.0") == 184000
    assert db_version_number("19.0.0.0.0") == 190000
    on, off = EngineConfig(using_cm=True), EngineConfig(using_cm=False)
    assert cm_path_selected(on, 184000) is True
    assert cm_path_selected(on, 190000) is False  # de-supported at 19c
    assert cm_path_selected(on, None) is True  # no probe → trust the flag
    assert cm_path_selected(off, 184000) is False
    assert cm_path_selected(off, None) is False


def test_connector_start_using_cm_routes_batch_path(spark, sf_dir, tmp_path):
    """using.cm=true + pre-19c version: start() itself must route the CM
    bounded batch (config-driven, not method-selected — the reference's
    fork is in task start), landing the same per-table typed sink the
    streaming path writes and returning an already-terminal handle."""
    tmp = str(tmp_path)
    redo_cm = redo_cm_inserts_from_customer(spark, sf_dir)
    os.makedirs(f"{tmp}/redo")
    redo_cm.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/redo")

    conn = LogMinerConnector({**PROPS, "using.cm": "true"}, spark)
    q = conn.start(
        f"{tmp}/redo",
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        db_version="18.4.0.0.0",
    )
    assert q.awaitTermination(300) and not q.isActive
    conn.stop()

    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    want = run_cdc_batch(redo_inserts_from_customer(spark, sf_dir))
    a = sorted((r.SCN, r.data["C_CUSTKEY"]) for r in got.collect())
    b = sorted((r.SCN, r.data["C_CUSTKEY"]) for r in want.collect())
    assert a == b and len(a) > 0


def test_connector_cm_rerun_is_idempotent(spark, sf_dir, tmp_path):
    """A re-run CM start() with the same offsets (crash-recovery, manual
    retry) must land byte-identical sinks — never append duplicates."""
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")
    redo_cm_inserts_from_customer(spark, sf_dir).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/redo")
    conn = LogMinerConnector({**PROPS, "using.cm": "true"}, spark)
    for _ in range(2):
        q = conn.start(
            f"{tmp}/redo", customer_registry(), f"{tmp}/out", f"{tmp}/ckpt",
            db_version="18.4.0.0.0",
        )
        assert q.awaitTermination(300)
    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    want = run_cdc_batch(redo_inserts_from_customer(spark, sf_dir))
    assert got.count() == want.count() > 0  # no duplication across runs


def test_connector_cm_ddl_invalidates_before_typing(spark, tmp_path):
    """DDL-first ordering on the CM fork: an ALTER ADD mid-log must
    invalidate the cached schema BEFORE the same run's DML is typed, so
    the new column's values land instead of being silently dropped."""
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
    reg.register(v1)  # stale pre-DDL schema already cached
    reg._loader = lambda o, t: v2 if (o, t) == ("TPCH", "CUSTOMER") else None

    INS3 = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_TIER")'
        " values (1,'a',7)"
    )
    rows = [
        dict(scn=2, operation="DDL", xid="D", table_name="CUSTOMER",
             commit_scn=2,
             sql_redo="alter table TPCH.CUSTOMER add C_TIER number(4)"),
        dict(scn=3, operation="INSERT", xid="B", table_name="CUSTOMER",
             commit_scn=4, sql_redo=INS3, row_id="r1"),
    ]
    os.makedirs(f"{tmp}/redo")
    redo_events_from_rows(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/redo"
    )
    conn = LogMinerConnector({**PROPS, "using.cm": "true"}, spark)
    q = conn.start(
        f"{tmp}/redo", reg, f"{tmp}/out", f"{tmp}/ckpt", db_version="18.4.0.0.0"
    )
    assert q.awaitTermination(300)
    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER").collect()
    assert [(r.data["C_CUSTKEY"], r.data["C_TIER"]) for r in got] == [(1, 7)]


def test_connector_cm_path_respects_stored_offset(spark, sf_dir, tmp_path):
    """A3+A4 on the CM fork: a stored offset must bound the bounded batch
    exactly like the streaming path — only SCNs beyond it land."""
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")
    redo_cm_inserts_from_customer(spark, sf_dir).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/redo")

    cutoff = 1500
    conn = LogMinerConnector({**PROPS, "using.cm": "true"}, spark)
    q = conn.start(
        f"{tmp}/redo",
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        stored_offset=cutoff,
        db_version="12.2.0.1.0",
    )
    assert q.awaitTermination(300)
    assert conn.resolved.source == "stored" and conn.resolved.scn == cutoff
    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    assert got.count() > 0
    assert got.agg({"SCN": "min"}).collect()[0][0] > cutoff


def test_connector_start_using_cm_desupported_version_streams(spark, sf_dir, tmp_path):
    """using.cm=true but version ≥ 19c: the reference logs CM de-supported
    and takes the non-CM path — start() must do the same (streaming
    assembly, real StreamingQuery)."""
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp)

    conn = LogMinerConnector({**PROPS, "using.cm": "true"}, spark)
    q = conn.start(
        path,
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        db_version="19.0.0.0.0",
    )
    assert q.awaitTermination(300)
    conn.stop()
    got = spark.read.parquet(f"{tmp}/out/TPCH.CUSTOMER")
    assert got.count() == run_cdc_batch(redo).count() > 0


def test_connector_cm_fork_matches_batch(spark, sf_dir):
    """The CM path (Oracle <19c): no assembly, straight filters → parse →
    envelope → typed — must agree with the non-CM batch pipeline on the
    scenario's committed inserts."""
    conn = LogMinerConnector(PROPS, spark)
    cm = conn.run_cm_batch(
        redo_cm_inserts_from_customer(spark, sf_dir),
        customer_registry(),
        "TPCH",
        "CUSTOMER",
    )
    want = run_cdc_batch(redo_inserts_from_customer(spark, sf_dir))
    a = sorted((r.SCN, r.data["C_CUSTKEY"]) for r in cm.collect())
    b = sorted((r.SCN, r.data["C_CUSTKEY"]) for r in want.collect())
    assert a == b and len(a) > 0


def test_connector_kafka_sink_routes_by_topic_column(spark, sf_dir, tmp_path):
    """start_kafka drives the reference's ACTUAL output shape end to end:
    redo stream → assembly → envelope → (key, value, topic) records, with
    A18's per-table routing carried by the topic column. Brokerless: the
    memory sink receives the identical projection the Kafka sink would
    serialize — every record must land under ORCL.TPCH.CUSTOMER with a
    change-identity key and the 11-field envelope value."""
    tmp = str(tmp_path)
    redo = redo_inserts_from_customer(spark, sf_dir)
    path = _stage(spark, redo, tmp)

    conn = LogMinerConnector(PROPS, spark)
    q = conn.start_kafka(
        path,
        bootstrap_servers="broker1:9092",
        checkpoint_dir=f"{tmp}/ckpt",
        meta_dir=f"{tmp}/meta",
        max_files_per_trigger=1,
        _sink_format="memory",
        _query_name="kafka_mock_sink",
    )
    assert q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM kafka_mock_sink").collect()
    conn.stop()

    want = run_cdc_batch(redo).count()
    assert len(rows) == want > 0
    assert {r["topic"] for r in rows} == {"ORCL.TPCH.CUSTOMER"}
    k = json.loads(rows[0]["key"])
    assert k["owner"] == "TPCH" and k["table"] == "CUSTOMER"
    v = json.loads(rows[0]["value"])
    assert v["OPERATION"] in ("INSERT", "UPDATE", "DELETE")
    assert v["CONNECTOR"] == "logminer"
    # the run manifest + status log fire for this mode too (A20/A21)
    assert spark.read.parquet(f"{tmp}/meta/runs").count() == 1
