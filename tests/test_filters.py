"""Filter operator tests: whitelist/blacklist compile, source predicate,
junk rows, dml.types, skip-replay, envelope topic routing, config parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.config import EngineConfig
from kafka_connect_logminer2_spark.operators.envelope import to_envelope, topic_column
from kafka_connect_logminer2_spark.operators.filters import (
    compile_table_predicate,
    dml_types_predicate,
    junk_row_predicate,
    skip_replay,
    source_predicate,
)
from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows


def _tables_df(spark):
    return spark.createDataFrame(
        [("TPCH", "CUSTOMER"), ("TPCH", "ORDERS"), ("HR", "EMP"), ("SYS", "AUD$")],
        "seg_owner: string, table_name: string",
    )


def test_whitelist_exact_and_wildcard(spark):
    df = _tables_df(spark)
    got = df.filter(compile_table_predicate("TPCH.CUSTOMER,HR.*")).collect()
    assert {(r[0], r[1]) for r in got} == {("TPCH", "CUSTOMER"), ("HR", "EMP")}


def test_blacklist(spark):
    df = _tables_df(spark)
    got = df.filter(compile_table_predicate("TPCH.*", "TPCH.ORDERS")).collect()
    assert {(r[0], r[1]) for r in got} == {("TPCH", "CUSTOMER")}


def test_source_predicate_control_vs_dml(spark):
    rows = [
        dict(scn=1, operation="COMMIT", xid="A", username="APP"),
        dict(scn=2, operation="COMMIT", xid="A", username="SYS"),  # excluded user
        dict(scn=3, operation="INSERT", xid="A", seg_owner="TPCH", table_name="CUSTOMER", sql_redo="x"),
        dict(scn=4, operation="INSERT", xid="A", seg_owner="HR", table_name="EMP", sql_redo="x"),
    ]
    df = redo_events_from_rows(spark, rows)
    got = df.filter(source_predicate("TPCH.*")).select("scn").collect()
    assert sorted(r[0] for r in got) == [1, 3]


def test_min_scn_bound(spark):
    rows = [
        dict(scn=5, operation="INSERT", xid="A", seg_owner="TPCH", table_name="C", sql_redo="x"),
        dict(scn=6, operation="INSERT", xid="A", seg_owner="TPCH", table_name="C", sql_redo="x"),
    ]
    df = redo_events_from_rows(spark, rows)
    got = df.filter(source_predicate("TPCH.*", min_scn=5)).select("scn").collect()
    assert [r[0] for r in got] == [6]


def test_dml_types(spark):
    rows = [
        dict(scn=1, operation="INSERT", xid="A"),
        dict(scn=2, operation="DELETE", xid="A"),
        dict(scn=3, operation="DDL", xid="A"),
    ]
    df = redo_events_from_rows(spark, rows)
    got = df.filter(dml_types_predicate({"INSERT", "UPDATE"})).select("operation").collect()
    assert {r[0] for r in got} == {"INSERT", "DDL"}  # DDL always passes


def test_skip_replay(spark):
    rows = [
        dict(scn=1, operation="INSERT", xid="A", row_id="r1"),
        dict(scn=2, operation="INSERT", xid="A", row_id="r2"),
        dict(scn=2, operation="INSERT", xid="A", row_id="r2"),  # source replay dup
    ]
    df = redo_events_from_rows(spark, rows)
    assert skip_replay(df, last_scn=1).count() == 1


def test_topic_routing(spark):
    cfg = EngineConfig(name="cdc1", db_name_alias="orcl", table_whitelist="TPCH.*")
    rows = [
        dict(scn=1, operation="INSERT", xid="A", seg_owner="TPCH", table_name="Cust",
             commit_scn=1, sql_redo='insert into "TPCH"."Cust"("A") values (1)'),
        dict(scn=2, operation="DDL", xid="A", seg_owner="TPCH", table_name="Cust", commit_scn=1),
    ]
    df = redo_events_from_rows(spark, rows).withColumn("commit_timestamp", F.col("timestamp"))
    got = {r["OPERATION"]: r["topic"] for r in to_envelope(df, cfg).collect()}
    assert got["INSERT"] == "ORCL.TPCH.CUST"
    assert got["DDL"] == "ORCL.TPCH._GENERIC_DDL"
    # explicit topic config overrides routing (A18)
    cfg2 = EngineConfig(topic="fixed.topic")
    got2 = {r["topic"] for r in to_envelope(df, cfg2).collect()}
    assert got2 == {"fixed.topic"}


def test_ddl_table_name_rewrite(spark):
    cfg = EngineConfig(name="c", db_name_alias="d")
    rows = [dict(scn=1, operation="DDL", xid="A", seg_owner="S", table_name="T", commit_scn=1)]
    df = redo_events_from_rows(spark, rows)
    r = to_envelope(df, cfg).first()
    assert r["TABLE_NAME"] == "_GENERIC_DDL"
    assert r["data_json"] is None and r["before_json"] is None


def test_config_from_connect_map():
    cfg = EngineConfig.from_connect_map(
        {
            "name": "conn1",
            "db.name.alias": "orcl",
            "table.whitelist": "TPCH.*",
            "parse.dml.data": "true",
            "db.fetch.size": "500",
            "dml.types": "INSERT,UPDATE",
            "reset.offset": "false",
        }
    )
    assert cfg.name == "conn1"
    assert cfg.db_fetch_size == 500
    assert cfg.dml_type_set() == {"INSERT", "UPDATE"}
    assert cfg.reset_offset is False
