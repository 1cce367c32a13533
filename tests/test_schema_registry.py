"""Schema registry tests: NUMBER precision ladder, nullability, DDL
invalidation, dictionary-DataFrame loading, typed materialization coercions."""

from __future__ import annotations

from pyspark.sql.types import (
    ByteType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
)

from kafka_connect_logminer2_spark.operators.schema_registry import (
    ColumnMeta,
    SchemaRegistry,
)


def meta(dt, precision=0, scale=0):
    return ColumnMeta("O", "T", "C", True, dt, 0, scale, precision)


def test_number_ladder():
    # OracleSourceConnectorUtils2.java:191-217
    assert isinstance(meta("NUMBER", 2).spark_type(), ByteType)
    assert isinstance(meta("NUMBER", 4).spark_type(), ShortType)
    assert isinstance(meta("NUMBER", 9).spark_type(), IntegerType)
    assert isinstance(meta("NUMBER", 18).spark_type(), LongType)
    assert isinstance(meta("NUMBER", 10, 2).spark_type(), DoubleType)  # scale>0
    assert isinstance(meta("NUMBER", 0).spark_type(), DoubleType)  # p unspecified


def test_text_and_time_types():
    for t in ("CHAR", "VARCHAR2", "NVARCHAR2", "LONG", "CLOB"):
        assert isinstance(meta(t).spark_type(), StringType)
    assert isinstance(meta("DATE").spark_type(), TimestampNTZType)
    assert isinstance(meta("TIMESTAMP(6)").spark_type(), TimestampNTZType)  # collapses (:183)
    assert isinstance(meta("BLOB").spark_type(), StringType)  # fallback (:238-240)


def test_ddl_invalidation():
    reg = SchemaRegistry()
    reg.register([ColumnMeta("O", "T", "A", True, "NUMBER", data_precision=9)])
    assert reg.has("O", "T")
    reg.invalidate("O", "T")
    assert not reg.has("O", "T")


def test_load_from_dictionary_df(spark):
    rows = [
        dict(owner="O", table_name="T", column_name="B", column_id=2, nullable="Y",
             data_type="VARCHAR2", data_length=10, data_scale=0, data_precision=0,
             pk_column=0, uq_column=1),
        dict(owner="O", table_name="T", column_name="A", column_id=1, nullable="N",
             data_type="NUMBER", data_length=22, data_scale=0, data_precision=18,
             pk_column=1, uq_column=0),
    ]
    reg = SchemaRegistry()
    reg.load_from_dictionary(spark.createDataFrame(rows), "O", "T")
    st = reg.struct_type("O", "T")
    # ordered by COLUMN_ID like the dictionary query's ORDER BY
    assert [f.name for f in st.fields] == ["A", "B"]
    assert isinstance(st.fields[0].dataType, LongType)
    assert st.fields[0].nullable is False
    assert reg.columns("O", "T")[0].pk_column is True


def _dict_rows(con_id=None):
    rows = [
        dict(owner="TPCH", table_name="CUSTOMER", column_name="C_CUSTKEY",
             column_id=1, nullable="N", data_type="NUMBER", data_length=22,
             data_scale=0, data_precision=18, pk_column=1, uq_column=0),
        dict(owner="TPCH", table_name="CUSTOMER", column_name="C_ACCTBAL",
             column_id=2, nullable="Y", data_type="NUMBER", data_length=22,
             data_scale=2, data_precision=12, pk_column=0, uq_column=0),
    ]
    if con_id is not None:
        for r in rows:
            r["con_id"] = con_id
    return rows


def test_dictionary_loader_single_tenant(spark):
    """Single-tenant fork: TABLE_WITH_COLS shape (no con_id), lazy load
    through ensure (OracleConnectorSQL2.java:13)."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        dictionary_loader,
    )

    d = spark.createDataFrame(_dict_rows())
    reg = SchemaRegistry(loader=dictionary_loader(d, multitenant=False))
    assert not reg.has("TPCH", "CUSTOMER")
    assert reg.ensure("TPCH", "CUSTOMER")
    assert isinstance(reg.struct_type("TPCH", "CUSTOMER")["C_CUSTKEY"].dataType, LongType)
    assert not reg.ensure("TPCH", "NOPE")  # unknown table: loader returns None


def test_dictionary_loader_cdb_prunes_con_id(spark):
    """CDB fork (OracleConnectorSQL2.java:15): same OWNER.TABLE in two
    containers; the loader must serve ONLY the connector's container."""
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        dictionary_loader,
    )

    decoy = _dict_rows(con_id=4)
    decoy[1]["data_type"] = "VARCHAR2"  # conflicting type in the other PDB
    decoy[1]["data_precision"] = 0
    d = spark.createDataFrame(_dict_rows(con_id=3) + decoy)
    reg = SchemaRegistry(loader=dictionary_loader(d, multitenant=True, con_id=3))
    assert reg.ensure("TPCH", "CUSTOMER")
    cols = reg.columns("TPCH", "CUSTOMER")
    assert len(cols) == 2  # con_id 4's rows never interleave
    assert isinstance(reg.struct_type("TPCH", "CUSTOMER")["C_ACCTBAL"].dataType, DoubleType)


def test_dictionary_loader_consumes_engine_config(spark):
    """The flag is threaded from EngineConfig (r9 verdict #1 — the key was
    accepted but inert): config.multitenant picks the relation contract."""
    from kafka_connect_logminer2_spark.config import EngineConfig
    from kafka_connect_logminer2_spark.operators.schema_registry import (
        dictionary_loader,
    )

    cdb = spark.createDataFrame(_dict_rows(con_id=3))
    reg = SchemaRegistry(
        loader=dictionary_loader(cdb, EngineConfig(multitenant=True), con_id=3)
    )
    assert reg.ensure("TPCH", "CUSTOMER")


def test_dictionary_loader_guards(spark):
    """Loud in both directions: CDB shape without the flag would interleave
    every container's same-named tables; the flag without con_id (or
    without a CDB-shaped relation) cannot pick a container."""
    import pytest

    from kafka_connect_logminer2_spark.operators.schema_registry import (
        dictionary_loader,
    )

    single = spark.createDataFrame(_dict_rows())
    cdb = spark.createDataFrame(_dict_rows(con_id=3))
    with pytest.raises(ValueError, match="multitenant"):
        dictionary_loader(cdb, multitenant=False)
    with pytest.raises(ValueError, match="con_id"):
        dictionary_loader(single, multitenant=True, con_id=3)
    with pytest.raises(ValueError, match="con_id"):
        dictionary_loader(cdb, multitenant=True)


def test_apply_table_schema_lazy_ensure(spark):
    """apply_table_schema consults the loader on a cold registry (the
    reference's load-dictionary-on-demand, :156-252) and raises a clear
    KeyError when no dictionary can serve the table."""
    import pytest

    from kafka_connect_logminer2_spark.operators.schema_registry import (
        apply_table_schema,
        dictionary_loader,
    )

    d = spark.createDataFrame(_dict_rows())
    env = spark.createDataFrame(
        [("TPCH", "CUSTOMER", '{"C_CUSTKEY": "7", "C_ACCTBAL": "1.25"}', None)],
        "SEG_OWNER: string, TABLE_NAME: string, data_json: string, before_json: string",
    )
    reg = SchemaRegistry(loader=dictionary_loader(d))
    row = apply_table_schema(env, reg, "TPCH", "CUSTOMER").first()
    assert row["data"]["C_CUSTKEY"] == 7
    with pytest.raises(KeyError, match="ORDERS"):
        apply_table_schema(env, reg, "TPCH", "ORDERS")


def test_decimal_opt_in_mode(spark):
    """SURVEY §1.3: FLOAT64 reference semantics by default (hash-matching),
    DecimalType(p,s) precision-preserving opt-in."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType, DoubleType

    from kafka_connect_logminer2_spark.operators.schema_registry import (
        apply_table_schema,
    )
    from kafka_connect_logminer2_spark.plans.cdc import customer_registry

    reg = customer_registry()
    assert isinstance(
        reg.struct_type("TPCH", "CUSTOMER")["C_ACCTBAL"].dataType, DoubleType
    )
    dec = reg.struct_type("TPCH", "CUSTOMER", float64_numbers=False)["C_ACCTBAL"]
    assert dec.dataType == DecimalType(12, 2)

    env = spark.createDataFrame(
        [("TPCH", "CUSTOMER", '{"C_CUSTKEY": "1", "C_ACCTBAL": "1234.56"}', None)],
        "SEG_OWNER: string, TABLE_NAME: string, data_json: string, before_json: string",
    )
    row = apply_table_schema(env, reg, "TPCH", "CUSTOMER", float64_numbers=False).first()
    assert row["data"]["C_ACCTBAL"] == Decimal("1234.56")
    row64 = apply_table_schema(env, reg, "TPCH", "CUSTOMER").first()
    assert abs(row64["data"]["C_ACCTBAL"] - 1234.56) < 1e-9
