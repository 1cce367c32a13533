"""Envelope projection + dynamic topic routing — reference operators A14, A18.

The envelope is the engine's output type (SURVEY §1.2): the 11-field change
record built by setValueV2 (LogMinerThread2.java:360-375) with ``data`` /
``before`` images. In the Spark core the images travel as JSON strings
(fixed stream schema); typed per-table structs are applied at materialization
(schema_registry.apply_table_schema).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import EngineConfig
from .parse import make_parse_udf

# OracleConnectorSchema.java:66
DDL_TOPIC_POSTFIX = "_GENERIC_DDL"

ENVELOPE_COLUMNS = [
    "CONNECTOR",
    "SCN",
    "COMMIT_SCN",
    "ROW_ID",
    "SEG_OWNER",
    "TABLE_NAME",
    "TIMESTAMP",
    "SQL_REDO",
    "OPERATION",
    "data_json",
    "before_json",
    "topic",
]


def topic_column(config: EngineConfig) -> Column:
    """A18: topic = explicit config, else upper(dbalias.owner.table), with DDL
    events routed to ``dbalias.owner._GENERIC_DDL``
    (LogMinerThread2.java:275, OracleSourceTask2.java:286).
    """
    if config.topic:
        return F.lit(config.topic)
    table = F.when(F.col("operation") == "DDL", F.lit(DDL_TOPIC_POSTFIX)).otherwise(
        F.col("table_name")
    )
    return F.upper(F.concat_ws(".", F.lit(config.db_name_alias), F.col("seg_owner"), table))


def kafka_records(envelope: DataFrame, config: EngineConfig) -> DataFrame:
    """Project envelope rows into the Kafka sink's native contract — the
    SourceRecord analog (OracleSourceTask2.java:300): ``key`` (change
    identity: owner/table/row_id, so per-row compaction works), ``value``
    (the full JSON envelope), ``topic`` (dynamic per-table routing A18 —
    Spark's Kafka sink honors a ``topic`` column natively). Usage:
    ``kafka_records(env, cfg).write.format("kafka").option(...)``; no broker
    needed to test the projection itself."""
    return envelope.select(
        F.to_json(
            F.struct(
                F.col("SEG_OWNER").alias("owner"),
                F.col("TABLE_NAME").alias("table"),
                F.col("ROW_ID").alias("row_id"),
            )
        ).alias("key"),
        F.to_json(
            F.struct(
                "CONNECTOR", "SCN", "COMMIT_SCN", "ROW_ID", "SEG_OWNER",
                "TABLE_NAME", "TIMESTAMP", "SQL_REDO", "OPERATION",
                "data_json", "before_json",
            )
        ).alias("value"),
        F.col("topic"),
    )


def to_envelope(
    dml_rows: DataFrame, config: EngineConfig, drop_unparseable: bool = True
) -> DataFrame:
    """A10+A13+A14: parse committed DML rows and project the envelope.

    Parsing happens here — post-commit, like the reference (createRecords is
    called from the COMMIT branch, LogMinerThread2.java:339-343).
    DDL rows keep the envelope with null images and TABLE_NAME rewritten to
    ``_GENERIC_DDL`` (createRecords :341).

    ``drop_unparseable`` mirrors the reference's record-level tolerance: a
    record whose redo SQL fails to parse is skipped, not emitted
    (LogMinerThread2.java:225-228 catches the create error and continues).
    """
    parse = make_parse_udf(config.map_unescaped_strings)
    parsed = dml_rows.withColumn("_p", parse(F.col("operation"), F.col("sql_redo")))

    is_ddl = F.col("operation") == "DDL"
    if drop_unparseable:
        ok = (
            F.when(F.col("operation") == "INSERT", F.col("_p.data_json").isNotNull())
            .when(F.col("operation") == "UPDATE", F.col("_p.data_json").isNotNull())
            .when(F.col("operation") == "DELETE", F.col("_p.before_json").isNotNull())
            .otherwise(F.lit(True))  # DDL and control rows pass
        )
        parsed = parsed.filter(ok)
    return parsed.select(
        F.lit(config.name).alias("CONNECTOR"),
        F.col("scn").cast("long").alias("SCN"),
        F.col("commit_scn").cast("long").alias("COMMIT_SCN"),
        F.col("row_id").alias("ROW_ID"),
        F.col("seg_owner").alias("SEG_OWNER"),
        F.when(is_ddl, F.lit(DDL_TOPIC_POSTFIX)).otherwise(F.col("table_name")).alias("TABLE_NAME"),
        # engine-internal (not in the reference's 11-field value schema): the
        # un-rewritten table name, so the sink can invalidate the DDL'd
        # table's schema — the reference invalidates by real owner.table
        # (OracleSourceConnectorUtils2.java:368-371) BEFORE the record-level
        # _GENERIC_DDL rewrite; with only TABLE_NAME the sink would pop the
        # wrong key and DDL would never trigger a reload
        F.col("table_name").alias("SRC_TABLE"),
        F.col("timestamp").alias("TIMESTAMP"),
        F.col("sql_redo").alias("SQL_REDO"),
        F.col("operation").alias("OPERATION"),
        F.col("_p.data_json").alias("data_json"),
        F.col("_p.before_json").alias("before_json"),
        topic_column(config).alias("topic"),
    )
