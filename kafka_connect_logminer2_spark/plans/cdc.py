"""Batch CDC pipeline composition — the reference's full dataflow
(SURVEY §3.3) over a bounded redo log:

  source filters (A5-A8) → transaction assembly (A9, A15-A17)
  → parse + envelope (A10-A14, A18) → typed per-table materialization (A12-A13)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig
from ..operators.envelope import to_envelope
from ..operators.filters import dml_types_predicate, source_predicate
from ..operators.schema_registry import ColumnMeta, SchemaRegistry, apply_table_schema
from ..operators.transactions import assemble_transactions

OWNER = "TPCH"


def customer_registry() -> SchemaRegistry:
    """TPCH.CUSTOMER dictionary metadata exercising the NUMBER ladder
    (OracleSourceConnectorUtils2.java:191-241): precision 18 → INT64,
    9 → INT32, scale 2 → FLOAT64, VARCHAR2 → STRING."""
    reg = SchemaRegistry()
    mk = lambda name, **kw: ColumnMeta(OWNER, "CUSTOMER", name, True, **kw)
    reg.register(
        [
            mk("C_CUSTKEY", data_type="NUMBER", data_precision=18),
            mk("C_NAME", data_type="VARCHAR2", data_length=25),
            mk("C_NATIONKEY", data_type="NUMBER", data_precision=9),
            mk("C_ACCTBAL", data_type="NUMBER", data_precision=12, data_scale=2),
            mk("C_MKTSEGMENT", data_type="VARCHAR2", data_length=10),
        ]
    )
    return reg


def customer_orders_registry() -> SchemaRegistry:
    """Two-table dictionary (CUSTOMER + ORDERS) for multi-table pipelines
    — the multi-table analog of customer_registry, exercising the same
    NUMBER ladder on a second table so join-MV maintenance has typed
    columns on both sides."""
    reg = customer_registry()
    mk = lambda name, **kw: ColumnMeta(OWNER, "ORDERS", name, True, **kw)
    reg.register(
        [
            mk("O_ORDERKEY", data_type="NUMBER", data_precision=18),
            mk("O_CUSTKEY", data_type="NUMBER", data_precision=18),
            mk("O_ORDERSTATUS", data_type="VARCHAR2", data_length=1),
            mk("O_TOTALPRICE", data_type="NUMBER", data_precision=12, data_scale=2),
        ]
    )
    return reg


def documents_registry() -> SchemaRegistry:
    """TPCH.DOCUMENTS dictionary metadata (cdc39's CDC→corpus bridge):
    NUMBER(18) key, CLOB text (the reference maps CLOB to STRING,
    OracleSourceConnectorUtils2.java:238-240), VARCHAR2 source."""
    reg = SchemaRegistry()
    mk = lambda name, **kw: ColumnMeta(OWNER, "DOCUMENTS", name, True, **kw)
    reg.register(
        [
            mk("DOC_ID", data_type="NUMBER", data_precision=18),
            mk("TEXT", data_type="CLOB"),
            mk("SOURCE", data_type="VARCHAR2", data_length=20),
        ]
    )
    return reg


def default_config() -> EngineConfig:
    return EngineConfig(
        name="logminer",
        db_name_alias="orcl",
        table_whitelist=f"{OWNER}.*",
    )


def run_cdc_batch(
    redo: DataFrame,
    config: EngineConfig | None = None,
    registry: SchemaRegistry | None = None,
    owner: str = OWNER,
    table: str = "CUSTOMER",
) -> DataFrame:
    """Redo events → typed committed change rows for one table."""
    config = config or default_config()
    registry = registry or customer_registry()
    envelope = cdc_envelope(redo, config)
    return apply_table_schema(envelope, registry, owner, table)


def cdc_envelope(redo: DataFrame, config: EngineConfig | None = None) -> DataFrame:
    """Redo events → generic (JSON-image) envelope rows."""
    config = config or default_config()
    filtered = redo.filter(
        source_predicate(config.table_whitelist, config.table_blacklist)
    )
    if _input_is_narrow(redo):
        # pre-partition on the assembly key with an EXPLICIT count: the
        # per-xid windows reuse this exchange (same key), and a
        # user-specified partition count is exempt from AQE coalescing —
        # otherwise the tiny-byte exchange collapses to ~1 partition and
        # the assembly sorts/windows serialize behind it
        sc = redo.sparkSession.sparkContext
        filtered = filtered.repartition(sc.defaultParallelism, "xid")
    committed = assemble_transactions(
        filtered, skew_salts=config.skew_salts_arg()
    ).filter(dml_types_predicate(config.dml_type_set()))
    return to_envelope(_floor_parse_parallelism(redo, committed), config)


def _floor_parse_parallelism(redo: DataFrame, committed: DataFrame) -> DataFrame:
    """Parallelism floor for the parse boundary, decided from the INPUT.

    On a narrow redo relation (fewer partitions than cores — any local
    fixture) the assembly exchange is AQE-coalesced to ~1 partition by
    byte size, and the Arrow parse UDF — the pipeline's compute-dense
    stage — serializes behind it into a single task. The input probe is
    the safe one (the committed frame has upstream exchanges, so probing
    it would materialize stages); at scale the redo scan already carries
    >= cores partitions and nothing is added."""
    if _input_is_narrow(redo):
        return committed.repartition(
            redo.sparkSession.sparkContext.defaultParallelism
        )
    return committed


def _input_is_narrow(redo: DataFrame) -> bool:
    """True when the redo relation carries fewer partitions than cores —
    the local-fixture regime where AQE byte-sized coalescing serializes
    the pipeline's compute-dense stages. Probed on the INPUT only (safe:
    scan/local frames; exchange-bearing inputs return None and count as
    not-narrow, so nothing is ever materialized early)."""
    from ..functions.similarity import _probe_partitions

    sc = redo.sparkSession.sparkContext
    n = _probe_partitions(redo)
    return n is not None and n < sc.defaultParallelism


def cdc_envelope_cm(redo: DataFrame, config: EngineConfig | None = None) -> DataFrame:
    """Legacy CM path (Oracle <19c, A1/A6): COMMITTED_DATA_ONLY mining already
    resolved transactions upstream, so there is NO assembly step — rows
    arrive committed and the pipeline is filters → parse → envelope
    (OracleSourceTask2.java:244-313; option at OracleConnectorSQL2.java:8),
    with ``nvl(commit_scn, scn)`` per the CM select (OracleConnectorSQL2.java:5).
    """
    from pyspark.sql import functions as F

    from ..operators.csf import reassemble_csf
    from ..operators.filters import compile_table_predicate, junk_row_predicate

    config = config or default_config()
    dml = (
        redo.filter(F.col("operation").isin("INSERT", "UPDATE", "DELETE", "DDL"))
        .filter(compile_table_predicate(config.table_whitelist, config.table_blacklist))
        .filter(junk_row_predicate())
        .withColumn("commit_scn", F.coalesce(F.col("commit_scn"), F.col("scn")))
        .withColumn(
            "commit_timestamp", F.coalesce(F.col("commit_timestamp"), F.col("timestamp"))
        )
        .filter(dml_types_predicate(config.dml_type_set()))
    )
    if "csf" in dml.columns:  # CSF reassembly happens in the CM poll loop too (:277-281)
        dml = reassemble_csf(dml)
    return to_envelope(_floor_parse_parallelism(redo, dml), config)
