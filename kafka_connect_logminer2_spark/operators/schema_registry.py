"""Dynamic per-table schema registry — reference operator A12 (+A13 typing).

The reference lazily loads each table's column metadata from the Oracle data
dictionary, memoizes it, and invalidates the cache entry when a DDL event for
that table arrives (OracleSourceConnectorUtils2.java:83-85, 156-252, 368-371).

Spark adaptation (SURVEY §1.4): the registry lives driver-side; the streaming
core carries ``data``/``before`` as JSON strings, and this module applies the
typed per-table StructType at materialization via ``from_json`` + casts —
whole-stage-codegen'd JVM work, no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

STRING_ORACLE_TYPES = {"CHAR", "VARCHAR", "VARCHAR2", "NCHAR", "NVARCHAR", "NVARCHAR2", "LONG", "CLOB"}


@dataclass(frozen=True)
class ColumnMeta:
    """models/Column.java:10-35 equivalent."""

    owner: str
    table_name: str
    column_name: str
    nullable: bool
    data_type: str
    data_length: int = 0
    data_scale: int = 0
    data_precision: int = 0
    pk_column: bool = False
    uq_column: bool = False

    def spark_type(self, float64_numbers: bool = True) -> DataType:
        """The NUMBER precision ladder + text/time mapping
        (OracleSourceConnectorUtils2.java:191-241).

        ``float64_numbers=False`` is the engine's precision-preserving
        opt-in (SURVEY §1.3): fractional/unspecified NUMBER becomes
        DecimalType(p, s) instead of the reference's lossy FLOAT64."""
        dt = self.data_type.upper()
        if "TIMESTAMP" in dt:  # any TIMESTAMP variant collapses (:183)
            dt = "TIMESTAMP"
        if dt == "NUMBER":
            if self.data_scale > 0 or self.data_precision == 0:
                if not float64_numbers:
                    return DecimalType(self.data_precision or 38, max(self.data_scale, 0))
                return DoubleType()  # FLOAT64 reference semantics (:194-196)
            if self.data_precision <= 2:
                return ByteType()
            if self.data_precision <= 4:
                return ShortType()
            if self.data_precision <= 9:
                return IntegerType()
            return LongType()
        if dt in STRING_ORACLE_TYPES:
            return StringType()
        if dt in ("DATE", "TIMESTAMP"):
            return TimestampNTZType()
        return StringType()  # fallback (:238-240)


def _meta_from_row(r) -> ColumnMeta:
    """Dictionary-relation row → ColumnMeta (column names per the reference
    dictionary query's projection, OracleConnectorSQL2.java:13/:15)."""
    return ColumnMeta(
        owner=r["owner"],
        table_name=r["table_name"],
        column_name=r["column_name"],
        nullable=r["nullable"] == "Y",
        data_type=r["data_type"],
        data_length=r["data_length"] or 0,
        data_scale=r["data_scale"] or 0,
        data_precision=r["data_precision"] or 0,
        pk_column=bool(r["pk_column"]),
        uq_column=bool(r["uq_column"]),
    )


def dictionary_loader(
    dictionary: DataFrame,
    config=None,
    *,
    multitenant: bool | None = None,
    con_id: int | None = None,
):
    """Dictionary-query fork on ``EngineConfig.multitenant`` — the reference
    picks TABLE_WITH_COLS vs TABLE_WITH_COLS_CDB on exactly this flag
    (OracleSourceConnectorUtils2.java:161-163; OracleConnectorSQL2.java:13
    vs :15). Returns a ``(owner, table) -> list[ColumnMeta] | None`` loader
    for ``SchemaRegistry(loader=...)``.

    Single-tenant reads a TABLE_WITH_COLS-shaped relation (``dba_*`` views —
    no CON_ID column). Multitenant reads the TABLE_WITH_COLS_CDB shape
    (``CDB_*`` views): the reference's CDB SQL threads CON_ID through every
    dictionary join precisely because a CDB sees every container's
    same-named tables at once, so here ``con_id`` (the connector's
    container) is REQUIRED and pruned before the per-table load. Guards are
    loud in both directions: a con_id column present under
    ``multitenant=False`` would interleave columns from every container
    into one schema — refuse rather than load garbage.

    Per-table loads collect a handful of dictionary rows driver-side — the
    registry is driver-state by design (module docstring); at 100 TB the
    dictionary relation is KBs per table and the loader runs once per
    (table, DDL epoch), never per record.
    """
    if multitenant is None:
        multitenant = bool(getattr(config, "multitenant", False))
    has_con_id = "con_id" in dictionary.columns
    if multitenant:
        if not has_con_id:
            raise ValueError(
                "multitenant=True needs a CDB-shaped dictionary (con_id column "
                "missing — TABLE_WITH_COLS_CDB projects CON_ID first)"
            )
        if con_id is None:
            raise ValueError(
                "multitenant=True requires con_id: a CDB dictionary holds every "
                "container's same-named tables; pick the connector's container"
            )
    elif has_con_id:
        raise ValueError(
            "dictionary has a con_id column but multitenant=False — set "
            "EngineConfig.multitenant (a single-tenant load would interleave "
            "columns from every container)"
        )

    def load(owner: str, table: str) -> list[ColumnMeta] | None:
        pred = (F.col("owner") == owner) & (F.col("table_name") == table)
        if multitenant:
            pred = pred & (F.col("con_id") == con_id)
        rows = dictionary.filter(pred).orderBy("column_id").collect()
        return [_meta_from_row(r) for r in rows] or None

    return load


class SchemaRegistry:
    """Lazy, memoized, DDL-invalidated table-schema cache (A12).

    ``loader`` is the dictionary-query analog (loadTable,
    OracleSourceConnectorUtils2.java:156-252): a callable
    ``(owner, table) -> list[ColumnMeta] | None`` consulted on cache miss by
    :meth:`ensure` — so a DDL invalidation is followed by a fresh dictionary
    load on the table's next DML, exactly the reference's reload-on-miss
    behavior (:249, :368-371), enabling mid-stream schema evolution."""

    def __init__(self, loader=None) -> None:
        self._tables: dict[str, list[ColumnMeta]] = {}
        self._loader = loader

    @staticmethod
    def key(owner: str, table: str) -> str:
        return f"{owner}.{table}"

    def register(self, columns: list[ColumnMeta]) -> None:
        """Register dictionary rows (ordered by COLUMN_ID like the reference's
        ORDER BY, OracleConnectorSQL2.java:13)."""
        for c in columns:
            self._tables.setdefault(self.key(c.owner, c.table_name), []).append(c)

    def load_from_dictionary(self, dictionary: DataFrame, owner: str, table: str) -> None:
        """Load one table's columns from a dictionary table shaped like
        TABLE_WITH_COLS output (FIXTURES.md §2.2)."""
        rows = (
            dictionary.filter((F.col("owner") == owner) & (F.col("table_name") == table))
            .orderBy("column_id")
            .collect()
        )
        self._tables[self.key(owner, table)] = [_meta_from_row(r) for r in rows]

    def invalidate(self, owner: str, table: str) -> None:
        """DDL-triggered cache invalidation
        (OracleSourceConnectorUtils2.java:368-371)."""
        self._tables.pop(self.key(owner, table), None)

    def has(self, owner: str, table: str) -> bool:
        return self.key(owner, table) in self._tables

    def ensure(self, owner: str, table: str) -> bool:
        """Cache hit, or lazy (re)load through ``loader`` on miss — the next
        DML after a DDL invalidation picks up fresh columns."""
        if self.has(owner, table):
            return True
        if self._loader is not None:
            cols = self._loader(owner, table)
            if cols:
                self._tables[self.key(owner, table)] = list(cols)
                return True
        return False

    def columns(self, owner: str, table: str) -> list[ColumnMeta]:
        return self._tables[self.key(owner, table)]

    def struct_type(
        self, owner: str, table: str, float64_numbers: bool = True
    ) -> StructType:
        return StructType(
            [
                StructField(c.column_name, c.spark_type(float64_numbers), c.nullable)
                for c in self.columns(owner, table)
            ]
        )

    def raw_struct_type(self, owner: str, table: str) -> StructType:
        """All-string struct for the first from_json pass (values are parsed
        SQL literals; typed casts applied after — reSetValue analog)."""
        return StructType(
            [StructField(c.column_name, StringType(), True) for c in self.columns(owner, table)]
        )


def _coerce(raw: Column, meta: ColumnMeta, float64_numbers: bool = True) -> Column:
    """reSetValue analog (OracleSourceConnectorUtils2.java:436-465), as
    built-in expressions: numeric casts; timestamps strip a ``+TZ`` suffix
    (:456) before the cast; strings pass through."""
    t = meta.spark_type(float64_numbers)
    if isinstance(t, TimestampNTZType):
        no_tz = F.when(raw.contains("+"), F.substring_index(raw, "+", 1)).otherwise(raw)
        return no_tz.cast("timestamp_ntz")
    return raw.cast(t)


def apply_table_schema(
    envelope: DataFrame,
    registry: SchemaRegistry,
    owner: str,
    table: str,
    float64_numbers: bool = True,
) -> DataFrame:
    """Materialize one table's typed change rows from the generic envelope.

    ``data``/``before`` become typed nested structs per the registry schema —
    the per-table step the reference does per-record in createDataSchema
    (:386-415), here as a single Catalyst projection over the whole batch.
    The registry is consulted lazily first (``ensure``), matching the
    reference's load-dictionary-on-demand before schema build (:156-252).
    """
    if not registry.ensure(owner, table):
        raise KeyError(
            f"no dictionary columns for {owner}.{table} (registered or via loader)"
        )
    raw_schema = registry.raw_struct_type(owner, table)
    metas = registry.columns(owner, table)

    def typed(json_col: str) -> Column:
        raw = F.from_json(F.col(json_col), raw_schema)
        struct = F.struct(
            *[
                _coerce(raw[m.column_name], m, float64_numbers).alias(m.column_name)
                for m in metas
            ]
        )
        return F.when(F.col(json_col).isNull(), F.lit(None).cast(
            StructType(
                [
                    StructField(m.column_name, m.spark_type(float64_numbers), True)
                    for m in metas
                ]
            )
        )).otherwise(struct)

    return (
        envelope.filter((F.col("SEG_OWNER") == owner) & (F.col("TABLE_NAME") == table))
        .withColumn("data", typed("data_json"))
        .withColumn("before", typed("before_json"))
        .drop("data_json", "before_json")
    )


def process_ddl_invalidations(envelope: DataFrame, registry: SchemaRegistry) -> None:
    """Clear cached schemas for tables with DDL events in this batch — the
    foreachBatch hook ordering guarantee (DDL invalidates before the next
    materialization of that table; SURVEY §7 hard part 4).

    The reference rewrites TABLE_NAME to _GENERIC_DDL on emit, so the original
    table is recovered from the SQL_REDO'd segment via SEG_OWNER + the redo
    text; here we pass the pre-rewrite name through the ``topic`` instead —
    callers that need exact parity should invalidate from the DML-row stream
    before envelope projection.
    """
    ddls = envelope.filter(F.col("OPERATION") == "DDL").select("SEG_OWNER", "TABLE_NAME").distinct()
    for r in ddls.collect():
        registry.invalidate(r["SEG_OWNER"], r["TABLE_NAME"])
