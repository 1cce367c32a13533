"""Source-side filter operators (reference A4-A8).

All filters are plain Column predicates so Catalyst pushes them into the scan
(parquet/Kafka) — the Spark analog of the reference string-appending its
whitelist WHERE clause into the ``v$logmnr_contents`` query
(OracleSourceConnectorUtils2.java:132-154, OracleConnectorSQL2.java:5-6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# OracleConnectorSQL2.java:6 — usernames excluded from control-op capture
EXCLUDED_USERNAMES = ("UNKNOWNX", "SYS", "KMINER")
CONTROL_OPS = ("COMMIT", "ROLLBACK", "START")
DML_OPS = ("INSERT", "UPDATE", "DELETE", "DDL")
# OracleConnectorSchema.java:55
TEMPORARY_TABLE = "temporary tables"
INTERNAL_DDL = "INTERNAL DDL"


def compile_table_predicate(table_whitelist: str, table_blacklist: str = "") -> Column:
    """Compile "OWNER.TABLE,OWNER.*" csv lists into one Column predicate.

    Replicates parseTableWhiteList (OracleSourceConnectorUtils2.java:132-154):
    OR of per-entry (seg_owner='O' [and table_name='T']) conjunctions, with an
    ``and not (...)`` blacklist clause appended.
    """

    def one_list(csv: str) -> Column:
        pred: Column | None = None
        for entry in csv.split(","):
            entry = entry.strip()
            if not entry:
                continue
            owner, _, table = entry.partition(".")
            p = F.col("seg_owner") == F.lit(owner)
            if table != "*":
                p = p & (F.col("table_name") == F.lit(table))
            pred = p if pred is None else (pred | p)
        return pred if pred is not None else F.lit(True)

    pred = one_list(table_whitelist)
    if table_blacklist:
        pred = pred & ~one_list(table_blacklist)
    return pred


def source_predicate(
    table_whitelist: str, table_blacklist: str = "", min_scn: int | None = None
) -> Column:
    """The full non-CM source WHERE clause (OracleConnectorSQL2.java:6):

    (scn > ?) and ((op in control and username not in excl)
                   or (op in dml and <whitelist/blacklist>))
    """
    control = F.col("operation").isin(*CONTROL_OPS) & ~F.col("username").isin(*EXCLUDED_USERNAMES)
    dml = F.col("operation").isin(*DML_OPS) & compile_table_predicate(
        table_whitelist, table_blacklist
    )
    pred = control | dml
    if min_scn is not None:
        pred = (F.col("scn") > F.lit(min_scn)) & pred
    return pred


def junk_row_predicate() -> Column:
    """Drop temporary-table redo and INTERNAL DDL rows (A8).

    OracleSourceTask2.java:275-276 / LogMinerThread2.java:263-264.
    """
    not_temp = ~F.coalesce(F.col("sql_redo").contains(TEMPORARY_TABLE), F.lit(False))
    not_internal_ddl = ~(
        (F.col("operation") == "DDL")
        & F.coalesce(F.col("info").startswith(INTERNAL_DDL), F.lit(False))
    )
    return not_temp & not_internal_ddl


def dml_types_predicate(dml_types: set[str]) -> Column:
    """Restrict emitted operations per `dml.types` config (A7).

    OracleSourceTask2.java:296-300. DDL always passes (the reference applies
    the filter only on the operation list; DDL events route separately).
    """
    return F.col("operation").isin(*(dml_types | {"DDL"}))


def skip_replay(df: DataFrame, last_scn: int | None) -> DataFrame:
    """Exactly-once resume guard (A4): drop already-emitted rows.

    The reference replays from the containing log's start and skips until the
    exact (scn, commitScn, rowId) triple passes (OracleSourceTask2.java:258-264).
    With checkpointed offsets a strict SCN lower bound is equivalent; a
    dropDuplicates guard on the natural key protects against source replays.
    """
    if last_scn is not None:
        df = df.filter(F.col("scn") > F.lit(last_scn))
    return df.dropDuplicates(["scn", "row_id", "operation"])
