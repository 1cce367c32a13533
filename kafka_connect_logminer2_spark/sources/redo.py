"""Synthetic redo-event generation (FIXTURES.md §2.1 schema).

The reference consumes ``v$logmnr_contents`` rows; our tests and the
correctness harness need an equivalent redo stream. This module derives one
*deterministically* from the driver's TPC-H tables with pure DataFrame ops
(no driver-side loops — the generator itself scales), using scenario rules
keyed on ``c_custkey % 10`` that are simple enough to mirror in the DuckDB
oracle SQL:

  k == 3  → transaction ROLLBACK (discarded by assembly)
  k == 4  → committed txn with a partial-rollback pair (INSERT + compensating
            rollback='1' row → both removed by A16 repair)
  k == 5  → INSERT statement split across two CSF rows (merged by A9)
  else    → plain committed INSERT

Every DML txn is START → DML(+extras) → COMMIT/ROLLBACK with SCNs laid out as
``base + {0,1,2,3}`` so redo order is total and replay-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from .tables import load_table

REDO_SCHEMA = StructType(
    [
        StructField("scn", LongType()),
        StructField("commit_scn", LongType(), True),
        StructField("xid", StringType()),
        StructField("timestamp", TimestampNTZType(), True),
        StructField("commit_timestamp", TimestampNTZType(), True),
        StructField("operation", StringType()),
        StructField("seg_owner", StringType(), True),
        StructField("table_name", StringType(), True),
        StructField("username", StringType(), True),
        StructField("sql_redo", StringType(), True),
        StructField("row_id", StringType(), True),
        StructField("csf", BooleanType(), True),
        StructField("rollback", StringType(), True),
        StructField("rbasqn", IntegerType(), True),
        StructField("rs_id", StringType(), True),
        StructField("info", StringType(), True),
    ]
)

OWNER = "TPCH"
FIXED_TS = "2026-01-01 00:00:00"


def _esc(col: Column) -> Column:
    """Oracle string-literal escaping: ' → ''."""
    return F.regexp_replace(col, "'", "''")


def _common(scn: Column, xid: Column, op: str, *, table: Column | None = None,
            sql: Column | None = None, commit_scn: Column | None = None,
            commit_ts: bool = False, row_id: Column | None = None,
            csf: Column | None = None, rollback: Column | None = None,
            rs_suffix: str = "0") -> list[Column]:
    ts = F.lit(FIXED_TS).cast("timestamp_ntz")
    return [
        scn.cast("long").alias("scn"),
        (commit_scn.cast("long") if commit_scn is not None else F.lit(None).cast("long")).alias("commit_scn"),
        xid.alias("xid"),
        ts.alias("timestamp"),
        (ts if commit_ts else F.lit(None).cast("timestamp_ntz")).alias("commit_timestamp"),
        F.lit(op).alias("operation"),
        F.lit(OWNER).alias("seg_owner"),
        (table if table is not None else F.lit(None).cast("string")).alias("table_name"),
        F.lit("APP").alias("username"),
        (sql if sql is not None else F.lit(None).cast("string")).alias("sql_redo"),
        (row_id if row_id is not None else F.lit(None).cast("string")).alias("row_id"),
        (csf if csf is not None else F.lit(False)).alias("csf"),
        (rollback if rollback is not None else F.lit("0")).alias("rollback"),
        F.lit(1).alias("rbasqn"),
        F.concat(F.format_string("%020d", scn.cast("long")), F.lit("."), F.lit(rs_suffix)).alias("rs_id"),
        F.lit("").alias("info"),
    ]


def _customer_insert_sql(c: DataFrame) -> Column:
    return F.concat(
        F.lit(
            'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_NATIONKEY",'
            '"C_ACCTBAL","C_MKTSEGMENT") values ('
        ),
        F.col("c_custkey").cast("string"),
        F.lit(",'"),
        _esc(F.col("c_name")),
        F.lit("',"),
        F.col("c_nationkey").cast("string"),
        F.lit(","),
        F.col("c_acctbal").cast("string"),
        F.lit(",'"),
        _esc(F.col("c_mktsegment")),
        F.lit("')"),
    )


def redo_inserts_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixed-scenario INSERT stream described in the module docstring."""
    c = load_table(spark, sf_dir, "customer")
    k = (F.col("c_custkey") % 10).alias("k")
    base = (F.col("c_custkey") * 10 + 1000).alias("base")
    xid = F.concat_ws(".", F.lit("1"), F.col("c_custkey").cast("string"), F.lit("1"))
    row_id = F.format_string("AAA%015d", F.col("c_custkey"))
    c = c.select("*", k, base, xid.alias("xid"), row_id.alias("row_id"))
    ins_sql = _customer_insert_sql(c)

    starts = c.select(*_common(F.col("base"), F.col("xid"), "START"))

    plain = c.filter(~F.col("k").isin(5)).select(
        *_common(F.col("base") + 1, F.col("xid"), "INSERT",
                 table=F.lit("CUSTOMER"), sql=ins_sql, row_id=F.col("row_id"))
    )
    # k==5: statement split across two CSF rows at a fixed byte offset
    frag1 = c.filter(F.col("k") == 5).select(
        *_common(F.col("base") + 1, F.col("xid"), "INSERT",
                 table=F.lit("CUSTOMER"), sql=F.substring(ins_sql, 1, 60),
                 row_id=F.col("row_id"), csf=F.lit(True), rs_suffix="1")
    )
    frag2 = c.filter(F.col("k") == 5).select(
        *_common(F.col("base") + 1, F.col("xid"), "INSERT",
                 table=F.lit("CUSTOMER"), sql=F.substring(ins_sql, 61, 100000),
                 row_id=F.col("row_id"), csf=F.lit(False), rs_suffix="2")
    )
    # k==4: compensating partial-rollback row (undoes the insert)
    comp = c.filter(F.col("k") == 4).select(
        *_common(F.col("base") + 2, F.col("xid"), "DELETE",
                 table=F.lit("CUSTOMER"),
                 sql=F.concat(F.lit('delete from "TPCH"."CUSTOMER" where "C_CUSTKEY" = '),
                              F.col("c_custkey").cast("string")),
                 row_id=F.col("row_id"), rollback=F.lit("1"))
    )
    commits = c.filter(F.col("k") != 3).select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    rollbacks = c.filter(F.col("k") == 3).select(
        *_common(F.col("base") + 3, F.col("xid"), "ROLLBACK")
    )
    return starts.unionByName(plain).unionByName(frag1).unionByName(frag2).unionByName(comp).unionByName(commits).unionByName(rollbacks)


def redo_updates_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One committed UPDATE per customer: C_ACCTBAL += 100, LogMiner-canonical
    WHERE carrying the before-image (SET column repeated in WHERE)."""
    c = load_table(spark, sf_dir, "customer")
    base = (F.col("c_custkey") * 10 + 9_000_000).alias("base")
    xid = F.concat_ws(".", F.lit("2"), F.col("c_custkey").cast("string"), F.lit("1"))
    row_id = F.format_string("AAA%015d", F.col("c_custkey"))
    c = c.select("*", base, xid.alias("xid"), row_id.alias("row_id"))
    upd_sql = F.concat(
        F.lit('update "TPCH"."CUSTOMER" set "C_ACCTBAL" = '),
        (F.col("c_acctbal") + 100).cast("string"),
        F.lit(' where "C_CUSTKEY" = '),
        F.col("c_custkey").cast("string"),
        F.lit(' and "C_ACCTBAL" = '),
        F.col("c_acctbal").cast("string"),
        F.lit(' and "C_NAME" = \''),
        _esc(F.col("c_name")),
        F.lit("'"),
    )
    starts = c.select(*_common(F.col("base"), F.col("xid"), "START"))
    updates = c.select(
        *_common(F.col("base") + 1, F.col("xid"), "UPDATE",
                 table=F.lit("CUSTOMER"), sql=upd_sql, row_id=F.col("row_id"))
    )
    commits = c.select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    return starts.unionByName(updates).unionByName(commits)


def redo_deletes_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One committed DELETE per customer (before-image in WHERE)."""
    c = load_table(spark, sf_dir, "customer")
    base = (F.col("c_custkey") * 10 + 18_000_000).alias("base")
    xid = F.concat_ws(".", F.lit("3"), F.col("c_custkey").cast("string"), F.lit("1"))
    row_id = F.format_string("AAA%015d", F.col("c_custkey"))
    c = c.select("*", base, xid.alias("xid"), row_id.alias("row_id"))
    del_sql = F.concat(
        F.lit('delete from "TPCH"."CUSTOMER" where "C_CUSTKEY" = '),
        F.col("c_custkey").cast("string"),
        F.lit(' and "C_NAME" = \''),
        _esc(F.col("c_name")),
        F.lit("' and \"C_ACCTBAL\" = "),
        F.col("c_acctbal").cast("string"),
    )
    starts = c.select(*_common(F.col("base"), F.col("xid"), "START"))
    deletes = c.select(
        *_common(F.col("base") + 1, F.col("xid"), "DELETE",
                 table=F.lit("CUSTOMER"), sql=del_sql, row_id=F.col("row_id"))
    )
    commits = c.select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    return starts.unionByName(deletes).unionByName(commits)


def redo_documents_dml(
    docs: DataFrame,
    op: str,
    scn_base: int,
    xid_tag: str,
) -> DataFrame:
    """One committed single-statement transaction per DOCUMENTS row — the
    cdc39 CDC→corpus bridge's input synthesizer. ``docs``: rows with
    (doc_id, text, source) and, for UPDATE, ``new_text``. SQL shapes
    mirror the customer builders (LogMiner-canonical: UPDATE repeats the
    SET column in the WHERE with its before-image; DELETE carries the
    full before-image in the WHERE). scn = scn_base + doc_id*10
    (+0 START, +1 DML, +3 COMMIT)."""
    base = (F.lit(scn_base) + F.col("doc_id") * 10).alias("base")
    xid = F.concat_ws(".", F.lit(xid_tag), F.col("doc_id").cast("string"), F.lit("1"))
    row_id = F.format_string("AAD%015d", F.col("doc_id"))
    d = docs.select("*", base, xid.alias("xid"), row_id.alias("row_id"))
    if op == "INSERT":
        sql = F.concat(
            F.lit('insert into "TPCH"."DOCUMENTS"("DOC_ID","TEXT","SOURCE") values ('),
            F.col("doc_id").cast("string"),
            F.lit(",'"), _esc(F.col("text")),
            F.lit("','"), _esc(F.col("source")),
            F.lit("')"),
        )
    elif op == "UPDATE":
        sql = F.concat(
            F.lit('update "TPCH"."DOCUMENTS" set "TEXT" = \''),
            _esc(F.col("new_text")),
            F.lit('\' where "DOC_ID" = '),
            F.col("doc_id").cast("string"),
            F.lit(' and "TEXT" = \''), _esc(F.col("text")),
            F.lit('\' and "SOURCE" = \''), _esc(F.col("source")),
            F.lit("'"),
        )
    elif op == "DELETE":
        sql = F.concat(
            F.lit('delete from "TPCH"."DOCUMENTS" where "DOC_ID" = '),
            F.col("doc_id").cast("string"),
            F.lit(' and "TEXT" = \''), _esc(F.col("text")),
            F.lit('\' and "SOURCE" = \''), _esc(F.col("source")),
            F.lit("'"),
        )
    else:
        raise ValueError(f"unsupported op {op!r}")
    starts = d.select(*_common(F.col("base"), F.col("xid"), "START"))
    dml = d.select(
        *_common(F.col("base") + 1, F.col("xid"), op,
                 table=F.lit("DOCUMENTS"), sql=sql, row_id=F.col("row_id"))
    )
    commits = d.select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    return starts.unionByName(dml).unionByName(commits)


def redo_cm_inserts_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CM-path (COMMITTED_DATA_ONLY) view of the insert stream: only DML rows
    of transactions that committed and survived rollback resolution — Oracle
    does the gating upstream, so no START/COMMIT/ROLLBACK rows appear and
    ``commit_scn`` is already stamped (OracleConnectorSQL2.java:5,8)."""
    full = redo_inserts_from_customer(spark, sf_dir)
    custkey = F.split(F.col("xid"), "\\.").getItem(1).cast("long")
    return (
        full.filter(F.col("operation") == "INSERT")
        .filter(~(custkey % 10).isin(3, 4))
        .withColumn("commit_scn", F.col("scn") + 2)
        .withColumn("commit_timestamp", F.col("timestamp"))
    )


def redo_long_txns_from_customer(
    spark: SparkSession, sf_dir: str, n_txns: int = 50
) -> DataFrame:
    """Long-transaction stress shape for the streaming assemblers: every
    customer INSERT belongs to one of ``n_txns`` transactions
    (``c_custkey % n_txns``), DML rows interleave across the whole SCN
    range, and every COMMIT lands after the last DML row — so each
    micro-batch touches every open transaction and every buffer keeps
    growing until the final batch. This is the shape where a single-value
    GroupState must rewrite its whole buffer every batch, while ListState
    (transformWithState) appends only the increment — the reference's
    unbounded-heap worry (LogMinerThread2.java:81) turned into a measurable
    probe (tools/cdc_throughput.py longtxn)."""
    c = load_table(spark, sf_dir, "customer")
    t = (F.col("c_custkey") % n_txns).alias("t")
    base = (F.col("c_custkey") * 10 + 1_000_000).alias("base")
    xid = F.concat_ws(".", F.lit("9"), t.cast("string"), F.lit("1"))
    row_id = F.format_string("AAA%015d", F.col("c_custkey"))
    c = c.select("*", t, base, xid.alias("xid"), row_id.alias("row_id"))
    ins_sql = _customer_insert_sql(c)

    txns = c.select("t", "xid").distinct()
    starts = txns.select(*_common(F.col("t") + 10, F.col("xid"), "START"))
    dml = c.select(
        *_common(F.col("base"), F.col("xid"), "INSERT",
                 table=F.lit("CUSTOMER"), sql=ins_sql, row_id=F.col("row_id"))
    )
    commits = txns.select(
        *_common(F.lit(1_000_000_000) + F.col("t"), F.col("xid"), "COMMIT",
                 commit_scn=F.lit(1_000_000_000) + F.col("t"), commit_ts=True)
    )
    return starts.unionByName(dml).unionByName(commits)


def _orders_base(spark: SparkSession, sf_dir: str, band: int, xid_tag: str) -> DataFrame:
    """Shared ORDERS slice for the two-table join-MV fixture: every 7th
    order (o_orderkey % 7 == 0 — a modulus coprime to the k-rule modulus 4,
    so scenario classes stay uniformly populated) with the band SCN base,
    xid, and row_id columns attached. Bands mirror the customer
    generators: inserts < updates < deletes in SCN so the banded staging
    (plans/queries.py::_stage_banded_redo family) can split them into
    micro-batches."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    bases = {0: 2_000_000, 1: 30_000_000, 2: 60_000_000}
    base = (F.col("o_orderkey") * 10 + bases[band]).alias("base")
    xid = F.concat_ws(
        ".", F.lit(xid_tag), F.col("o_orderkey").cast("string"), F.lit("1")
    )
    row_id = F.format_string("AAB%015d", F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_orderkey") % 4).alias("k"),
        base,
        xid.alias("xid"),
        row_id.alias("row_id"),
    )


def redo_inserts_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed INSERT per fixture order; k == o_orderkey % 4 == 3 rolls
    back (so the join MV must never see those orders). One statement per
    transaction — the CSF/partial-rollback shapes are covered by the
    customer generators; this stream exists to drive TWO-TABLE pipelines
    (multi-table snapshots, incremental join MVs)."""
    o = _orders_base(spark, sf_dir, 0, "5")
    ins_sql = F.concat(
        F.lit(
            'insert into "TPCH"."ORDERS"("O_ORDERKEY","O_CUSTKEY",'
            '"O_ORDERSTATUS","O_TOTALPRICE") values ('
        ),
        F.col("o_orderkey").cast("string"),
        F.lit(","),
        F.col("o_custkey").cast("string"),
        F.lit(",'"),
        _esc(F.col("o_orderstatus")),
        F.lit("',"),
        F.col("o_totalprice").cast("string"),
        F.lit(")"),
    )
    starts = o.select(*_common(F.col("base"), F.col("xid"), "START"))
    dml = o.select(
        *_common(F.col("base") + 1, F.col("xid"), "INSERT",
                 table=F.lit("ORDERS"), sql=ins_sql, row_id=F.col("row_id"))
    )
    commits = o.filter(F.col("k") != 3).select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    rollbacks = o.filter(F.col("k") == 3).select(
        *_common(F.col("base") + 3, F.col("xid"), "ROLLBACK")
    )
    return starts.unionByName(dml).unionByName(commits).unionByName(rollbacks)


def redo_updates_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed UPDATE (O_TOTALPRICE += 10) for k == 0 fixture orders,
    LogMiner-canonical before-image WHERE."""
    o = _orders_base(spark, sf_dir, 1, "6").filter(F.col("k") == 0)
    upd_sql = F.concat(
        F.lit('update "TPCH"."ORDERS" set "O_TOTALPRICE" = '),
        (F.col("o_totalprice") + 10).cast("string"),
        F.lit(' where "O_ORDERKEY" = '),
        F.col("o_orderkey").cast("string"),
        F.lit(' and "O_TOTALPRICE" = '),
        F.col("o_totalprice").cast("string"),
    )
    starts = o.select(*_common(F.col("base"), F.col("xid"), "START"))
    updates = o.select(
        *_common(F.col("base") + 1, F.col("xid"), "UPDATE",
                 table=F.lit("ORDERS"), sql=upd_sql, row_id=F.col("row_id"))
    )
    commits = o.select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    return starts.unionByName(updates).unionByName(commits)


def redo_deletes_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed DELETE for k == 1 fixture orders (before-image WHERE)."""
    o = _orders_base(spark, sf_dir, 2, "7").filter(F.col("k") == 1)
    del_sql = F.concat(
        F.lit('delete from "TPCH"."ORDERS" where "O_ORDERKEY" = '),
        F.col("o_orderkey").cast("string"),
        F.lit(' and "O_CUSTKEY" = '),
        F.col("o_custkey").cast("string"),
    )
    starts = o.select(*_common(F.col("base"), F.col("xid"), "START"))
    deletes = o.select(
        *_common(F.col("base") + 1, F.col("xid"), "DELETE",
                 table=F.lit("ORDERS"), sql=del_sql, row_id=F.col("row_id"))
    )
    commits = o.select(
        *_common(F.col("base") + 3, F.col("xid"), "COMMIT",
                 commit_scn=F.col("base") + 3, commit_ts=True)
    )
    return starts.unionByName(deletes).unionByName(commits)


def redo_events_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Small hand-authored event lists for unit tests."""
    defaults = dict(
        commit_scn=None, timestamp=None, commit_timestamp=None, seg_owner=OWNER,
        table_name=None, username="APP", sql_redo=None, row_id=None, csf=False,
        rollback="0", rbasqn=1, rs_id=None, info="",
    )
    from datetime import datetime

    full = []
    for r in rows:
        d = dict(defaults)
        d.update(r)
        if d["rs_id"] is None:
            d["rs_id"] = f"{d['scn']:020d}.0"
        for tf in ("timestamp", "commit_timestamp"):
            if isinstance(d[tf], str):
                d[tf] = datetime.fromisoformat(d[tf])
        full.append(d)
    return spark.createDataFrame(full, schema=REDO_SCHEMA)
