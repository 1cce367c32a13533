"""Transaction assembly (batch) — reference operators A15-A17.

The reference buffers DML rows per XID and emits them only at COMMIT,
discarding at ROLLBACK, repairing partial-rollback pairs, and stamping commit
SCN/timestamp (LogMinerThread2.java:142-309). Over a *bounded* redo log the
same semantics are a pure relational program — joins and group-local repair —
which is how the batch engine runs it (the streaming engine keeps true
per-key state instead; streaming/transactions.py):

  dml ⋈ commits (on xid)        → commit gating + commit-metadata stamp (A17)
  anti-⋈ rollbacks (on xid)     → rollback discard
  per-xid pandas repair         → partial-rollback pair deletion (A16),
                                  only for the (rare) flagged transactions

Scale notes: the xid⋈commit join shuffles on xid — the same key as the CSF
window — so the exchange is reused; commits-per-batch is small relative to DML
so AQE picks a broadcast join at runtime; the pandas repair path only sees
transactions that actually contain rollback markers.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .csf import reassemble_csf
from .filters import junk_row_predicate

DML_OPS = ("INSERT", "UPDATE", "DELETE", "DDL")


def _commits(redo: DataFrame) -> DataFrame:
    """One row per committed xid with its commit metadata.

    The COMMIT record carries commit_scn/commit_timestamp read at
    LogMinerThread2.java:153-154 and stamped onto every buffered row
    (:190-191). First COMMIT per xid wins (valid logs have exactly one).
    """
    return (
        redo.filter(F.col("operation") == "COMMIT")
        .groupBy("xid")
        .agg(
            F.min(F.struct("scn", "commit_scn", "commit_timestamp")).alias("_c"),
        )
        .select(
            "xid",
            F.col("_c.commit_scn").alias("_commit_scn"),
            F.col("_c.commit_timestamp").alias("_commit_timestamp"),
        )
    )


def _rollbacks(redo: DataFrame) -> DataFrame:
    return redo.filter(F.col("operation") == "ROLLBACK").select("xid").distinct()


def _repair_partial_rollbacks(dml: DataFrame) -> DataFrame:
    """A16: inside a committed txn, each ``rollback='1'`` row is dropped along
    with its predecessor (the change it undoes), in redo order.

    Replicates the delete-list arithmetic of LogMinerThread2.java:163-185
    (which removes indices r and r-1 with post-deletion shifting — net effect:
    drop every rollback-marked row and the row immediately before it).
    Runs as ``applyInPandas`` per xid, and ONLY on transactions that contain a
    rollback marker; clean transactions bypass this operator entirely.
    """
    flagged = (
        dml.filter(F.col("rollback") == "1").select("xid").distinct()
    )
    tainted = dml.join(F.broadcast(flagged), "xid", "left_semi")
    clean = dml.join(F.broadcast(flagged), "xid", "left_anti")

    schema = dml.schema

    def repair(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["scn", "rs_id"], kind="mergesort").reset_index(drop=True)
        drop: set[int] = set()
        for r in pdf.index[pdf["rollback"] == "1"]:
            drop.add(int(r))
            if r - 1 >= 0:
                drop.add(int(r) - 1)
        return pdf[~pdf.index.isin(drop)]

    repaired = tainted.groupBy("xid").applyInPandas(repair, schema=schema)
    return clean.unionByName(repaired)


def assemble_transactions(redo: DataFrame) -> DataFrame:
    """Bounded-log transaction assembly: returns committed DML rows with
    ``commit_scn``/``commit_timestamp`` stamped, rollback transactions
    discarded, partial-rollback pairs repaired, CSF fragments merged.

    Input: redo-event rows (FIXTURES.md §2.1 schema). Output: DMLRow-shaped
    rows (models/DMLRow.java:5-34) ready for parse + envelope projection.
    """
    dml = redo.filter(F.col("operation").isin(*DML_OPS)).filter(junk_row_predicate())
    if "csf" in dml.columns:
        dml = reassemble_csf(dml)

    commits = _commits(redo)
    rollbacks = _rollbacks(redo)

    committed = (
        dml.join(commits, "xid", "inner")
        .join(rollbacks, "xid", "left_anti")
        .withColumn("commit_scn", F.col("_commit_scn"))
        .withColumn("commit_timestamp", F.col("_commit_timestamp"))
        .drop("_commit_scn", "_commit_timestamp")
    )

    return _repair_partial_rollbacks(committed)
