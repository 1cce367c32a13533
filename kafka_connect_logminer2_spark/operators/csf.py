"""Continuation-row (CSF) reassembly — reference operator A9.

LogMiner splits statements longer than 4000 bytes across rows flagged
``CSF=1``; the reference concatenates them by consuming cursor rows until the
flag clears (OracleSourceTask2.java:277-281, LogMinerThread2.java:265-269).

Spark-first formulation: sessionize-by-flag with window functions, partitioned
by ``xid`` (continuation rows always belong to the same transaction) so no
global sort/shuffle is needed — the window key matches the downstream
transaction-assembly shuffle key and AQE reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# canonical redo order within a transaction
ORDER_COLS = ("scn", "rs_id")


def reassemble_csf(df: DataFrame) -> DataFrame:
    """Merge CSF-split rows into single statements.

    A row starts a new statement iff the previous row (per xid, redo order)
    was not flagged CSF. Each statement group keeps the *first* row's
    metadata and the concatenation of all ``sql_redo`` fragments in order —
    exactly the reference's while-loop semantics.
    """
    w = Window.partitionBy("xid").orderBy(*[F.col(c) for c in ORDER_COLS])
    prev_csf = F.lag(F.col("csf"), 1, False).over(w)
    with_group = df.withColumn(
        "_stmt_id", F.sum(F.when(~F.coalesce(prev_csf, F.lit(False)), 1).otherwise(0)).over(w)
    )

    frag_struct = F.struct(*[F.col(c) for c in ORDER_COLS], F.col("sql_redo"))
    other_cols = [c for c in df.columns if c not in ("sql_redo", "csf")]
    first_row = F.min(F.struct(*[F.col(c) for c in ORDER_COLS], *[F.col(c) for c in other_cols if c not in ORDER_COLS]))

    agg = (
        with_group.groupBy("xid", "_stmt_id")
        .agg(
            first_row.alias("_first"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(frag_struct)), lambda s: s["sql_redo"]),
                "",
            ).alias("sql_redo"),
        )
    )
    out_cols = [F.col(f"_first.{c}").alias(c) for c in other_cols if c != "xid"]
    # schema-preserving: csf=false after merge, original column order
    merged = agg.select("xid", *out_cols, "sql_redo", F.lit(False).alias("csf"))
    return merged.select(*df.columns)
