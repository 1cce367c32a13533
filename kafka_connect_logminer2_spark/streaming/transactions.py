"""Streaming transaction assembly — reference operators A15-A17 as a true
per-key stateful Structured Streaming operator.

``LogMinerThread2.run()`` (LogMinerThread2.java:142-309) buffers DMLRows per
XID in an in-heap LinkedHashMap and emits them at COMMIT. Here the same state
machine runs distributed: ``groupBy(xid).applyInPandasWithState`` with the
buffer in the Spark state store (RocksDB-backed, spillable — fixing the
reference's unbounded-heap risk at :81) plus a processing-time timeout that
evicts abandoned transactions (what the reference lacks; SURVEY §7 hard
part 6).

Semantics replicated exactly:
  START    → create buffer                            (:241-245)
  DML/DDL  → append; CSF fragments concatenated       (:247-298, :265-269)
  COMMIT   → partial-rollback pair repair (:163-185), stamp commit
             scn/timestamp on every row (:190-191), emit in redo order,
             drop state (:230)
  ROLLBACK → discard buffer                           (:234-239)
DML for an unseen xid creates the buffer implicitly (:292-297) — a mining
session can start mid-transaction.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# emitted rows: DMLRow shape (models/DMLRow.java:5-34)
OUTPUT_SCHEMA = StructType(
    [
        StructField("xid", StringType()),
        StructField("scn", LongType()),
        StructField("commit_scn", LongType(), True),
        StructField("timestamp", TimestampNTZType(), True),
        StructField("commit_timestamp", TimestampNTZType(), True),
        StructField("operation", StringType()),
        StructField("seg_owner", StringType(), True),
        StructField("table_name", StringType(), True),
        StructField("row_id", StringType(), True),
        StructField("sql_redo", StringType(), True),
        StructField("rollback", StringType(), True),
        StructField("rs_id", StringType(), True),
    ]
)

# state: JSON-serialized buffered rows + rollback flag
STATE_SCHEMA = StructType(
    [
        StructField("rows_json", StringType()),
        StructField("contains_rollback", BooleanType()),
    ]
)

_BUF_FIELDS = (
    "scn", "timestamp", "operation", "seg_owner", "table_name",
    "row_id", "sql_redo", "rollback", "rs_id", "csf",
)


def _ts_to_str(v: Any) -> str | None:
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return None
    return pd.Timestamp(v).isoformat()


def _repair_pairs(rows: list[dict]) -> list[dict]:
    """A16 pair deletion: drop each rollback='1' row and its predecessor
    (LogMinerThread2.java:163-185 semantics, see operators/transactions.py)."""
    drop: set[int] = set()
    for i, r in enumerate(rows):
        if r.get("rollback") == "1":
            drop.add(i)
            if i - 1 >= 0:
                drop.add(i - 1)
    return [r for i, r in enumerate(rows) if i not in drop]


def _normalize_rows(events: pd.DataFrame) -> list[dict]:
    """Columnar normalization of a group's events into buffer-row dicts —
    the replacement for the per-event ``iterrows`` that held the stateful
    assemblers at 1.5–7k ev/s: every cast/NaN-fix happens once per COLUMN
    (C speed), and ``to_dict('records')`` boxes to native Python types, so
    the only remaining Python loop is over control events (START/COMMIT/
    ROLLBACK — ~2 per transaction, not one per row)."""
    sql = events["sql_redo"]
    rb = events["rollback"]
    return pd.DataFrame(
        {
            "scn": events["scn"].astype("int64"),
            "timestamp": events["timestamp"].map(_ts_to_str),
            "operation": events["operation"],
            "seg_owner": events["seg_owner"],
            "table_name": events["table_name"],
            "row_id": events["row_id"],
            "sql_redo": sql.where(sql.notna(), None),
            "rollback": rb.where(rb.notna(), None),
            "rs_id": events["rs_id"],
            "csf": events["csf"].fillna(False).astype(bool),
        }
    ).to_dict("records")


_CTRL_OPS = ("START", "ROLLBACK", "COMMIT")


def _merge_csf(rows: list[dict]) -> list[dict]:
    """A9 continuation reassembly inside the buffer (redo order)."""
    out: list[dict] = []
    pending: dict | None = None
    for r in rows:
        if pending is not None:
            pending["sql_redo"] = (pending["sql_redo"] or "") + (r.get("sql_redo") or "")
            if not r.get("csf"):
                pending["csf"] = False
                out.append(pending)
                pending = None
            continue
        if r.get("csf"):
            pending = dict(r)
        else:
            out.append(r)
    if pending is not None:  # trailing fragment: emit what we have
        pending["csf"] = False
        out.append(pending)
    return out


# commit-emission slice size: bounds each yielded pandas frame / Arrow batch
# regardless of transaction size (131,072 rows ≈ tens of MB at redo-row width)
_EMIT_CHUNK_ROWS = 1 << 17

# per-xid buffered-rows ceiling for the apply path. GroupState is a single
# JSON value by API, and the measured failure point of that representation
# on this engine is 4M rows in one xid (JVM StackOverflow mid-stream —
# tools/giant_txn_probe.py, BASELINE.md r11). The fb assembler
# (transactions_fb.write_cdc_foreachbatch) completes the same workload, so
# above ~1M rows/xid it is the mandated route; this ceiling converts the
# opaque mid-stream JVM death into an immediate, named diagnostic.
_MAX_BUFFERED_ROWS = 1_000_000


class TransactionBufferCeiling(RuntimeError):
    """A single transaction exceeded the apply-path per-xid buffer ceiling."""


def make_assembler(
    timeout_ms: int | None = None,
    emit_chunk_rows: int = _EMIT_CHUNK_ROWS,
    max_buffered_rows: int = _MAX_BUFFERED_ROWS,
):
    """Build the applyInPandasWithState function (closure over the timeout
    and the commit-emission chunk size — closure captures pickle BY VALUE
    to the python workers, module globals do not).

    ``timeout_ms=None`` → no state timeout. Use a timeout only for
    continuous (non-availableNow) streams: with ProcessingTimeTimeout the
    engine keeps scheduling micro-batches to evaluate timeouts, so an
    availableNow run never terminates.

    ``max_buffered_rows`` fails fast (TransactionBufferCeiling) when one
    xid buffers more rows than the apply path's measured operating
    envelope, naming the foreachBatch assembler as the mandated route —
    instead of dying later as an opaque JVM StackOverflow at ~4M rows
    (BASELINE.md, tools/giant_txn_probe.py). Pass a larger value (or 0 to
    disable) only with a measured envelope to back it.
    """

    def assemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (xid,) = key
        if state.hasTimedOut:
            # abandoned transaction eviction — the guard the reference lacks
            state.remove()
            return

        if state.exists:
            rows_json, contains_rb = state.get
            buf: list[dict] = json.loads(rows_json)
            started = True
        else:
            buf, contains_rb, started = [], False, False

        emitted: list[dict] = []
        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values(["scn", "rs_id"], kind="mergesort")

        # columnar pass: between two control events every row is a DML
        # append, so the buffer grows by SLICES of the pre-normalized dicts
        # and the Python loop runs only over control events (see
        # _normalize_rows — this is the iterrows fix)
        norm = _normalize_rows(events)
        ops = events["operation"].to_numpy()
        rb_mask = events["rollback"].to_numpy() == "1"
        ctrl = np.flatnonzero(np.isin(ops, _CTRL_OPS))

        def _absorb(lo: int, hi: int) -> None:
            nonlocal contains_rb, started
            if hi > lo:
                buf.extend(norm[lo:hi])
                contains_rb = contains_rb or bool(rb_mask[lo:hi].any())
                started = True

        dropped = False
        seg_start = 0
        for c in ctrl:
            _absorb(seg_start, c)
            op = ops[c]
            if op == "START":
                buf, contains_rb, started = [], False, True
            elif op == "ROLLBACK":
                buf, contains_rb, started = [], False, False
                dropped = True
            else:  # COMMIT
                if started or buf:
                    rows = _merge_csf(buf)
                    if contains_rb:
                        rows = _repair_pairs(rows)
                    cscn = (
                        int(events["scn"].iloc[c])
                        if pd.isna(events["commit_scn"].iloc[c])
                        else int(events["commit_scn"].iloc[c])
                    )
                    cts = _ts_to_str(events["commit_timestamp"].iloc[c])
                    for r in rows:
                        r["commit_scn"] = cscn
                        r["commit_timestamp"] = cts
                        emitted.append(r)
                buf, contains_rb, started = [], False, False
                dropped = True
            seg_start = c + 1
        _absorb(seg_start, len(events))

        if max_buffered_rows and len(buf) > max_buffered_rows:
            raise TransactionBufferCeiling(
                f"transaction xid={xid!r} buffered {len(buf):,} rows, over "
                f"the apply-path ceiling of {max_buffered_rows:,} "
                "(applyInPandasWithState keeps each xid's buffer as ONE "
                "state value; the measured failure point is ~4M rows/xid — "
                "BASELINE.md). Route this workload through the foreachBatch "
                "assembler: kafka_connect_logminer2_spark.streaming."
                "transactions_fb.write_cdc_foreachbatch, or raise "
                "max_buffered_rows explicitly with a measured envelope."
            )
        if buf or (started and not dropped):
            state.update((json.dumps(buf, default=str), bool(contains_rb)))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()

        if emitted:
            # CHUNKED commit emission (giant-txn guard): a single-xid
            # million-row transaction commits all at once — materializing
            # ONE pandas frame (and one Arrow batch) for it doubles the
            # buffer's footprint at the worst moment. Slicing the emit
            # bounds each frame/Arrow batch at _EMIT_CHUNK_ROWS with
            # identical rows and order (append mode concatenates yields).
            # The per-xid STATE is still one JSON string (GroupState is
            # single-row by API) — the measured ceiling and the fb
            # assembler's role at that scale are recorded in BASELINE.md.
            cols = [f.name for f in OUTPUT_SCHEMA.fields]
            for lo in range(0, len(emitted), emit_chunk_rows):
                out = pd.DataFrame(emitted[lo:lo + emit_chunk_rows])
                out["xid"] = xid
                out["timestamp"] = pd.to_datetime(out["timestamp"])
                out["commit_timestamp"] = pd.to_datetime(
                    out["commit_timestamp"]
                )
                yield out[cols]

    return assemble


def assemble_transactions_stream(
    redo_stream: DataFrame,
    timeout_ms: int | None = None,
    max_buffered_rows: int = _MAX_BUFFERED_ROWS,
) -> DataFrame:
    """Streaming equivalent of operators.transactions.assemble_transactions.

    Input: a *streaming* DataFrame of redo events (FIXTURES.md §2.1 schema).
    Output: committed DMLRow-shaped rows, emitted in the micro-batch where
    their COMMIT arrives. Pass ``timeout_ms`` for continuous streams only
    (abandoned-txn eviction); leave None for availableNow/replay runs.
    ``max_buffered_rows`` is the apply-path per-xid ceiling (see
    make_assembler) — above it, use transactions_fb.write_cdc_foreachbatch.
    """
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return redo_stream.groupBy("xid").applyInPandasWithState(
        make_assembler(timeout_ms, max_buffered_rows=max_buffered_rows),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
