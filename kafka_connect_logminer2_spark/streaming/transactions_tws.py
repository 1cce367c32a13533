"""Transaction assembly on Spark 4's ``transformWithStateInPandas`` — the
second (modern) implementation of reference operators A15-A17.

Why a second path next to ``applyInPandasWithState`` (transactions.py):
``GroupState`` is a single value — every micro-batch that touches a long
transaction deserializes, rewrites, and reserializes its ENTIRE buffer. The
``transformWithState`` API exposes composable state primitives; the buffer
becomes a **ListState** with O(new rows) ``appendList`` per batch, so a
million-row transaction (the reference's unbounded-heap nightmare,
LogMinerThread2.java:81) costs each micro-batch only its increment. Flags
(contains_rollback / started) live in a tiny ValueState, and abandoned-txn
eviction uses real per-key timers instead of the blunt group-state timeout.

Same state machine as transactions.py (LogMinerThread2.java:142-309):
START creates, DML appends (CSF merged at commit), COMMIT repairs
partial-rollback pairs + stamps commit scn/ts + emits in redo order,
ROLLBACK discards. Parity with the applyInPandasWithState path is proven by
tests/test_streaming_tws.py (same inputs → identical committed rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .transactions import OUTPUT_SCHEMA, _merge_csf, _repair_pairs, _ts_to_str

# one buffered DMLRow per ListState entry (timestamps as ISO strings — the
# list element schema is plain SQL types)
_BUF_SCHEMA = (
    "scn long, ts string, operation string, seg_owner string, table_name string, "
    "row_id string, sql_redo string, rollback string, rs_id string, csf boolean"
)
_FLAGS_SCHEMA = "contains_rollback boolean, started boolean"
_BUF_COLS = (
    "scn", "ts", "operation", "seg_owner", "table_name",
    "row_id", "sql_redo", "rollback", "rs_id", "csf",
)


def _opt(v):
    return None if v is None or (isinstance(v, float) and pd.isna(v)) else v


class TransactionProcessor(StatefulProcessor):
    """Per-XID transaction state machine over composable state."""

    def __init__(self, timeout_ms: int | None = None):
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getListState("buf", _BUF_SCHEMA)
        self._flags = handle.getValueState("flags", _FLAGS_SCHEMA)
        self._handle = handle

    def _emit_commit(
        self, xid: str, commit_scn: int, commit_ts, contains_rb: bool
    ) -> pd.DataFrame | None:
        rows = [
            {
                "scn": t[0], "timestamp": t[1], "operation": t[2], "seg_owner": t[3],
                "table_name": t[4], "row_id": t[5], "sql_redo": t[6],
                "rollback": t[7], "rs_id": t[8], "csf": t[9],
            }
            for t in self._buf.get()
        ]
        rows = _merge_csf(rows)
        if contains_rb:
            rows = _repair_pairs(rows)
        if not rows:
            return None
        out = pd.DataFrame(rows)
        out["xid"] = xid
        out["commit_scn"] = commit_scn
        out["commit_timestamp"] = pd.to_datetime(commit_ts)
        out["timestamp"] = pd.to_datetime(out["timestamp"])
        return out[[f.name for f in OUTPUT_SCHEMA.fields]]

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (xid,) = key
        events = pd.concat(list(rows), ignore_index=True)
        events = events.sort_values(["scn", "rs_id"], kind="mergesort")

        contains_rb, started = False, False
        if self._flags.exists():
            contains_rb, started = (bool(v) for v in self._flags.get())

        pending: list[tuple] = []  # rows not yet flushed to ListState
        alive = started or self._buf.exists()

        for _, ev in events.iterrows():
            op = ev["operation"]
            if op == "START":
                self._buf.clear()
                pending, contains_rb, started, alive = [], False, True, True
            elif op == "ROLLBACK":
                self._buf.clear()
                pending, contains_rb, started, alive = [], False, False, False
            elif op == "COMMIT":
                if pending:
                    self._buf.appendList(pending)
                    pending = []
                if alive:
                    cscn = int(ev["scn"]) if pd.isna(ev["commit_scn"]) else int(ev["commit_scn"])
                    out = self._emit_commit(
                        xid, cscn, _ts_to_str(ev["commit_timestamp"]), contains_rb
                    )
                    if out is not None:
                        yield out
                self._buf.clear()
                pending, contains_rb, started, alive = [], False, False, False
            else:  # INSERT/UPDATE/DELETE/DDL
                if ev.get("rollback") == "1":
                    contains_rb = True
                pending.append(
                    (
                        int(ev["scn"]),
                        _ts_to_str(ev["timestamp"]),
                        _opt(ev["operation"]),
                        _opt(ev["seg_owner"]),
                        _opt(ev["table_name"]),
                        _opt(ev["row_id"]),
                        _opt(ev["sql_redo"]),
                        _opt(ev["rollback"]),
                        _opt(ev["rs_id"]),
                        bool(ev["csf"]) if not pd.isna(ev["csf"]) else False,
                    )
                )
                started = alive = True

        if pending:
            self._buf.appendList(pending)  # O(increment), not O(buffer)
        if alive:
            self._flags.update((contains_rb, started))
            if self._timeout_ms is not None:
                self._handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + self._timeout_ms
                )
        else:
            self._flags.clear()

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # abandoned-transaction eviction (the guard the reference lacks)
        self._buf.clear()
        self._flags.clear()
        return iter(())

    def close(self) -> None:
        pass


def assemble_transactions_tws(
    redo_stream: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """transformWithStateInPandas twin of assemble_transactions_stream —
    identical output contract, ListState-backed buffering."""
    return redo_stream.groupBy("xid").transformWithStateInPandas(
        statefulProcessor=TransactionProcessor(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None" if timeout_ms is None else "ProcessingTime",
    )
