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

import numpy as np
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


def _normalize_tuples(events: pd.DataFrame) -> list[tuple]:
    """Columnar normalization into ListState element tuples (the
    transactions.py::_normalize_rows twin, tuple-shaped for appendList) —
    one cast/NaN-fix per COLUMN instead of per event."""

    def _objs(col: str) -> list:
        s = events[col]
        return s.where(s.notna(), None).tolist()

    return list(
        zip(
            events["scn"].astype("int64").tolist(),
            events["timestamp"].map(_ts_to_str).tolist(),
            _objs("operation"),
            _objs("seg_owner"),
            _objs("table_name"),
            _objs("row_id"),
            _objs("sql_redo"),
            _objs("rollback"),
            _objs("rs_id"),
            events["csf"].fillna(False).astype(bool).tolist(),
        )
    )


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

        # columnar pass (same shape as transactions.py::assemble): normalize
        # every column once at C speed, then loop only over control events —
        # DML runs between controls join `pending` as list slices
        tuples = _normalize_tuples(events)
        ops = events["operation"].to_numpy()
        rb_mask = events["rollback"].to_numpy() == "1"
        ctrl = np.flatnonzero(np.isin(ops, ("START", "ROLLBACK", "COMMIT")))

        def _absorb(lo: int, hi: int) -> None:
            nonlocal contains_rb, started, alive
            if hi > lo:
                pending.extend(tuples[lo:hi])
                contains_rb = contains_rb or bool(rb_mask[lo:hi].any())
                started = alive = True

        seg_start = 0
        for c in ctrl:
            _absorb(seg_start, c)
            op = ops[c]
            if op == "START":
                self._buf.clear()
                pending, contains_rb, started, alive = [], False, True, True
            elif op == "ROLLBACK":
                self._buf.clear()
                pending, contains_rb, started, alive = [], False, False, False
            else:  # COMMIT
                if pending:
                    self._buf.appendList(pending)
                    pending = []
                if alive:
                    cscn = (
                        int(events["scn"].iloc[c])
                        if pd.isna(events["commit_scn"].iloc[c])
                        else int(events["commit_scn"].iloc[c])
                    )
                    out = self._emit_commit(
                        xid,
                        cscn,
                        _ts_to_str(events["commit_timestamp"].iloc[c]),
                        contains_rb,
                    )
                    if out is not None:
                        yield out
                self._buf.clear()
                pending, contains_rb, started, alive = [], False, False, False
            seg_start = c + 1
        _absorb(seg_start, len(events))

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
