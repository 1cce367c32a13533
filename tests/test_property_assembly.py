"""Property-based test (SURVEY §5.4): random transaction interleavings →
batch assembly must match an independent Python simulator of the reference's
state machine (LogMinerThread2.java:142-309).

The simulator is written directly from the reference's semantics (buffer per
xid; COMMIT emits with pair repair; ROLLBACK discards; DML without START
creates the buffer) and shares no code with the engine under test.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_logminer2_spark.operators.transactions import assemble_transactions
from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows

INS = 'insert into "TPCH"."T"("A") values ({})'


@st.composite
def txn_logs(draw):
    """Generate an interleaved redo log over a few transactions."""
    n_txns = draw(st.integers(2, 5))
    events = []  # (xid, kind, rollback_flag)
    for t in range(n_txns):
        xid = f"x{t}"
        body = [("START", "0")] if draw(st.booleans()) else []
        n_dml = draw(st.integers(0, 4))
        for _ in range(n_dml):
            body.append(("DML", "0"))
        # optionally a partial-rollback pair (change + compensating row)
        if draw(st.booleans()) and body:
            body.append(("DML", "0"))
            body.append(("DML", "1"))
        body.append(("COMMIT", "0") if draw(st.booleans()) else ("ROLLBACK", "0"))
        events.append([(xid, k, rb) for k, rb in body])
    # interleave transactions preserving per-txn order
    log = []
    cursors = [0] * n_txns
    while any(cursors[i] < len(events[i]) for i in range(n_txns)):
        choices = [i for i in range(n_txns) if cursors[i] < len(events[i])]
        i = draw(st.sampled_from(choices))
        log.append(events[i][cursors[i]])
        cursors[i] += 1
    return log


def simulate(log):
    """Reference state machine, straight from LogMinerThread2.java:142-309."""
    buf: dict[str, list] = {}
    contains_rb: dict[str, bool] = {}
    emitted = []
    for scn, (xid, kind, rb) in enumerate(log, start=1):
        if kind == "START":
            buf[xid] = []
            contains_rb[xid] = False
        elif kind == "ROLLBACK":
            buf.pop(xid, None)
        elif kind == "COMMIT":
            if xid in buf:
                rows = buf.pop(xid)
                if contains_rb.get(xid):
                    # pair deletion (:163-185)
                    drop = set()
                    for i, (s, flag) in enumerate(rows):
                        if flag == "1":
                            drop.add(i)
                            if i - 1 >= 0:
                                drop.add(i - 1)
                    rows = [r for i, r in enumerate(rows) if i not in drop]
                emitted.extend((s, scn) for s, _ in rows)  # (scn, commit_scn)
        else:  # DML
            buf.setdefault(xid, [])
            contains_rb.setdefault(xid, False)
            buf[xid].append((scn, rb))
            if rb == "1":
                contains_rb[xid] = True
    return sorted(emitted)


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(txn_logs())
def test_assembly_matches_reference_simulator(spark, log):
    rows = []
    for scn, (xid, kind, rb) in enumerate(log, start=1):
        if kind == "DML":
            rows.append(
                dict(scn=scn, operation="INSERT", xid=xid, table_name="T",
                     sql_redo=INS.format(scn), row_id=f"r{scn}", rollback=rb)
            )
        else:
            rows.append(
                dict(scn=scn, operation=kind, xid=xid,
                     commit_scn=scn if kind == "COMMIT" else None)
            )
    got = sorted(
        (r["scn"], r["commit_scn"])
        for r in assemble_transactions(redo_events_from_rows(spark, rows)).collect()
    )
    assert got == simulate(log)
