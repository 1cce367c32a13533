"""Auto skew-route probe for CDC assembly (operators/transactions.py):
what does skew_salts='auto' cost on a BALANCED log (detection overhead,
should keep the window route) and what does it buy on a HOT log (one xid
carrying ~10% of events, should flip to the salted route)?

Prints one JSON line per (fixture, route) with wall-seconds and committed
row counts, plus the detector's share estimate per fixture — the
BASELINE.md rows for the auto policy.

Usage: python tools/skew_auto_probe.py [n_events]   # default 600_000
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from kafka_connect_logminer2_spark.operators.transactions import (  # noqa: E402
    assemble_transactions,
    detect_xid_skew,
)
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from test_skew_cdc import _skewed_redo  # noqa: E402  (fixture generator)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    spark = get_spark(
        app_name="skew_auto_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    fixtures = {
        "hot10pct": _skewed_redo(spark, n_events=n_events, hot_frac=0.10),
        "balanced": _skewed_redo(spark, n_events=n_events, hot_frac=1e-9),
    }
    for name, redo in fixtures.items():
        redo = redo.persist()
        redo.count()  # materialize the fixture outside the timings
        t0 = time.time()
        share = detect_xid_skew(redo)
        print(
            json.dumps(
                {
                    "fixture": name,
                    "events": n_events,
                    "detector_share": round(share, 4),
                    "detector_sec": round(time.time() - t0, 2),
                }
            )
        )
        for route, salts in (("window", None), ("salted16", 16), ("auto", "auto")):
            t0 = time.time()
            n = assemble_transactions(redo, skew_salts=salts).count()
            print(
                json.dumps(
                    {
                        "fixture": name,
                        "route": route,
                        "sec": round(time.time() - t0, 2),
                        "committed_rows": n,
                    }
                )
            )
        redo.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
