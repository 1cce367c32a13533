"""Per-job/stage wall-time attribution for one registry entry (guide §1).

Usage: python tools/profile_entry.py <entry> [<entry> ...] [--runs 2]

Runs each entry with the Spark event log enabled, then parses the log to
print every job (submit→end wall, description/callsite) and the heaviest
stages (executor run time, shuffle bytes, python eval time if present).
This is the empirical side of the optimization loop: it answers "which of
the entry's N actions is the expensive one" without touching engine code.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 1
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args

    evdir = tempfile.mkdtemp(prefix="spark_events_")
    from kafka_connect_logminer2_spark.plans import queries as Q
    from kafka_connect_logminer2_spark.session import get_spark

    spark = get_spark(
        app_name="profile_entry",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            # plain single-file JSON logs (Spark 4 defaults to rolling
            # zstd-compressed directories, unreadable by the parser below)
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = Q.queries()

    # warmup (JVM codegen, python workers)
    registry["q01_pricing_summary"](spark, "/root/testdata/sf0.001").count()

    marks = []
    for name in names:
        for r in range(runs):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"{name}#run{r}")
            registry[name](spark, sf_dir).count()
            spark.sparkContext.setJobDescription(None)
            dt = time.time() - t0
            marks.append((name, r, t0, dt))
            print(f"== {name} run{r}: {dt:.2f}s", flush=True)

    spark.stop()

    # parse the event log (Spark 4 may write a rolling-log DIRECTORY of
    # events_* part files instead of a single file)
    logs = []
    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        if os.path.isdir(p):
            logs.extend(
                os.path.join(p, g) for g in os.listdir(p)
                if g.startswith("events_") or g.endswith(".inprogress")
            )
        else:
            logs.append(p)
    events = []
    for lf in logs:
        with open(lf) as f:
            for line in f:
                try:
                    events.append(json.loads(line))
                except Exception:
                    pass

    jobs = {}
    stages = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            props = e.get("Properties") or {}
            jobs[jid] = {
                "start": e["Submission Time"] / 1000.0,
                "desc": props.get("spark.job.description")
                or (e.get("Stage Infos") or [{}])[0].get("Stage Name", ""),
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = e["Completion Time"] / 1000.0
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            t0 = si.get("Submission Time")
            t1 = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", "")[:100],
                "wall": ((t1 - t0) / 1000.0) if t0 and t1 else 0.0,
                "tasks": si.get("Number of Tasks", 0),
            }

    print("\n#### jobs by wall time (desc | wall s | stage walls)")
    rows = []
    for jid, j in jobs.items():
        if "end" not in j:
            continue
        wall = j["end"] - j["start"]
        st = [(sid, stages.get(sid, {}).get("wall", 0.0)) for sid in j["stages"]]
        st = [x for x in st if x[1] > 0]
        rows.append((wall, jid, j["desc"], st))
    rows.sort(reverse=True)
    for wall, jid, desc, st in rows[:60]:
        stxt = " ".join(f"s{sid}:{w:.2f}" for sid, w in st)
        print(f"{wall:7.2f}s  job{jid:<4d} {desc[:90]}  [{stxt}]")

    print(f"\nevent log dir: {evdir}")


if __name__ == "__main__":
    main()
