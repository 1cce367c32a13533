"""Dump ``explain("formatted")`` for registry entries to plans/<tag>/.

Usage: python tools/plan_dump.py <out_subdir> [entry ...] [--suffix before|after]

Writes plans/<out_subdir>/<entry>_<suffix>.txt for each named entry (default:
every bench.py HEADLINE entry). Building an entry's DataFrame executes any
driver-side work in its body (store entries run their pipelines), but the
returned plan is compiled, not executed — this is the optimization round's
evidence trail (guide §1: capture plan shape before and after each change).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    out_sub, names = args[0], args[1:]

    from bench import HEADLINE
    from kafka_connect_logminer2_spark.plans import queries as Q
    from kafka_connect_logminer2_spark.session import get_spark

    spark = get_spark(
        app_name="plan_dump",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = Q.queries()
    if not names:
        names = list(HEADLINE)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        out_sub,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
