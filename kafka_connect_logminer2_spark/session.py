"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join handling on,
Arrow for pandas interchange) while staying correct on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Deterministic timezone: ntz↔ltz casts are identity under UTC, which
    # keeps watermarked streaming plans consistent with the ntz batch tables.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime re-plan, skew-join splitting, partition
    # coalescing — essential at scale, free locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched pandas UDF transfer (the CDC parser is a pandas UDF).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects by default; read as long and normalize in the loader
    # (sources/tables.py) — matches DuckDB's ns→µs truncation.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Bound per-task input at the target SF; at 100 TB the same setting keeps
    # scan partitions ~128 MB which is the sweet spot for parquet.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Session-window / stateful ops: RocksDB keeps state off-heap and
    # spillable — the reference's unbounded in-heap LinkedHashMap is the
    # anti-pattern we're replacing (LogMinerThread2.java:81).
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # local[N] runs driver==executor in ONE JVM whose default heap is 1 GiB —
    # 32 concurrent tasks sharing that starves shuffles and pins localCheckpoint
    # blocks into eviction storms (the 10x scale probe OOMed). On a real
    # cluster spark-submit's --driver-memory/--executor-memory override this;
    # setting it here only takes effect at JVM launch (getOrCreate of an
    # existing session ignores it, like any spark.driver.* key).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def enable_vendored_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver AND python workers) from
    the vendored bridge in ``<repo>/vendor`` — no package installation.

    The ``transformWithStateInPandas`` worker imports ``google.protobuf`` to
    speak the state-server protocol; this container has no protobuf install,
    but the google-cloud-sdk on the image ships a pure-Python runtime. The
    ``vendor/google`` bridge package re-exports it (see its docstring).

    Must run BEFORE the SparkSession/JVM is created so the PYTHONPATH and
    implementation env vars propagate to python workers. Returns True when
    ``google.protobuf`` is importable afterwards.
    """
    import importlib.util
    import sys

    vendor = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")
    if os.path.isdir(os.path.join(vendor, "google")):
        if vendor not in sys.path:
            sys.path.insert(0, vendor)
        pp = os.environ.get("PYTHONPATH", "")
        if vendor not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = vendor + (os.pathsep + pp if pp else "")
        # the SDK copy has no compiled upb for this interpreter — force the
        # pure-Python wire implementation everywhere
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        if importlib.util.find_spec("google.protobuf") is None:
            return False
        import google.protobuf  # noqa: F401  (validates the bridge actually loads)

        return True
    except Exception:
        return False


def get_spark(
    app_name: str = "kafka_connect_logminer2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores); on a real cluster pass ``None`` master via spark-submit and the
    defaults still apply.
    """
    # before JVM launch so PYTHONPATH/impl env reach python workers — makes
    # the transformWithState runtime available in ANY entry path (driver
    # harness, bench, tools) without each caller having to remember it
    enable_vendored_protobuf()
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
