"""File-format breadth for the redo source: JSON-lines, CSV, and ORC.

The reference's only input is the ``v$logmnr_contents`` cursor; our engine's
redo stream is a plain DataFrame, so any Spark file source can carry it.
Parquet is the performance path (columnar, predicate pushdown); JSON-lines is
the interchange/debug path (what a Kafka topic of redo records looks like on
disk); CSV exists for the lowest-common-denominator export. Both read with
the explicit REDO_SCHEMA — never inferSchema, which would (a) scan the data
twice and (b) type ``scn`` by luck of the sample at 100 TB.

Every reader returns the same schema as the parquet path, so the whole CDC
pipeline (parse → assemble → envelope) is source-agnostic; the roundtrip is
proven in tests/test_redo_files.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .redo import REDO_SCHEMA

# CSV cannot distinguish null from empty string without an explicit marker;
# sql_redo legitimately contains commas, quotes and newlines (CSF fragments),
# so quoting+escaping and multiLine are load-bearing, not defensive.
_CSV_OPTS = {
    "header": "true",
    "nullValue": "\\N",
    "emptyValue": "",
    "escape": '"',
    "multiLine": "true",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss",
}


def write_redo_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_redo_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(REDO_SCHEMA).json(path)


def read_redo_stream_json(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of read_redo_json — same ordering contract as
    streaming/pipeline.py::read_redo_stream_files (SCN order across files,
    mtime-ordered pickup)."""
    reader = spark.readStream.schema(REDO_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def write_redo_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def read_redo_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(REDO_SCHEMA).options(**_CSV_OPTS).csv(path)


def write_redo_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_redo_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC twin of the parquet path — the other columnar format Spark ships
    natively (predicate pushdown + column pruning work the same way). The
    explicit schema keeps the contract identical to the other readers even
    though ORC carries its own."""
    return spark.read.schema(REDO_SCHEMA).orc(path)
