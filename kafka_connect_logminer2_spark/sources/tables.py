"""Fixture-table loaders for the driver's deterministic parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file each under
/root/testdata/sf{0.001,0.01,0.1}/.

``events.ts`` is parquet TIMESTAMP(NANOS) which Spark cannot read natively;
with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a raw
nanosecond long and is normalized here to TimestampNTZ by integer-dividing to
microseconds — exactly DuckDB's ns→µs truncation, so oracle comparisons match.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable SQL conf; makes the loader work under sessions NOT
        # built by session.get_spark (e.g. the round driver's own harness) —
        # without it the TIMESTAMP(NANOS) column is an unreadable-type error
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs truncation; timestamp_micros yields TimestampType, cast to
        # NTZ to match the other tables' parquet isAdjustedToUTC=false reads.
        # integer `div`, not floor(double/1000): ns epochs exceed double's 53-bit
        # integer range, and the rounding error shifts some stamps by 1µs
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
