"""Bucketed (co-located) tables — the shuffle-elimination layout for
repeated fact-fact joins.

At 100 TB the dominant cost of a lineitem ⋈ orders query is shuffling both
facts on the join key every single run. Bucketing pays that shuffle ONCE at
write time: both tables are hash-partitioned into the same number of buckets
on the key and each bucket is sorted, so every subsequent join is a
zero-exchange (and with sortBy, zero-sort) sort-merge over co-located
buckets. The reference has no analog — its "joins" run inside Oracle
(SURVEY §2B7) — so this is pure engine-side scale work.

Spark only reads bucket metadata through the catalog, so bucketed tables
materialize via ``saveAsTable`` (path-based ``parquet.save`` drops the
bucket spec). Bucket count rule of thumb at scale: total-size / 128 MB,
rounded to a power of two shared by every table that joins on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a catalog table bucketed (and bucket-sorted)
    on ``bucket_cols`` — one shuffle now, none on any later join/agg
    keyed by a prefix of ``bucket_cols``."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def bucketed_ready(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)
