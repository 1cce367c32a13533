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

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _drop_stale_location(spark: SparkSession, table: str) -> None:
    """A managed table's directory can outlive its catalog entry (the
    default in-memory catalog dies with the session; spark-warehouse/ does
    not). saveAsTable then fails LOCATION_ALREADY_EXISTS. The directory is
    a derived cache here, so an orphaned one — location present, catalog
    entry absent — is safe to clear.

    Deletion is deliberately narrow: only with the session-scoped in-memory
    catalog (a persistent metastore saying "absent" could be a
    misconfiguration, not staleness), and only for the layouts this module
    writes — unqualified names or ``db.tbl`` (mapped to the real managed
    layout ``<warehouse>/<db>.db/<tbl>``)."""
    if spark.catalog.tableExists(table):
        return
    if spark.conf.get("spark.sql.catalogImplementation", "in-memory") != "in-memory":
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    warehouse = warehouse[len("file:") :] if warehouse.startswith("file:") else warehouse
    parts = table.lower().split(".")
    if len(parts) == 1:
        path = os.path.join(warehouse, parts[0])
    elif len(parts) == 2:
        path = os.path.join(warehouse, f"{parts[0]}.db", parts[1])
    else:
        return
    shutil.rmtree(path, ignore_errors=True)


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
    _drop_stale_location(df.sparkSession, table)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def bucketed_ready(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)
