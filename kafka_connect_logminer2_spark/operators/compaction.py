"""Small-file compaction for parquet sinks.

A streaming CDC sink writes one file set per micro-batch (see
streaming/pipeline.py::write_per_table); at a 1-minute trigger that is
~1,440 file sets/day/table. Small files poison the read path at scale:
footer-per-file planning cost, under-filled scan partitions, and NameNode/
object-store pressure. Compaction rewrites a table directory into
size-targeted files, optionally sorted so min/max row-group stats become
selective (the data-skipping analog of the reference resuming from a log
file's FIRST_CHANGE#, SURVEY §4 "incremental restart").

Pattern at scale: run per-partition-directory, target
``spark.sql.files.maxPartitionBytes`` (128 MB default, session.py), sort by
the dominant predicate column (commit_scn for CDC tables). The rewrite is
itself a distributed job — no driver-side file juggling.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _local_path(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def parquet_files_and_bytes(df: DataFrame) -> tuple[int, int]:
    """(file_count, total_bytes) of the parquet inputs backing ``df``.
    Uses the plan's own file index (inputFiles), so it sees exactly what a
    scan would read."""
    files = df.inputFiles()
    total = sum(os.path.getsize(_local_path(f)) for f in files)
    return len(files), total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite the parquet table at ``src`` into ``dest`` with files sized
    to ``target_file_bytes``. With ``sort_cols``, rows are range-sorted so
    each output file covers a narrow key interval — min/max stats then prune
    whole files for predicates on those columns. Returns before/after file
    counts. The caller owns the swap (rename dest over src) because swap
    atomicity is filesystem-specific."""
    df = spark.read.parquet(src)
    n_before, total = parquet_files_and_bytes(df)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if sort_cols:
        # repartitionByRange + in-partition sort = globally ordered files,
        # each with a tight min/max envelope on sort_cols
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dest)
    n_after = len(spark.read.parquet(dest).inputFiles())
    return {"files_before": n_before, "files_after": n_after, "bytes": total}
