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

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _local_path(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def parquet_files_and_bytes(df: DataFrame) -> tuple[int, int]:
    """(file_count, total_bytes) of the parquet inputs backing ``df``.
    Uses the plan's own file index (inputFiles), so it sees exactly what a
    scan would read."""
    files = df.inputFiles()
    total = sum(os.path.getsize(_local_path(f)) for f in files)
    return len(files), total


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-order (Morton) key over ``cols``: each column is min-max scaled to
    ``bits`` bits, then the bits are interleaved, so rows close in EVERY
    dimension get close keys. Sorting a layout by this key gives each file a
    tight min/max envelope on ALL the columns at once — the multi-column
    data-skipping layout a single-column range sort cannot provide (its
    second column spans the full domain in every file).

    Built entirely from shift/mask integer expressions (whole-stage codegen;
    no UDF). Column min/max are collected once driver-side — at 100 TB
    that is one cheap partial-agg pass, amortized over the rewrite. NULLs
    scale to cell 0 (they sort first, same as a plain sort)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    n_cells = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo = float(row[f"lo_{c}"]) if row[f"lo_{c}"] is not None else 0.0
        hi = float(row[f"hi_{c}"]) if row[f"hi_{c}"] is not None else 1.0
        span = (hi - lo) or 1.0
        cell = F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_cells)
        scaled.append(F.coalesce(F.least(F.greatest(cell, F.lit(0)), F.lit(n_cells)), F.lit(0)))
    ncols = len(cols)
    terms = []
    for i in range(bits):
        for j, v in enumerate(scaled):
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * ncols + j)
            )
    key = terms[0]
    for t in terms[1:]:
        key = key + t
    return key


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite the parquet table at ``src`` into ``dest`` with files sized
    to ``target_file_bytes``. With ``sort_cols``, rows are range-sorted so
    each output file covers a narrow key interval — min/max stats then prune
    whole files for predicates on those columns. With ``zorder_cols``
    (mutually exclusive), rows follow the space-filling Morton curve over
    those columns, so per-file envelopes are tight on every listed column.
    Returns before/after file counts. The caller owns the swap (rename dest
    over src) because swap atomicity is filesystem-specific."""
    if sort_cols and zorder_cols:
        raise ValueError("sort_cols and zorder_cols are mutually exclusive")
    df = spark.read.parquet(src)
    n_before, total = parquet_files_and_bytes(df)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if zorder_cols:
        out = (
            df.withColumn("_zkey", zorder_key(df, zorder_cols))
            .repartitionByRange(n_out, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
        )
    elif sort_cols:
        # repartitionByRange + in-partition sort = globally ordered files,
        # each with a tight min/max envelope on sort_cols
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dest)
    n_after = len(spark.read.parquet(dest).inputFiles())
    return {"files_before": n_before, "files_after": n_after, "bytes": total}
