"""Compaction: many small files in, few size-targeted files out, content
identical, sorted variant gives tight per-file min/max envelopes."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.operators.compaction import (
    compact_parquet,
    parquet_files_and_bytes,
)
from kafka_connect_logminer2_spark.sources.tables import load_table


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(40).write.parquet(src)

    stats = compact_parquet(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 40
    assert stats["files_after"] < 5

    a = sorted(r.o_orderkey for r in spark.read.parquet(src).collect())
    b = sorted(r.o_orderkey for r in spark.read.parquet(dest).collect())
    assert a == b


def test_compact_sorted_files_have_disjoint_key_ranges(spark, sf_dir, tmp_path):
    src, dest = str(tmp_path / "frag"), str(tmp_path / "sorted")
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(src)
    compact_parquet(
        spark, src, dest, target_file_bytes=64 * 1024, sort_cols=["o_orderkey"]
    )
    df = spark.read.parquet(dest)
    n_files, _ = parquet_files_and_bytes(df)
    assert n_files > 1  # tiny target forces a multi-file layout

    ranges = []
    for f in df.inputFiles():
        path = f[len("file:") :] if f.startswith("file:") else f
        t = pq.read_table(path, columns=["o_orderkey"])
        keys = t.column("o_orderkey").to_pylist()
        ranges.append((min(keys), max(keys)))
    ranges.sort()
    # range-partitioned + sorted ⇒ files cover disjoint key intervals, so a
    # point/range predicate prunes every other file via min/max stats
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_zorder_files_bound_both_dimensions(spark, sf_dir, tmp_path):
    """A z-ordered layout keeps per-file min/max envelopes tight on BOTH
    curve columns; a single-column range sort leaves the second column
    spanning ~the full domain in every file. Predicates on either column
    then skip most files via footer stats."""
    src = str(tmp_path / "frag")
    zdest, sdest = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(src)
    compact_parquet(
        spark, src, zdest, target_file_bytes=4 * 1024,
        zorder_cols=["o_custkey", "o_orderkey"],
    )
    compact_parquet(
        spark, src, sdest, target_file_bytes=4 * 1024, sort_cols=["o_custkey"]
    )

    def mean_coverage(dest: str, col: str) -> float:
        df = spark.read.parquet(dest)
        glo, ghi = df.agg(F.min(col), F.max(col)).collect()[0]
        span = float(ghi - glo)
        fracs = []
        for f in df.inputFiles():
            path = f[len("file:") :] if f.startswith("file:") else f
            keys = pq.read_table(path, columns=[col]).column(col).to_pylist()
            fracs.append((max(keys) - min(keys)) / span)
        assert len(fracs) > 4  # tiny target forces a multi-file layout
        return sum(fracs) / len(fracs)

    # z-order: both dimensions materially tighter than the full domain
    assert mean_coverage(zdest, "o_custkey") < 0.5
    assert mean_coverage(zdest, "o_orderkey") < 0.5
    # single-column sort: first dim tight, second dim ~full width per file
    assert mean_coverage(sdest, "o_custkey") < 0.2
    assert mean_coverage(sdest, "o_orderkey") > 0.8

    # content identical to the source
    a = sorted(r.o_orderkey for r in spark.read.parquet(src).collect())
    b = sorted(r.o_orderkey for r in spark.read.parquet(zdest).collect())
    assert a == b


def test_zorder_key_matches_python_morton(spark):
    """zorder_key's shift/mask expression tree must equal a reference Morton
    encoder: scale each value to an 8-bit cell, interleave bits LSB-first."""
    rows = [(i, (i * 37) % 101) for i in range(101)]
    df = spark.createDataFrame(rows, ["a", "b"])
    from kafka_connect_logminer2_spark.operators.compaction import zorder_key

    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key(df, ["a", "b"], bits=8)).collect()
    }

    def morton(a, b, lo_a, hi_a, lo_b, hi_b, bits=8):
        n = (1 << bits) - 1
        ca = int((a - lo_a) / (hi_a - lo_a) * n)
        cb = int((b - lo_b) / (hi_b - lo_b) * n)
        z = 0
        for i in range(bits):
            z |= ((ca >> i) & 1) << (2 * i)
            z |= ((cb >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b, 0, 100, 0, 100), (a, b)
