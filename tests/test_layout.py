"""functions/layout.py: Morton keys and z-ordered writes.

Three gates: (1) the Spark key equals a bit-by-bit pure-python Morton
reference, (2) the DuckDB SQL twin is bit-identical to Spark over a
domain sweep (the cross-engine contract q139 rides), (3) the LAYOUT
PAYOFF is measured, not asserted: for a box predicate on both dimensions,
a z-ordered file set must let footer-stats pruning skip files that a
single-column-sorted layout cannot — checked with the same min/max
row-group statistics any engine's scan pruning consumes.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.layout import (
    files_overlapping_box,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)


def _morton_py(vals: list[int], bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


SAMPLE = [
    (0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (12345, 54321),
    (65535, 65535), (65535, 0), (40000, 1), (2, 60000),
]


def test_matches_pure_python_morton(spark):
    df = spark.createDataFrame(SAMPLE, "x long, y long")
    rows = df.select(
        "x", "y", zorder_key(["x", "y"]).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _morton_py([r["x"], r["y"]]), (r["x"], r["y"])


def test_truncates_to_bits(spark):
    df = spark.createDataFrame([(65536 + 3, 5)], "x long, y long")
    (r,) = df.select(zorder_key(["x", "y"]).alias("z")).collect()
    assert r["z"] == _morton_py([3, 5])  # x wrapped to low 16 bits


def test_sql_twin_bit_identical(spark):
    xs = [0, 1, 7, 255, 256, 12345, 40000, 65535, 65536 + 9, 10**9 + 7]
    pairs = [(x, y) for x in xs for y in (0, 3, 999, 65535, 123456)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    }
    con = duckdb.connect()
    sql = zorder_key_sql(["x", "y"])
    for (x, y), z in got.items():
        (dz,) = con.execute(
            f"SELECT {sql} FROM (SELECT {x}::BIGINT AS x, {y}::BIGINT AS y)"
        ).fetchone()
        assert dz == z, (x, y)


def test_invalid_args(spark):
    with pytest.raises(ValueError):
        zorder_key(["x"])
    with pytest.raises(ValueError):
        zorder_key(["x", "y", "w"])
    with pytest.raises(ValueError):
        zorder_key(["x", "y"], bits=20)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    # 64×64 grid of points; 16 files; box = one 16×16 corner (1/16 of the
    # domain in 2-D). z-ordered layout: box touches few files. x-sorted
    # layout: every file spans all y, so a y-constrained box can only
    # prune via x — and an x-constrained-only predicate on the Z layout
    # still behaves sanely (each dimension's envelope stays bounded).
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    zdir, xdir = str(tmp_path / "z"), str(tmp_path / "x")
    write_zordered(df, ["x", "y"], zdir, n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xdir)
    )
    box = {"x": (0, 15), "y": (0, 15)}
    z_hit, z_total = files_overlapping_box(zdir, box)
    x_hit, x_total = files_overlapping_box(xdir, box)
    assert z_total == 16 and x_total == 16
    # x-sorted: x∈[0,15] is 1/4 of rows → ~4 files, y prunes nothing.
    # z-ordered: the corner is 1/16 of the space → 1-2 files.
    assert z_hit < x_hit
    assert z_hit <= 2
    # correctness: both layouts still hold all the data
    assert spark.read.parquet(zdir).count() == 64 * 64
    got = (
        spark.read.parquet(zdir)
        .filter((F.col("x") <= 15) & (F.col("y") <= 15))
        .count()
    )
    assert got == 256
