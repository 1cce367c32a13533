"""Cross-engine contract of the overflow-safe Knuth hash (plans/queries.py::
knuth_bucket / knuth_bucket_sql): the r2 idiom ``(id * 2654435761) % 2^32``
silently wraps in Spark's int64 but ERRORS in DuckDB for id ≳ 3.4e9 — the
bit-for-bit-on-any-engine claim broke exactly where shard/split assignment
matters (real corpus ids). The 16/16-split form must (a) equal the naive
form wherever the naive form doesn't overflow (so r2 oracles keep their
values), (b) agree between Spark and DuckDB on the FULL int64 domain,
including negatives, and (c) equal exact unbounded-integer arithmetic.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.plans.queries import knuth_bucket, knuth_bucket_sql

K = 2654435761
IDS = [
    0, 1, 7, 12345, 499, 65535, 65536,
    2**31 - 1, 2**31, 2**32 - 1, 2**32, 3_400_000_000,
    10**15, 2**53 + 1, 2**62, -1, -5, -(2**33) - 7, -(2**62),
]
MODS = (8, 100, 10000)


def _exact(x: int, mod: int) -> int:
    return ((x % 2**32) * K) % 2**32 % mod


@pytest.mark.parametrize("mod", MODS)
def test_spark_equals_exact_arithmetic(spark, mod):
    df = spark.createDataFrame([(i,) for i in IDS], "x long")
    rows = df.select("x", knuth_bucket(F.col("x"), mod).alias("h")).collect()
    for r in rows:
        assert r["h"] == _exact(r["x"], mod), (r["x"], mod)


@pytest.mark.parametrize("mod", MODS)
def test_duckdb_equals_exact_arithmetic(mod):
    con = duckdb.connect()
    sql = knuth_bucket_sql("x", mod)
    for i in IDS:
        got = con.execute(
            f"SELECT {sql} FROM (SELECT CAST({i} AS BIGINT) AS x)"
        ).fetchone()[0]
        assert got == _exact(i, mod), (i, mod)


def test_naive_form_agrees_where_it_does_not_overflow():
    """Oracle continuity: every id the r2 fixtures used (small positives)
    hashes identically under the naive and safe forms."""
    for i in (0, 1, 499, 4999, 49999, 2**31):
        assert (i * K) % 2**32 % 100 == _exact(i, 100)


def test_naive_form_really_overflows_in_duckdb():
    """The reason the helper exists: DuckDB errors on the naive product at
    big ids — if this ever stops failing, the helper can be retired."""
    con = duckdb.connect()
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute(f"SELECT (x * {K}) % 4294967296 FROM (SELECT CAST(4000000000 AS BIGINT) AS x)").fetchone()


def test_md5_bucket_spark_equals_duckdb_and_python(spark):
    """The STRING bucket twin (md5_bucket / md5_bucket_sql): Spark, DuckDB
    and a pure-Python md5 must agree on realistic n-gram keys, unicode,
    and the empty string — the hash IS the semantics for DSIR-style
    hashed features, so any engine divergence silently re-buckets."""
    import hashlib

    from kafka_connect_logminer2_spark.functions.sharding import (
        md5_bucket,
        md5_bucket_sql,
    )

    keys = ["", "the", "spark sql", "a_b", "naïve café", "token_42", "…", "x" * 500]
    mod = 8192
    want = [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % mod for k in keys]

    df = spark.createDataFrame([(k,) for k in keys], "s string")
    got_spark = [
        r[0] for r in df.select(md5_bucket(F.col("s"), mod)).collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {md5_bucket_sql('?', mod)}", [k]).fetchone()[0]
        for k in keys
    ]
    assert got_duck == want
