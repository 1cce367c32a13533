"""Relational Bloom filter (functions/bloom.py): no false negatives ever,
false-positive rate near theory, shard filters merge losslessly, and the
probe's bitmap join is broadcast (the 100 TB pre-screen contract)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions import bloom as B

BITS = 1 << 14
K = 5


def _strings(spark, lo, hi, prefix="v"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("s")
    )


def test_no_false_negatives_and_fpr_near_theory(spark):
    n = 1200
    members = _strings(spark, 0, n)
    bloom = B.bloom_build(members, F.col("s"), num_bits=BITS, num_hashes=K)

    probe_members = B.bloom_probe(
        members, F.col("s"), bloom, ["s"], num_bits=BITS, num_hashes=K
    )
    assert probe_members.filter(~F.col("might_contain")).count() == 0  # NEVER

    outsiders = _strings(spark, 0, 4000, prefix="x")
    fp = (
        B.bloom_probe(outsiders, F.col("s"), bloom, ["s"], num_bits=BITS, num_hashes=K)
        .filter(F.col("might_contain"))
        .count()
    )
    theory = (1.0 - math.exp(-K * n / BITS)) ** K  # ~0.0217 at these params
    assert fp / 4000 < 4 * theory  # loose factor: hash granularity + luck
    assert fp > 0  # the FPR gate actually exercised the positive branch


def test_merge_equals_union_build(spark):
    a, b = _strings(spark, 0, 500), _strings(spark, 300, 900)
    merged = B.bloom_merge(
        B.bloom_build(a, F.col("s"), num_bits=BITS, num_hashes=K),
        B.bloom_build(b, F.col("s"), num_bits=BITS, num_hashes=K),
    )
    direct = B.bloom_build(a.unionByName(b), F.col("s"), num_bits=BITS, num_hashes=K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_probe_bitmap_join_is_broadcast(spark):
    members = _strings(spark, 0, 200)
    bloom = B.bloom_build(members, F.col("s"), num_bits=BITS, num_hashes=K)
    plan = B.bloom_probe(
        members, F.col("s"), bloom, ["s"], num_bits=BITS, num_hashes=K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the probed relation never shuffles
    assert plan.count("Exchange") <= 3  # bitmap build + broadcast + final agg
