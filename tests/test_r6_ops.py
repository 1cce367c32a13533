"""Round-6 additions: the 2-D skyline operator (q153) — dominance edge
cases against an independent O(n²) python reference — and the
two_level_cummax decomposition it runs on (exact equivalence with the
naive single-partition global window)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window, functions as F

from kafka_connect_logminer2_spark.functions.sharding import two_level_cummax


def _skyline_py(rows):
    """Textbook O(n²) dominance: keep (key, price, size) rows for which no
    other row has strictly lower price AND strictly larger size."""
    out = []
    for k, p, s in rows:
        if not any(p2 < p and s2 > s for _k2, p2, s2 in rows):
            out.append((k, p, s))
    return sorted(out)


def _skyline_spark(spark, rows):
    """The q153 plan shape over an arbitrary fixture (same operators, same
    predicate — q153 itself binds it to the part table)."""
    df = spark.createDataFrame(
        [Row(k=k, price=float(p), size=s) for k, p, s in rows]
    )
    per_price = df.groupBy("price").agg(F.max("size").alias("_best"))
    frontier = two_level_cummax(
        per_price, "price", "_best", out_col="_prev_best", block_width=10.0
    )
    kept = (
        df.join(frontier.select("price", "_prev_best"), "price")
        .filter(F.col("_prev_best").isNull() | (F.col("size") >= F.col("_prev_best")))
        .select("k", "price", "size")
    )
    return sorted((r["k"], r["price"], r["size"]) for r in kept.collect())


class TestSkyline:
    def test_equal_price_size_twins_both_survive(self, spark):
        # strict-in-both dominance: identical (price, size) rows cannot
        # dominate each other — both stay on the frontier
        rows = [(1, 10.0, 5), (2, 10.0, 5), (3, 20.0, 4)]
        assert _skyline_spark(spark, rows) == _skyline_py(rows)
        assert (1, 10.0, 5) in _skyline_py(rows) and (2, 10.0, 5) in _skyline_py(rows)

    def test_single_row(self, spark):
        rows = [(7, 42.0, 3)]
        assert _skyline_spark(spark, rows) == [(7, 42.0, 3)]

    def test_all_dominated_but_frontier(self, spark):
        # one row strictly better than everything else in both dimensions
        rows = [(0, 1.0, 100)] + [(i, float(i + 2), 100 - i) for i in range(1, 20)]
        assert _skyline_spark(spark, rows) == [(0, 1.0, 100)]

    def test_equal_price_different_size(self, spark):
        # equal price: neither is strictly cheaper, so neither dominates —
        # but a LATER strictly-cheaper row's max still counts both
        rows = [(1, 10.0, 9), (2, 10.0, 3), (3, 11.0, 5), (4, 11.0, 9)]
        assert _skyline_spark(spark, rows) == _skyline_py(rows)

    def test_random_matches_naive(self, spark):
        import random

        rng = random.Random(6)
        rows = [
            (i, float(rng.randrange(1, 40)), rng.randrange(1, 25))
            for i in range(200)
        ]
        assert _skyline_spark(spark, rows) == _skyline_py(rows)


class TestTwoLevelCummax:
    @pytest.mark.parametrize("block_width", [1.0, 7.0, 64.0, 10_000.0])
    def test_equals_naive_global_window(self, spark, block_width):
        # the decomposition contract: EXACTLY the naive exclusive running
        # max at any block width (incl. one block spanning everything and
        # blocks of single values)
        import random

        rng = random.Random(42)
        df = spark.createDataFrame(
            [Row(o=float(i), v=rng.randrange(0, 1000)) for i in range(500)]
        ).orderBy(F.rand(1))
        naive_w = Window.orderBy("o").rowsBetween(Window.unboundedPreceding, -1)
        naive = {
            r["o"]: r["m"]
            for r in df.withColumn("m", F.max("v").over(naive_w)).collect()
        }
        got = {
            r["o"]: r["cummax_excl"]
            for r in two_level_cummax(df, "o", "v", block_width=block_width).collect()
        }
        assert got == naive
        assert got[0.0] is None  # first row: no strict predecessor

    def test_grouped(self, spark):
        df = spark.createDataFrame(
            [Row(g=i % 3, o=float(i), v=(i * 17) % 23) for i in range(90)]
        )
        naive_w = Window.partitionBy("g").orderBy("o").rowsBetween(
            Window.unboundedPreceding, -1
        )
        naive = {
            (r["g"], r["o"]): r["m"]
            for r in df.withColumn("m", F.max("v").over(naive_w)).collect()
        }
        got = {
            (r["g"], r["o"]): r["cummax_excl"]
            for r in two_level_cummax(
                df, "o", "v", block_width=8.0, group_col="g"
            ).collect()
        }
        assert got == naive

    def test_null_order_raises_not_drops(self, spark):
        """A NULL order value must RAISE, not vanish through the inner
        block join (the r6 ADVICE finding): the naive global window keeps
        the row in its null-first/last position, so silent dropping would
        break the claimed exact equivalence."""
        import pytest

        df = spark.createDataFrame(
            [Row(o=1.0, v=3), Row(o=None, v=9), Row(o=2.0, v=1)],
            "o double, v int",
        )
        with pytest.raises(Exception, match="NULL 'o' has no position"):
            two_level_cummax(df, "o", "v", block_width=4.0).collect()

        from kafka_connect_logminer2_spark.functions.sharding import two_level_cumsum

        df2 = df.withColumn("g", F.lit(1))
        with pytest.raises(Exception, match="NULL 'o' has no position"):
            two_level_cumsum(df2, "g", "o", "v", block_size=4).collect()
