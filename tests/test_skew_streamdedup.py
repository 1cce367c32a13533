"""Tests for skew mitigation (salted join, two-phase distinct) and
streaming watermarked deduplication."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.operators.skew import (
    salted_join,
    two_phase_distinct_count,
)
from kafka_connect_logminer2_spark.sources.tables import load_table
from kafka_connect_logminer2_spark.streaming.analytics import stream_dedup


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, ["o_custkey"]).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    salted = salted_join(orders, customer, ["o_custkey"], num_salts=8).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "orphan")], "k: long, v: string"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k: long, d: string")
    plain = fact.join(dim, ["k"], "left")
    salted = salted_join(fact, dim, ["k"], how="left", num_salts=4)
    assert _sorted_rows(salted.select("k", "v", "d")) == _sorted_rows(
        plain.select("k", "v", "d")
    )


def test_two_phase_distinct_count_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    expected = _sorted_rows(
        orders.groupBy("o_orderstatus").agg(
            F.count_distinct("o_custkey").alias("n_distinct_o_custkey")
        )
    )
    got = _sorted_rows(
        two_phase_distinct_count(orders, ["o_orderstatus"], "o_custkey", num_salts=8)
    )
    assert got == expected


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    events = spark.createDataFrame(
        [
            (1, "2026-01-01 00:00:00", 10, "click", 1.0, "{}"),
            (1, "2026-01-01 00:00:05", 10, "click", 1.0, "{}"),  # dup event_id
            (2, "2026-01-01 00:01:00", 11, "view", 2.0, "{}"),
            (2, "2026-01-01 00:01:30", 11, "view", 2.0, "{}"),  # dup event_id
            (3, "2026-01-01 00:02:00", 12, "purchase", 3.0, "{}"),
        ],
        "event_id: long, ts: string, user_id: long, event_type: string, value: double, props: string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    events.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stream_dedup(stream, keys=["event_id"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select event_id from dedup_out").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2, 3]


def test_stream_stream_attribution_matches_batch(spark, sf_dir, tmp_path):
    """The watermarked stream-stream join must emit exactly the rows the
    batch formulation (q60's oracle-checked condition) produces on the same
    events — late-data bounds only evict state, never change the join."""
    from kafka_connect_logminer2_spark.streaming.analytics import (
        stream_stream_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events")
    events.write.parquet(src)

    batch = spark.read.parquet(src)
    expected = _sorted_rows(
        stream_stream_attribution(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
        ).select("user_id", "click_id", "purchase_id", "lag_seconds")
    )

    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = stream_stream_attribution(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = _sorted_rows(
        spark.sql("select user_id, click_id, purchase_id, lag_seconds from attr_out")
    )
    assert len(expected) > 0
    assert got == expected
