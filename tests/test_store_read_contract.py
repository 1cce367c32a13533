"""None-vs-empty read contract across the delta-chain stores (the r6
judge's RED finding): once a store has a commit marker, its reader must
return an empty TYPED frame when the history is empty — None is reserved
for "store never written". The batch twins (scd2_history, a fresh index,
zero counters) all answer "empty", so the stream==batch contract needs
the distinction. Pins the hypothesis falsifying example
history=[(1, ('DELETE', None, None))] deterministically per store."""

from __future__ import annotations

from pyspark.sql import Row

from kafka_connect_logminer2_spark.operators.scd import scd2_history
from kafka_connect_logminer2_spark.streaming.ann_ingest import (
    ingest_batch_ann,
    read_ann_index,
)
from kafka_connect_logminer2_spark.streaming.decayed import (
    decayed_batch_step,
    read_decayed,
)
from kafka_connect_logminer2_spark.streaming.scd2 import read_scd2, scd2_batch_step
from kafka_connect_logminer2_spark.streaming.search_index import (
    delete_docs,
    read_postings,
    search_phrase,
)

SCD_SCHEMA = (
    "OPERATION string, COMMIT_SCN long, SCN long, "
    "data struct<K: long, V: string>, before struct<K: long, V: string>"
)


def test_scd2_delete_only_first_batch_reads_empty(spark, tmp_path):
    """THE falsifying example: a delete-only first batch writes no version
    segments; the reader must still answer 'history exists, is empty'."""
    store = str(tmp_path / "scd")
    rows = spark.createDataFrame(
        [Row(OPERATION="DELETE", COMMIT_SCN=1, SCN=1, data=None,
             before=Row(K=1, V=None))],
        SCD_SCHEMA,
    )
    scd2_batch_step(spark, rows, 0, store, ["K"], num_buckets=4)
    got = read_scd2(spark, store)
    assert got is not None and got.count() == 0
    twin = scd2_history(rows, ["K"])
    assert twin.count() == 0
    assert set(got.columns) >= set(twin.columns)  # typed like the batch twin


def test_scd2_all_empty_stream_reads_empty(spark, tmp_path):
    store = str(tmp_path / "scd")
    empty = spark.createDataFrame([], SCD_SCHEMA)
    scd2_batch_step(spark, empty, 0, store, ["K"], num_buckets=4)
    scd2_batch_step(spark, empty, 1, store, ["K"], num_buckets=4)
    got = read_scd2(spark, store)
    assert got is not None and got.count() == 0


def test_scd2_never_written_reads_none(spark, tmp_path):
    assert read_scd2(spark, str(tmp_path / "nope")) is None


def test_postings_tombstone_only_first_batch_reads_empty(spark, tmp_path):
    """delete_docs on a virgin index dir commits a tombstone-only history:
    the index EXISTS (and is empty) from that point on."""
    idx = str(tmp_path / "idx")
    delete_docs(spark, idx, spark.createDataFrame([Row(doc_id=7)]), batch_id=0)
    got = read_postings(spark, idx)
    assert got is not None and got.count() == 0
    assert set(got.columns) == {"h", "doc_id", "pos"}
    assert search_phrase(spark, idx, ["alpha"], num_buckets=16).count() == 0


def test_decayed_empty_batch_only_stream_reads_empty(spark, tmp_path):
    store = str(tmp_path / "dec")
    empty = spark.createDataFrame([], "user_id long, value double, ts timestamp")
    decayed_batch_step(spark, empty, 0, store, num_buckets=4)
    got = read_decayed(spark, store)
    assert got is not None and got.count() == 0
    assert {"user_id", "s_vw", "s_w", "n_events", "epoch_s"} <= set(got.columns)
    as_of = read_decayed(spark, store, as_of_ts="2024-01-05 00:00:00")
    assert as_of is not None and as_of.count() == 0
    assert read_decayed(spark, str(tmp_path / "nope")) is None


def test_ann_index_delete_only_first_batch_reads_empty(spark, tmp_path):
    import numpy as np

    idx = str(tmp_path / "ann0")
    dels = spark.createDataFrame(
        [Row(op="D", vec_id=1, embedding=None)],
        "op string, vec_id long, embedding array<double>",
    )
    ingest_batch_ann(
        spark, dels, 0, idx, cmat=np.array([[0.0, 1.0], [1.0, 0.0]]), n_centroids=2
    )
    got = read_ann_index(spark, idx)
    assert got is not None and got.count() == 0


def test_ann_index_fully_deleted_then_compacted_reads_empty(spark, tmp_path):
    from kafka_connect_logminer2_spark.streaming.ann_ingest import compact_ann_index

    idx = str(tmp_path / "ann")
    ups = spark.createDataFrame(
        [Row(op="I", vec_id=i, embedding=[float(i), 1.0]) for i in range(6)],
        "op string, vec_id long, embedding array<double>",
    )
    ingest_batch_ann(spark, ups, 0, idx, n_centroids=2)
    dels = spark.createDataFrame(
        [Row(op="D", vec_id=i, embedding=None) for i in range(6)],
        "op string, vec_id long, embedding array<double>",
    )
    ingest_batch_ann(spark, dels, 1, idx, n_centroids=2)
    got = read_ann_index(spark, idx)
    assert got is not None and got.count() == 0  # all tombstoned
    compact_ann_index(spark, idx)  # physically removes every version dir
    got = read_ann_index(spark, idx)
    assert got is not None and got.count() == 0
    assert read_ann_index(spark, str(tmp_path / "nope")) is None
