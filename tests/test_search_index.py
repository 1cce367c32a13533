"""Incrementally-maintained inverted index (streaming/search_index.py):
delta-chain build, tombstoned deletion, compaction identity, param guard,
bucket-pruned reads."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import Row, functions as F

from kafka_connect_logminer2_spark.functions.search import (
    phrase_match_counts,
    positional_postings,
)
from kafka_connect_logminer2_spark.streaming.search_index import (
    compact_search_index,
    delete_docs,
    index_batch,
    read_postings,
    search_phrase,
    write_search_index,
)

DOCS = [
    (0, "alpha beta gamma alpha beta"),
    (1, "beta gamma delta"),
    (2, "alpha beta something else entirely"),
    (3, "gamma gamma gamma"),
    (4, "no relevant terms here"),
    (5, "alpha beta"),
]


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _stream_batches(spark, tmp, rows_per_batch):
    os.makedirs(f"{tmp}/in", exist_ok=True)
    now = time.time()
    for i, rows in enumerate(rows_per_batch):
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )


def test_incremental_equals_oneshot(spark, tmp_path):
    tmp = str(tmp_path)
    stream = _stream_batches(spark, tmp, [DOCS[:2], DOCS[2:4], DOCS[4:]])
    q = write_search_index(stream, f"{tmp}/idx", f"{tmp}/ckpt", num_buckets=4)
    assert q.awaitTermination(300)
    got = sorted(
        (r["h"], r["doc_id"], r["pos"])
        for r in read_postings(spark, f"{tmp}/idx").collect()
    )
    want = sorted(
        (r["h"], r["doc_id"], r["pos"])
        for r in positional_postings(_df(spark, DOCS)).collect()
    )
    assert got == want
    # search over the store == direct search over the corpus
    s = {(r["doc_id"], r["n_matches"]) for r in
         search_phrase(spark, f"{tmp}/idx", ["alpha", "beta"], num_buckets=4).collect()}
    d = {(r["doc_id"], r["n_matches"]) for r in
         phrase_match_counts(_df(spark, DOCS), ["alpha", "beta"]).collect()}
    assert s == d and len(s) == 3  # docs 0, 2, 5


def test_delete_and_compact_identity(spark, tmp_path):
    tmp = str(tmp_path)
    for i, rows in enumerate([DOCS[:3], DOCS[3:]]):
        index_batch(spark, _df(spark, rows), i, f"{tmp}/idx", num_buckets=4)
    delete_docs(spark, f"{tmp}/idx",
                spark.createDataFrame([Row(doc_id=0), Row(doc_id=5)]), batch_id=2)
    phrase = ["alpha", "beta"]
    before = {(r["doc_id"], r["n_matches"]) for r in
              search_phrase(spark, f"{tmp}/idx", phrase, num_buckets=4).collect()}
    assert before == {(2, 1)}  # docs 0 and 5 tombstoned
    compact_search_index(spark, f"{tmp}/idx")
    after = {(r["doc_id"], r["n_matches"]) for r in
             search_phrase(spark, f"{tmp}/idx", phrase, num_buckets=4).collect()}
    assert after == before
    # tombstones consumed, postings physically gone
    assert not os.path.isdir(f"{tmp}/idx/_tomb")
    ids = {r["doc_id"] for r in read_postings(spark, f"{tmp}/idx").collect()}
    assert 0 not in ids and 5 not in ids
    # compaction folded every bucket to a single committed segment
    for d in os.listdir(f"{tmp}/idx"):
        if d.startswith("b="):
            vs = [x for x in os.listdir(f"{tmp}/idx/{d}") if x.startswith("v=")]
            assert len(vs) == 1


def test_compact_idempotent_and_fully_deleted_bucket(spark, tmp_path):
    tmp = str(tmp_path)
    index_batch(spark, _df(spark, DOCS), 0, f"{tmp}/idx", num_buckets=2)
    delete_docs(spark, f"{tmp}/idx",
                spark.createDataFrame([Row(doc_id=i) for i, _ in DOCS]), batch_id=1)
    compact_search_index(spark, f"{tmp}/idx")
    # everything deleted: the index EXISTS and is empty — an empty TYPED
    # frame, never None (None means "store never written")
    emptied = read_postings(spark, f"{tmp}/idx")
    assert emptied is not None and emptied.count() == 0
    assert set(emptied.columns) == {"h", "doc_id", "pos"}
    # second compact is a no-op, search over the empty store is empty
    compact_search_index(spark, f"{tmp}/idx")
    assert search_phrase(spark, f"{tmp}/idx", ["alpha"], num_buckets=2).count() == 0


def test_param_guard_raises(spark, tmp_path):
    tmp = str(tmp_path)
    index_batch(spark, _df(spark, DOCS[:2]), 0, f"{tmp}/idx", num_buckets=4)
    with pytest.raises(ValueError, match="different"):
        index_batch(spark, _df(spark, DOCS[2:]), 1, f"{tmp}/idx", num_buckets=8)


def test_delete_batch_id_must_advance(spark, tmp_path):
    tmp = str(tmp_path)
    index_batch(spark, _df(spark, DOCS), 0, f"{tmp}/idx", num_buckets=4)
    with pytest.raises(ValueError, match="exceed"):
        delete_docs(spark, f"{tmp}/idx",
                    spark.createDataFrame([Row(doc_id=0)]), batch_id=0)


def test_bucket_pruned_read(spark, tmp_path):
    tmp = str(tmp_path)
    index_batch(spark, _df(spark, DOCS), 0, f"{tmp}/idx", num_buckets=4)
    full = read_postings(spark, f"{tmp}/idx")
    hb = {r["h"]: r["h"] % 4 for r in full.select("h").distinct().collect()}
    target = sorted(set(hb.values()))[0]
    pruned = read_postings(spark, f"{tmp}/idx", buckets=[target])
    got_h = {r["h"] for r in pruned.select("h").distinct().collect()}
    assert got_h == {h for h, b in hb.items() if b == target}


def test_retry_overwrites_own_delta(spark, tmp_path):
    # a retried batch id must leave the store byte-identical, not doubled
    tmp = str(tmp_path)
    index_batch(spark, _df(spark, DOCS[:3]), 0, f"{tmp}/idx", num_buckets=4)
    n1 = read_postings(spark, f"{tmp}/idx").count()
    index_batch(spark, _df(spark, DOCS[:3]), 0, f"{tmp}/idx", num_buckets=4)
    assert read_postings(spark, f"{tmp}/idx").count() == n1
