"""Incremental corpus ingestion with history-wide exact dedup
(streaming/corpus_ingest.py): streaming batches of documents through the
bucketed fingerprint store must accept EXACTLY the first occurrence of
every distinct text (batch order, then doc_id), rewrite only touched
store buckets per batch, and resume across runs without re-accepting or
losing anything."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
    read_ingested,
    store_size,
    write_dedup_ingest,
)

SCHEMA = "doc_id long, text string"


def _stage(spark, tmp, batches, start=0):
    os.makedirs(f"{tmp}/in", exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches, start=start):
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)
    return f"{tmp}/in"


def _run(spark, tmp):
    return write_dedup_ingest(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
            f"{tmp}/in"
        ),
        f"{tmp}/out",
        f"{tmp}/store",
        f"{tmp}/ckpt",
        num_buckets=16,
    )


def _truth(batches):
    """First occurrence per text: batch order, then doc_id within batch."""
    seen, keep = set(), []
    for rows in batches:
        for doc_id, text in sorted(rows):
            if text not in seen:
                seen.add(text)
                keep.append((doc_id, text))
    return sorted(keep)


def test_ingest_accepts_exactly_first_occurrences(spark, tmp_path):
    tmp = str(tmp_path)
    batches = [
        [(1, "alpha"), (2, "beta"), (9, "alpha")],          # 9 loses to 1 in-batch
        [(10, "beta"), (11, "gamma"), (12, "alpha")],        # only gamma new
        [(20, "delta"), (21, "gamma"), (22, "epsilon")],     # delta, epsilon new
    ]
    _stage(spark, tmp, batches)
    q = _run(spark, tmp)
    assert q.awaitTermination(300)

    got = sorted(
        (r["doc_id"], r["text"])
        for r in read_ingested(spark, f"{tmp}/out").collect()
    )
    assert got == _truth(batches) == sorted(
        [(1, "alpha"), (2, "beta"), (11, "gamma"), (20, "delta"), (22, "epsilon")]
    )
    assert store_size(spark, f"{tmp}/store") == 5

    # per-batch attribution: each accepted doc sits in its arrival batch
    per_batch = {
        (r["doc_id"]): r["batch"]
        for r in read_ingested(spark, f"{tmp}/out").select("doc_id", "batch").collect()
    }
    assert per_batch == {1: 0, 2: 0, 11: 1, 20: 2, 22: 2}


def test_ingest_rewrites_only_touched_buckets(spark, tmp_path):
    """The O(touched buckets) write contract: a batch adding few new
    fingerprints must version only their buckets — untouched buckets keep
    their old latest version (the 100 TB difference between appending to a
    set and rewriting it)."""
    tmp = str(tmp_path)
    many = [(i, f"seed text number {i}") for i in range(64)]
    one = [(100, "the single new document"), (101, "seed text number 3")]
    _stage(spark, tmp, [many, one])
    q = _run(spark, tmp)
    assert q.awaitTermination(300)

    store = f"{tmp}/store"
    v1 = {
        d
        for d in os.listdir(store)
        if d.startswith("b=") and os.path.isdir(f"{store}/{d}/v=1")
    }
    v0_only = {
        d
        for d in os.listdir(store)
        if d.startswith("b=") and not os.path.isdir(f"{store}/{d}/v=1")
    }
    # batch 1 carried ONE new fingerprint → at most a couple of buckets
    # rewritten, and the precondition that most were untouched must hold
    assert 1 <= len(v1) <= 2, sorted(v1)
    assert len(v0_only) >= 10
    got = sorted(r["doc_id"] for r in read_ingested(spark, f"{tmp}/out").collect())
    assert got == list(range(64)) + [100]


def test_ingest_resumes_without_reaccepting(spark, tmp_path):
    """Restart with new input files: the checkpoint skips processed files,
    the store carries the history forward, and a text seen in run 1 is
    still rejected in run 2."""
    tmp = str(tmp_path)
    b0 = [(1, "first text"), (2, "second text")]
    b1 = [(3, "third text"), (4, "first text")]
    _stage(spark, tmp, [b0, b1])
    q = _run(spark, tmp)
    assert q.awaitTermination(300)
    assert store_size(spark, f"{tmp}/store") == 3

    b2 = [(5, "second text"), (6, "fourth text")]
    _stage(spark, tmp, [b2], start=2)
    q2 = _run(spark, tmp)
    assert q2.awaitTermination(300)

    got = sorted(
        (r["doc_id"], r["text"])
        for r in read_ingested(spark, f"{tmp}/out").collect()
    )
    assert got == [
        (1, "first text"), (2, "second text"), (3, "third text"), (6, "fourth text")
    ]
    assert store_size(spark, f"{tmp}/store") == 4


BASE = (
    "the quick brown fox jumps over the lazy dog again and again every "
    "single day without fail in the quiet morning light"
)
OTHER = (
    "completely different subject matter about distributed query engines "
    "and columnar storage formats for analytical workloads at scale"
)


def _run_near(spark, tmp):
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        write_neardup_ingest,
    )

    return write_neardup_ingest(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
            f"{tmp}/in"
        ),
        f"{tmp}/out",
        f"{tmp}/store",
        f"{tmp}/ckpt",
        threshold=0.5,
        num_buckets=16,
    )


def test_neardup_ingest_rejects_history_neighbors(spark, tmp_path):
    """Batch 0 accepts one representative of the in-batch near-dup pair;
    batch 1's lightly-edited copy is rejected AGAINST THE STORE (no text
    from batch 0 is re-read), while a genuinely new document and a
    too-short-to-shingle document are accepted."""
    tmp = str(tmp_path)
    b0 = [(1, BASE), (2, BASE + " extra")]
    b1 = [(10, BASE + " slightly altered"), (11, OTHER), (12, "hi")]
    _stage(spark, tmp, [b0, b1])
    q = _run_near(spark, tmp)
    assert q.awaitTermination(300)

    got = sorted(
        (r["doc_id"], r["batch"])
        for r in read_ingested(spark, f"{tmp}/out").select("doc_id", "batch").collect()
    )
    assert got == [(1, 0), (11, 1), (12, 1)]

    # store holds signatures only for signature-bearing ACCEPTED docs
    store = f"{tmp}/store"
    import os as _os

    v1_buckets = [
        d
        for d in _os.listdir(store)
        if d.startswith("b=") and _os.path.isdir(f"{store}/{d}/v=1")
    ]
    # doc 11 contributes 4 band rows → at most 4 buckets rewritten in batch 1
    assert 1 <= len(v1_buckets) <= 4


def test_neardup_ingest_resumes_and_still_rejects(spark, tmp_path):
    """Restart with a new file: a near-copy of a document accepted in the
    FIRST run must still be rejected — the persisted signature store IS
    the memory, bit-comparable across runs."""
    tmp = str(tmp_path)
    _stage(spark, tmp, [[(1, BASE)], [(2, OTHER)]])
    q = _run_near(spark, tmp)
    assert q.awaitTermination(300)

    _stage(spark, tmp, [[(30, BASE + " appended"), (31, OTHER + " appended"),
                         (32, "entirely novel content about streaming joins "
                              "with watermarks and state stores in practice")]],
           start=2)
    q2 = _run_near(spark, tmp)
    assert q2.awaitTermination(300)

    got = sorted(r["doc_id"] for r in read_ingested(spark, f"{tmp}/out").collect())
    assert got == [1, 2, 32]


def test_vacuum_store_keeps_membership_and_parent(spark, tmp_path):
    """Vacuuming the fingerprint store must not change membership (the
    latest committed version per bucket survives) and must keep each
    bucket's parent version so a retried batch can still re-read it;
    keep=1 is rejected for exactly that reason."""
    import pytest

    from kafka_connect_logminer2_spark.streaming.corpus_ingest import vacuum_store

    tmp = str(tmp_path)
    # force one bucket through 3 versions: pick three distinct texts that
    # land in the SAME fingerprint bucket (computed with the store's own
    # hash), one per batch
    cand = spark.createDataFrame(
        [(i, f"candidate text {i}") for i in range(200)], SCHEMA
    ).select(
        "text",
        F.pmod(F.xxhash64(F.unhex(F.md5("text"))), F.lit(16)).alias("b"),
    )
    by_bucket: dict[int, list[str]] = {}
    for r in cand.collect():
        by_bucket.setdefault(r["b"], []).append(r["text"])
    same = next(v for v in by_bucket.values() if len(v) >= 3)[:3]
    batches = [
        [(1, same[0]), (2, "filler text a")],
        [(10, same[1]), (11, "filler text b")],
        [(20, same[2]), (21, "filler text c")],
    ]
    _stage(spark, tmp, batches)
    q = _run(spark, tmp)
    assert q.awaitTermination(300)
    store = f"{tmp}/store"
    before = store_size(spark, store)
    assert before == 6

    with pytest.raises(ValueError, match="keep"):
        vacuum_store(store, keep=1)

    removed = vacuum_store(store, keep=2)
    # the seed buckets rewritten in batches 1/2 had 2-3 versions — some
    # version must actually have been deleted for this test to bite
    assert any(removed.values())
    assert store_size(spark, store) == before
    # every bucket still has ≥ 1 version, and any bucket with 2+ kept its
    # parent (latest_version below the max still resolves)
    from kafka_connect_logminer2_spark.streaming.snapshot import latest_version

    for d in os.listdir(store):
        if not d.startswith("b="):
            continue
        latest = latest_version(f"{store}/{d}")
        assert latest is not None


def test_neardup_ingest_global_invariant_on_fixture(spark, sf_dir, tmp_path):
    """THE acceptance invariant, checked globally on the real fixture: after
    ingesting the documents table in 3 batches, NO two accepted documents
    (across all batches) may estimate at/above the threshold — i.e. the
    persistent store enforces across batches exactly what
    minhash_banded_pairs + clustering enforce within one frame. (This is
    the quality gate backing the rows-only cdc18 registry entry.)"""
    from kafka_connect_logminer2_spark.functions.dedup import minhash_banded_pairs
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        write_neardup_ingest,
    )

    tmp = str(tmp_path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batches = [
        [(r["doc_id"], r["text"]) for r in docs.filter(
            F.pmod("doc_id", F.lit(3)) == i).collect()]
        for i in range(3)
    ]
    _stage(spark, tmp, batches)
    q = write_neardup_ingest(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
            f"{tmp}/in"
        ),
        f"{tmp}/out",
        f"{tmp}/store",
        f"{tmp}/ckpt",
        threshold=0.5,
    )
    assert q.awaitTermination(300)

    accepted = read_ingested(spark, f"{tmp}/out").select("doc_id", "text")
    n_accepted, n_total = accepted.count(), docs.count()
    assert 0 < n_accepted <= n_total
    offenders = minhash_banded_pairs(accepted).filter(
        F.col("jaccard_est") >= 0.5
    )
    assert offenders.count() == 0
