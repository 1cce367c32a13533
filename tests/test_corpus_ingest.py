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


def test_ingest_writes_are_deltas_proportional_to_new_fps(spark, tmp_path):
    """The O(new fingerprints) write contract: a batch adding ONE new
    fingerprint must write exactly one delta row in exactly one bucket —
    NOT a copy of the bucket's history (the r4 layout rewrote the full
    bucket per touched version; at nightly-batch × 10^9-doc scale that
    copied the whole store forward every night). Untouched buckets gain
    no version at all."""
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
    # batch 1 carried ONE new fingerprint → exactly one bucket versioned
    assert len(v1) == 1, sorted(v1)
    assert len(v0_only) >= 10
    # ...and that version is a DELTA holding exactly the one new row, even
    # though the bucket's batch-0 segment holds several fingerprints
    (b1,) = v1
    assert spark.read.parquet(f"{store}/{b1}/v=1").count() == 1
    assert spark.read.parquet(f"{store}/{b1}/v=0").count() >= 1
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


def test_compact_store_folds_chains_and_keeps_membership(spark, tmp_path):
    """compact_store must fold every bucket's delta chain into ONE segment
    without changing membership — and a run AFTER compaction must still
    reject everything the pre-compaction history had seen (the fold is the
    store's retention mechanism; losing membership here would silently
    re-accept history)."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import compact_store

    tmp = str(tmp_path)
    # force one bucket through 3 delta versions: pick three distinct texts
    # that land in the SAME fingerprint bucket (computed with the store's
    # own hash), one per batch
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
    # precondition: at least one bucket actually carries a multi-delta chain
    chains = {
        d: sorted(
            int(v.split("=")[1])
            for v in os.listdir(f"{store}/{d}")
            if v.startswith("v=")
        )
        for d in os.listdir(store)
        if d.startswith("b=")
    }
    assert any(len(vs) > 1 for vs in chains.values()), chains

    fold_v = compact_store(spark, store)
    assert fold_v == 2  # last committed batch id
    # every bucket now has exactly one segment; membership unchanged
    for d in os.listdir(store):
        if not d.startswith("b="):
            continue
        vs = [v for v in os.listdir(f"{store}/{d}") if v.startswith("v=")]
        assert len(vs) == 1, (d, vs)
    assert store_size(spark, store) == before
    # idempotent: a rerun is a no-op returning the same fold version
    assert compact_store(spark, store) == fold_v
    assert store_size(spark, store) == before

    # resume after compaction: history still rejects, new text accepted
    _stage(spark, tmp, [[(30, same[0]), (31, "filler text b"), (32, "post text")]],
           start=3)
    q2 = _run(spark, tmp)
    assert q2.awaitTermination(300)
    got = sorted(r["doc_id"] for r in read_ingested(spark, f"{tmp}/out").collect())
    assert got == [1, 2, 10, 11, 20, 21, 32]
    assert store_size(spark, store) == before + 1


def test_ingest_store_param_guard_raises_on_mismatch(spark, tmp_path):
    """Resuming a store with different parameters must RAISE, not silently
    probe the wrong buckets: a num_buckets change remaps fingerprints
    (history misses → duplicates re-accepted), a MinHash seed change makes
    stored signatures bit-incompatible. Same guard class as
    write_snapshot_bucketed's num_buckets resume check."""
    import pytest

    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
        ingest_batch_neardup,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(1, "some text"), (2, "other text")], SCHEMA)
    ingest_batch_exact(spark, b0, 0, f"{tmp}/out", f"{tmp}/store", num_buckets=16)
    with pytest.raises(ValueError, match="num_buckets"):
        ingest_batch_exact(spark, b0, 1, f"{tmp}/out", f"{tmp}/store", num_buckets=8)
    # unchanged params still work
    ingest_batch_exact(spark, b0, 1, f"{tmp}/out", f"{tmp}/store", num_buckets=16)

    ingest_batch_neardup(
        spark, b0, 0, f"{tmp}/out2", f"{tmp}/store2", seed=42, num_buckets=16
    )
    with pytest.raises(ValueError, match="seed"):
        ingest_batch_neardup(
            spark, b0, 1, f"{tmp}/out2", f"{tmp}/store2", seed=7, num_buckets=16
        )
    # the streaming wrapper surfaces the same guard as a stream failure
    _stage(spark, tmp, [[(5, "stream text")]])
    q = write_dedup_ingest(
        spark.readStream.schema(SCHEMA).parquet(f"{tmp}/in"),
        f"{tmp}/out",
        f"{tmp}/store",
        f"{tmp}/ckpt",
        num_buckets=8,
    )
    with pytest.raises(Exception, match="num_buckets"):
        q.awaitTermination(300)


def test_ingest_job_count_constant_in_bucket_count(spark, tmp_path):
    """Driver-side Spark-job count per ingest batch must be O(1) in bucket
    count (the store write is ONE partitioned job + renames, not a job per
    touched bucket), and store_size must be one multi-path job — at 4096
    buckets a per-bucket loop would be thousands of driver round-trips per
    batch (measured 0.18 s each on the snapshot path: 88 s → 7 s when
    batched, BASELINE.md)."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
    )

    tmp = str(tmp_path)
    sc = spark.sparkContext
    docs = spark.createDataFrame(
        [(i, f"job count probe text {i}") for i in range(64)], SCHEMA
    )

    def jobs_during(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    # same data, 4 vs 64 buckets (64 docs → essentially every bucket
    # touched in both) — job count must NOT grow with bucket count
    n4 = jobs_during(
        "ingest-nb4",
        lambda: ingest_batch_exact(
            spark, docs, 0, f"{tmp}/out4", f"{tmp}/store4", num_buckets=4
        ),
    )
    n64 = jobs_during(
        "ingest-nb64",
        lambda: ingest_batch_exact(
            spark, docs, 0, f"{tmp}/out64", f"{tmp}/store64", num_buckets=64
        ),
    )
    assert 0 < n64 <= n4 + 1, (n4, n64)
    s4 = jobs_during("size-nb4", lambda: store_size(spark, f"{tmp}/store4"))
    s64 = jobs_during("size-nb64", lambda: store_size(spark, f"{tmp}/store64"))
    assert 0 < s64 <= s4 + 1, (s4, s64)


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


def _run_bloom(spark, tmp, bloom_bits=1 << 14):
    return write_dedup_ingest(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
            f"{tmp}/in"
        ),
        f"{tmp}/out",
        f"{tmp}/store",
        f"{tmp}/ckpt",
        num_buckets=16,
        bloom_bits=bloom_bits,
    )


def test_bloom_prescreen_accepts_identical_set(spark, tmp_path):
    """bloom_bits is a pure pre-screen: the accepted set, per-batch
    attribution, and store size are EXACTLY the non-bloom run's (no false
    negatives by construction), across a restart that appends a batch of
    re-sends plus fresh docs."""
    tmp = str(tmp_path)
    batches = [
        [(1, "alpha"), (2, "beta"), (9, "alpha")],
        [(10, "beta"), (11, "gamma"), (12, "alpha")],
        [(20, "delta"), (21, "gamma"), (22, "epsilon")],
    ]
    _stage(spark, tmp, batches)
    q = _run_bloom(spark, tmp)
    assert q.awaitTermination(300)
    q.stop()

    got = sorted(
        (r["doc_id"], r["text"])
        for r in read_ingested(spark, f"{tmp}/out").collect()
    )
    assert got == _truth(batches)
    assert store_size(spark, f"{tmp}/store") == 5
    assert os.path.isdir(f"{tmp}/store/_bloom")  # the sidecar exists

    # restart-resume: re-sends rejected via the persisted history, fresh
    # docs (bloom-screened definitely-new) accepted
    extra = [[(30, "alpha"), (31, "zeta"), (32, "epsilon"), (33, "eta")]]
    _stage(spark, tmp, extra, start=3)
    q = _run_bloom(spark, tmp)
    assert q.awaitTermination(300)
    q.stop()
    got = sorted(
        (r["doc_id"], r["text"])
        for r in read_ingested(spark, f"{tmp}/out").collect()
    )
    assert got == _truth(batches + extra)
    assert store_size(spark, f"{tmp}/store") == 7


def test_bloom_param_is_meta_guarded(spark, tmp_path):
    """Resuming a bloom store without bloom (or a plain store WITH bloom,
    or different bits) must raise — a silent mismatch would break the
    no-false-negative coverage invariant."""
    import pytest

    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(1, "alpha")], SCHEMA)
    ingest_batch_exact(
        spark, b0, 0, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 14
    )
    with pytest.raises(ValueError, match="different parameters"):
        ingest_batch_exact(spark, b0, 1, f"{tmp}/out", f"{tmp}/store")
    with pytest.raises(ValueError, match="different parameters"):
        ingest_batch_exact(
            spark, b0, 1, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 15
        )
    ingest_batch_exact(  # original params resume fine
        spark, b0, 1, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 14
    )


def test_bloom_on_plain_store_raises(spark, tmp_path):
    import pytest

    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(1, "alpha")], SCHEMA)
    ingest_batch_exact(spark, b0, 0, f"{tmp}/out", f"{tmp}/store")
    with pytest.raises(ValueError, match="different parameters"):
        ingest_batch_exact(
            spark, b0, 1, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 14
        )


def test_bloom_prescreen_skips_history_read_for_fresh_batch(spark, tmp_path):
    """The point of the sidecar: a batch of entirely-new docs (the fresh-
    crawl majority) must not read ANY main-store bucket — the bloom says
    definitely-new for every row, so the anti-join's touched-bucket read
    is empty. Verified by counting the fp-store paths the probe requests."""
    from kafka_connect_logminer2_spark.streaming import corpus_ingest as ci

    tmp = str(tmp_path)
    b0 = spark.createDataFrame(
        [(i, f"seed{i}") for i in range(40)], SCHEMA
    )
    ci.ingest_batch_exact(
        spark, b0, 0, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 14
    )

    real = ci._store_paths
    asked: list[tuple] = []

    def spy(store_dir, buckets, below=None):
        if not store_dir.rstrip("/").endswith("_bloom"):
            asked.append((tuple(buckets) if buckets is not None else None, below))
        return real(store_dir, buckets, below)

    ci._store_paths = spy
    try:
        fresh = spark.createDataFrame(
            [(100 + i, f"newdoc{i}") for i in range(40)], SCHEMA
        )
        ci.ingest_batch_exact(
            spark, fresh, 1, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 14
        )
    finally:
        ci._store_paths = real
    # the probe's touched-bucket request covered no buckets at all
    assert asked and all(b == () for b, _ in asked), asked
    assert ci.store_size(spark, f"{tmp}/store") == 80  # still all accepted


def test_bloom_sidecar_compacts_with_store(spark, tmp_path):
    """compact_store folds the _bloom chain too (bit_or fold), and the
    pre-screen keeps rejecting history dups afterwards."""
    from kafka_connect_logminer2_spark.streaming import corpus_ingest as ci

    tmp = str(tmp_path)
    for b in range(6):
        rows = [(b * 10 + i, f"t{b}_{i}") for i in range(3)]
        ci.ingest_batch_exact(
            spark,
            spark.createDataFrame(rows, SCHEMA),
            b,
            f"{tmp}/out",
            f"{tmp}/store",
            bloom_bits=1 << 14,
        )
    ci.compact_store(spark, f"{tmp}/store")
    bdir = f"{tmp}/store/_bloom"
    for d in os.listdir(bdir):
        if d.startswith("b="):
            vs = [v for v in os.listdir(os.path.join(bdir, d)) if v.startswith("v=")]
            assert len(vs) == 1, (d, vs)
    dup = spark.createDataFrame([(99, "t0_0"), (98, "brandnew")], SCHEMA)
    ci.ingest_batch_exact(
        spark, dup, 6, f"{tmp}/out", f"{tmp}/store", bloom_bits=1 << 14
    )
    got = {
        r["doc_id"]
        for r in read_ingested(spark, f"{tmp}/out", f"{tmp}/store")
        .filter("batch = 6")
        .collect()
    }
    assert got == {98}  # the post-compaction bloom+store still rejects t0_0


def test_neardup_bloom_prescreen_identical_and_prunes(spark, tmp_path):
    """The near store's band-key bloom: acceptance identical to the
    non-bloom run, and a batch whose band keys have no history collision
    reads ZERO main-store buckets."""
    from kafka_connect_logminer2_spark.streaming import corpus_ingest as ci

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(1, BASE), (2, BASE + " extra")], SCHEMA)
    b1 = spark.createDataFrame(
        [(10, BASE + " slightly altered"), (11, OTHER), (12, "hi")], SCHEMA
    )
    kw = dict(threshold=0.5, num_buckets=16, bloom_bits=1 << 14)
    ci.ingest_batch_neardup(spark, b0, 0, f"{tmp}/out", f"{tmp}/store", **kw)
    ci.ingest_batch_neardup(spark, b1, 1, f"{tmp}/out", f"{tmp}/store", **kw)
    got = sorted(
        (r["doc_id"], r["batch"])
        for r in read_ingested(spark, f"{tmp}/out", f"{tmp}/store")
        .select("doc_id", "batch").collect()
    )
    assert got == [(1, 0), (11, 1), (12, 1)]  # == the non-bloom test's truth
    assert os.path.isdir(f"{tmp}/store/_bloom")

    # an all-new batch (no shared shingles with history) must read no bucket
    real = ci._store_paths
    asked = []

    def spy(store_dir, buckets, below=None):
        if not store_dir.rstrip("/").endswith("_bloom"):
            asked.append(tuple(buckets) if buckets is not None else None)
        return real(store_dir, buckets, below)

    ci._store_paths = spy
    try:
        b2 = spark.createDataFrame(
            [(20, "utterly unrelated words about astronomy telescopes and "
                  "planetary nebulae drifting in deep space photographs")],
            SCHEMA,
        )
        ci.ingest_batch_neardup(spark, b2, 2, f"{tmp}/out", f"{tmp}/store", **kw)
    finally:
        ci._store_paths = real
    assert asked and all(b == () for b in asked), asked
    got = sorted(
        r["doc_id"]
        for r in read_ingested(spark, f"{tmp}/out", f"{tmp}/store")
        .filter("batch = 2").collect()
    )
    assert got == [20]


def test_web_ingest_variants_land_once_and_resume(spark, tmp_path):
    """write_web_ingest (cdc35): raw-form variants of one canonical URL
    land exactly once across batches AND across a restart; junk pages
    (below the token floor) never land; the accepted rows carry the
    extracted text and the canonical URL."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        read_ingested,
    )
    from kafka_connect_logminer2_spark.streaming.web_ingest import (
        write_web_ingest,
    )

    schema = "doc_id long, url string, html string"
    body = " ".join(f"w{i}" for i in range(10))
    rows = {
        0: [
            (0, "HTTP://A.COM:80/x?utm_a=1", f"<p>{body}</p>"),
            (1, "http://a.com/x#frag", f"<div>{body}</div>"),   # same canon as 0
            (2, "http://b.com/y", f"<p>{body}</p>"),
            (3, "http://junk.com/z", "<p>too short</p>"),       # floor reject
        ],
        1: [
            (4, "http://A.com/x", f"<p>{body}</p>"),            # history dup of 0
            (5, "https://c.com:443/w", f"<p>{body}</p>"),
        ],
        2: [
            (6, "https://c.com/w?utm_b=2", f"<p>{body}</p>"),   # history dup of 5
            (7, "http://d.com/v", f"<p>{body}</p>"),
        ],
    }
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i):
        df = spark.createDataFrame(rows[i], schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        return write_web_ingest(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/out", f"{tmp}/store", f"{tmp}/ckpt",
            min_tokens=5, num_buckets=4, max_chain=2,
        )

    stage(0), stage(1)
    assert run().awaitTermination(600)
    stage(2)
    assert run().awaitTermination(600)  # restart-resume

    acc = read_ingested(spark, f"{tmp}/out", store_dir=f"{tmp}/store")
    got = sorted(
        (r["batch"], r["doc_id"], r["canon"], r["text"]) for r in acc.collect()
    )
    assert got == [
        (0, 0, "http://a.com/x", body),
        (0, 2, "http://b.com/y", body),
        (1, 5, "https://c.com/w", body),
        (2, 7, "http://d.com/v", body),
    ]


def test_web_ingest_content_neardup_tier(spark, tmp_path):
    """cdc38's tier at unit scope: a republished article (same content,
    DIFFERENT canonical URL, different boilerplate) passes the URL gate
    but is rejected by the content near-dup store — across batches AND a
    restart; a utm re-crawl of the SAME URL still dies at the URL gate
    (never reaching the near store); novel articles always land. Both
    tier stores compact in-line (max_chain=2) without changing the
    accepted set."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        read_ingested,
    )
    from kafka_connect_logminer2_spark.streaming.web_ingest import (
        write_web_ingest,
    )

    schema = "doc_id long, url string, html string"

    def art(i, n=80):
        return " ".join(f"a{i}_{j}" for j in range(n))

    rows = {
        0: [
            (0, "http://s0.com/a", f"<p>{art(0)}</p>"),
            (1, "http://s1.com/a", f"<p>{art(1)}</p>"),
            # same article 0 verbatim, new URL: in-batch near tier
            (50, "http://s50.com/a", f"<p>{art(0)}</p>"),
        ],
        1: [
            (2, "http://s2.com/a", f"<p>{art(2)}</p>"),
            # article 1 republished in OTHER boilerplate at a new URL:
            # HISTORY near-tier rejection
            (500, "http://s500.com/a",
             f"<nav>menu here</nav><p>{art(1)}</p><footer>rights</footer>"),
            # utm re-crawl of s0: URL tier (same canon)
            (310, "http://s0.com/a?utm_x=1", f"<p>{art(0)}</p>"),
        ],
        2: [
            (3, "http://s3.com/a", f"<p>{art(3)}</p>"),
            # article 2 minus its last word: the true NEAR case, after
            # a RESTART (fresh query over the same checkpoint/stores)
            (600, "http://s600.com/a",
             "<p>" + " ".join(art(2).split(" ")[:-1]) + "</p>"),
        ],
    }
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i):
        df = spark.createDataFrame(rows[i], schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        return write_web_ingest(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/out", f"{tmp}/store", f"{tmp}/ckpt",
            min_tokens=5, num_buckets=4, max_chain=2,
            content_neardup=True,
        )

    stage(0), stage(1)
    assert run().awaitTermination(600)
    stage(2)
    assert run().awaitTermination(600)  # restart-resume

    acc = read_ingested(spark, f"{tmp}/out", store_dir=f"{tmp}/store/near")
    got = sorted((r["batch"], r["doc_id"]) for r in acc.collect())
    assert got == [(0, 0), (0, 1), (1, 2), (2, 3)]
    # the URL-tier reject (310) must have died BEFORE the near store: its
    # article-0 signature appears exactly once (doc 0's) in the chains
    near = spark.read.parquet(
        *[p for p in glob.glob(f"{tmp}/store/near/b=*/v=*")]
    )
    assert near.select("id").distinct().count() == 4  # docs 0,1,2,3 only
    # staging is transient (r10 advice): every consumed batch=<id> copy
    # was dropped once its near tier committed — no unbounded shadow
    assert glob.glob(f"{tmp}/out_urlgate/batch=*") == []


# ---------------------------------------------------------------------------
# fingerprint tombstones + the CDC→corpus bridge (r10, cdc39)
# ---------------------------------------------------------------------------


def test_tombstone_frees_membership_and_readd_survives_compaction(spark, tmp_path):
    """Delete semantics of the exact store: after remove_batch_exact, a
    re-send of the content is ACCEPTED again; the re-add stays live
    through a compaction that applies the tombstone physically; a second
    delete kills the re-add too."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        compact_store,
        ingest_batch_exact,
        remove_batch_exact,
    )

    tmp = str(tmp_path)
    rows = [(0, "alpha text"), (1, "beta text")]
    b0 = spark.createDataFrame(rows, SCHEMA)
    ingest_batch_exact(spark, b0, 0, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    # delete doc 0 -> its fp leaves the accept set
    remove_batch_exact(spark, b0.filter("doc_id = 0"), 1, f"{tmp}/store")
    assert store_size(spark, f"{tmp}/store") == 1
    # re-send of the SAME text under a new id: novel again
    b2 = spark.createDataFrame([(50, "alpha text"), (51, "beta text")], SCHEMA)
    ingest_batch_exact(spark, b2, 2, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    got = sorted((r["batch"], r["doc_id"]) for r in
                 read_ingested(spark, f"{tmp}/out", f"{tmp}/store").collect())
    assert got == [(0, 0), (0, 1), (2, 50)]  # 51 rejected: beta still live
    assert store_size(spark, f"{tmp}/store") == 2
    # compaction applies the tombstone physically; the v=2 re-add SURVIVES
    # (version-aware fold) and the consumed tombstone segment is dropped
    assert compact_store(spark, f"{tmp}/store") == 2
    assert not os.path.isdir(f"{tmp}/store/_tomb")
    assert store_size(spark, f"{tmp}/store") == 2
    b3 = spark.createDataFrame([(70, "alpha text")], SCHEMA)
    ingest_batch_exact(spark, b3, 3, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    acc3 = read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter("batch = 3")
    assert acc3.count() == 0  # alpha re-owned by 50 since batch 2
    # second delete cycle against the POST-compaction store
    remove_batch_exact(
        spark, spark.createDataFrame([(50, "alpha text")], SCHEMA),
        4, f"{tmp}/store",
    )
    b5 = spark.createDataFrame([(90, "alpha text")], SCHEMA)
    ingest_batch_exact(spark, b5, 5, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    acc5 = read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter("batch = 5")
    assert [r["doc_id"] for r in acc5.collect()] == [90]


def test_tombstone_owner_check(spark, tmp_path):
    """Deleting a REJECTED duplicate must not free membership: the text is
    still represented in the corpus by its accepted owner."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
        remove_batch_exact,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame(
        [(0, "shared text"), (7, "shared text")], SCHEMA  # 7 is a dup: rejected
    )
    ingest_batch_exact(spark, b0, 0, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    # doc 7 (non-owner) deleted: fp must stay live (owner 0 remains)
    remove_batch_exact(
        spark, spark.createDataFrame([(7, "shared text")], SCHEMA),
        1, f"{tmp}/store",
    )
    assert store_size(spark, f"{tmp}/store") == 1
    b2 = spark.createDataFrame([(60, "shared text")], SCHEMA)
    ingest_batch_exact(spark, b2, 2, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    acc2 = read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter("batch = 2")
    assert acc2.count() == 0  # still a member via owner 0


def test_tombstone_stale_owner_pair_is_not_owner(spark, tmp_path):
    """r10-advice regression: a STALE (fp, id) pair — a previous owner
    whose fp was tombstoned and re-owned by another doc since — must not
    pass the owner check. Sequence: A owns T, A leaves, B re-adds T; A's
    row passes through T again and leaves — the current owner is B, so
    the second delete is a no-op and B's membership stays live (and a
    later re-send of T is still rejected). Must hold with and without an
    intervening compaction (compaction drops the stale pair physically —
    the outcome must not depend on its timing)."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        compact_store,
        ingest_batch_exact,
        remove_batch_exact,
    )

    for compact_between in (False, True):
        tmp = str(tmp_path / f"c{int(compact_between)}")
        a = spark.createDataFrame([(1, "text T")], SCHEMA)
        ingest_batch_exact(spark, a, 0, f"{tmp}/out", f"{tmp}/store",
                           store_owner_ids=True)
        # A updates away: fp tombstoned at dv=1
        remove_batch_exact(spark, a, 1, f"{tmp}/store")
        # B re-adds the same text: new live owner at v=2
        ingest_batch_exact(
            spark, spark.createDataFrame([(2, "text T")], SCHEMA),
            2, f"{tmp}/out", f"{tmp}/store", store_owner_ids=True,
        )
        if compact_between:
            compact_store(spark, f"{tmp}/store")
        # A's row passes through T again and updates away: the stale
        # (fp, 1) v=0 pair must NOT be treated as ownership
        remove_batch_exact(spark, a, 3, f"{tmp}/store")
        assert store_size(spark, f"{tmp}/store") == 1  # B still a member
        ingest_batch_exact(
            spark, spark.createDataFrame([(9, "text T")], SCHEMA),
            4, f"{tmp}/out", f"{tmp}/store", store_owner_ids=True,
        )
        acc4 = read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter(
            "batch = 4"
        )
        assert acc4.count() == 0, (
            f"membership silently freed (compact_between={compact_between})"
        )


def test_bridge_corpus_members_view(spark, tmp_path):
    """corpus_members pairs accepted rows with CURRENT fingerprint
    ownership: a deleted-then-re-accepted text contributes exactly its
    newest accepted row."""
    from kafka_connect_logminer2_spark.streaming.corpus_bridge import (
        corpus_members,
    )
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
        remove_batch_exact,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(0, "t zero"), (1, "t one")], SCHEMA)
    ingest_batch_exact(spark, b0, 0, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    remove_batch_exact(spark, b0.filter("doc_id = 0"), 1, f"{tmp}/store")
    ingest_batch_exact(
        spark, spark.createDataFrame([(42, "t zero")], SCHEMA),
        2, f"{tmp}/out", f"{tmp}/store", store_owner_ids=True,
    )
    members = corpus_members(spark, f"{tmp}/store", f"{tmp}/out")
    assert sorted(r["doc_id"] for r in members.collect()) == [1, 42]


def test_web_takedown_frees_both_tiers(spark, tmp_path):
    """cdc40 at unit scope, with a RESTART between the takedown batch and
    the republication batch: a takedown control row frees the page's URL
    fingerprint and content signatures (same-batch re-crawl accepted,
    removals first); untouched pages stay protected; the re-ingested
    content re-establishes protection against later republication; both
    tier stores compact in-line with tombstones pending."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        read_ingested,
    )
    from kafka_connect_logminer2_spark.streaming.web_ingest import (
        write_web_ingest,
    )

    schema = "doc_id long, url string, html string, op string"

    def art(i, n=80):
        return " ".join(f"k{i}_{j}" for j in range(n))

    rows = {
        0: [(i, f"http://w{i}.com/p", f"<p>{art(i)}</p>", "page")
            for i in range(4)],
        1: [
            (2, "http://w2.com/p", None, "takedown"),
            (52, "http://w2.com/p", f"<p>{art(2)}</p>", "page"),  # re-crawl
            (61, "http://w1.com/p?utm_a=1", f"<p>{art(1)}</p>", "page"),
            (60, "http://w60.com/p",
             "<p>" + " ".join(art(0).split(" ")[:-1]) + "</p>", "page"),
        ],
        2: [
            (70, "http://w70.com/p", f"<p>{art(2)}</p>", "page"),  # vs 52
            (71, "http://w71.com/p", f"<p>{art(9)}</p>", "page"),
        ],
    }
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i):
        df = spark.createDataFrame(rows[i], schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        return write_web_ingest(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/out", f"{tmp}/store", f"{tmp}/ckpt",
            min_tokens=5, num_buckets=4, max_chain=2,
            content_neardup=True, op_col="op",
        )

    stage(0), stage(1)
    assert run().awaitTermination(600)
    stage(2)
    assert run().awaitTermination(600)  # restart across the takedown

    acc = read_ingested(spark, f"{tmp}/out", store_dir=f"{tmp}/store/near")
    got = sorted((r["batch"], r["doc_id"]) for r in acc.collect())
    assert got == [(0, 0), (0, 1), (0, 2), (0, 3), (1, 52), (2, 71)]


def test_neardup_tombstone_same_id_readd_survives(spark, tmp_path):
    """cdc41's crux at unit scope: tombstone an id, then re-add signatures
    under the SAME id (an update) — the re-added signatures must reject
    near-copies, before AND after compaction applies the tombstone."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        compact_store,
        ingest_batch_neardup,
        remove_batch_neardup,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    ingest_batch_neardup(spark, b0, 0, f"{tmp}/out", f"{tmp}/store")
    remove_batch_neardup(
        spark, spark.createDataFrame([(1,)], "doc_id long"), 1, f"{tmp}/store"
    )
    # update: same id 1 re-enters with NEW content at a later batch
    b2 = spark.createDataFrame([(1, BASE + " v2 edition")], SCHEMA)
    # BASE was freed by the tombstone, so id 1's near-copy re-enters
    ingest_batch_neardup(spark, b2, 2, f"{tmp}/out", f"{tmp}/store")
    acc2 = read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter("batch = 2")
    assert [r["doc_id"] for r in acc2.collect()] == [1]
    # the re-added same-id signatures are LIVE: a near-copy is rejected...
    b3 = spark.createDataFrame([(9, BASE + " v2 edition extra")], SCHEMA)
    ingest_batch_neardup(spark, b3, 3, f"{tmp}/out", f"{tmp}/store")
    assert read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter(
        "batch = 3").count() == 0
    # ...and still after compaction physically applies the tombstone
    assert compact_store(spark, f"{tmp}/store") == 3
    assert not os.path.isdir(f"{tmp}/store/_tomb")
    b4 = spark.createDataFrame([(10, BASE + " v2 edition more")], SCHEMA)
    ingest_batch_neardup(spark, b4, 4, f"{tmp}/out", f"{tmp}/store")
    assert read_ingested(spark, f"{tmp}/out", f"{tmp}/store").filter(
        "batch = 4").count() == 0


def test_neardup_store_size_is_tombstone_aware(spark, tmp_path):
    """r10-advice regression: store_size on an id-keyed (near-dup) store
    must exclude taken-down/deleted ids — consistent with the fp-keyed
    branch — and count a same-id version-aware re-add exactly once."""
    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_neardup,
        remove_batch_neardup,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    ingest_batch_neardup(spark, b0, 0, f"{tmp}/out", f"{tmp}/store")
    assert store_size(spark, f"{tmp}/store") == 2
    remove_batch_neardup(
        spark, spark.createDataFrame([(1,)], "doc_id long"), 1, f"{tmp}/store"
    )
    assert store_size(spark, f"{tmp}/store") == 1  # id 1 deleted
    # update: same id re-enters at a later batch → live again, counted once
    ingest_batch_neardup(
        spark,
        spark.createDataFrame([(1, BASE + " v2 edition")], SCHEMA),
        2, f"{tmp}/out", f"{tmp}/store",
    )
    assert store_size(spark, f"{tmp}/store") == 2


def test_owner_ids_is_meta_guarded(spark, tmp_path):
    """Resuming a store with a different store_owner_ids setting must
    raise — chains mixing rows with and without the id column would make
    the union read's schema depend on file order."""
    import pytest

    from kafka_connect_logminer2_spark.streaming.corpus_ingest import (
        ingest_batch_exact,
    )

    tmp = str(tmp_path)
    b0 = spark.createDataFrame([(0, "some text")], SCHEMA)
    ingest_batch_exact(spark, b0, 0, f"{tmp}/out", f"{tmp}/store",
                       store_owner_ids=True)
    with pytest.raises(ValueError, match="owner_ids"):
        ingest_batch_exact(
            spark, spark.createDataFrame([(1, "other")], SCHEMA),
            1, f"{tmp}/out", f"{tmp}/store",
        )
