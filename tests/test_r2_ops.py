"""Round-2 operators: span-level dedup, semantic near-dedup, deterministic
shard export, snapshot time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.dedup import dup_span_stats
from kafka_connect_logminer2_spark.functions.similarity import (
    embedding_neardup_pairs,
    semantic_neardup_pairs,
)


def test_dup_span_stats_detects_shared_boilerplate(spark):
    """A 9-token header pasted into docs 1 and 2 yields exactly its two
    8-token windows as dup spans in each; doc 3 shares nothing; a doc
    shorter than the span emits no row at all."""
    header = "this software is provided as is without any warranty"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, header + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, header + " one two three four five six seven eight nine"),
            (3, "completely different words in this third document body here ok"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, span_tokens=8).collect()}
    # 9-token header -> windows at offsets 0 and 1 are the shared spans
    assert out[1]["n_dup_spans"] == 2
    assert out[2]["n_dup_spans"] == 2
    assert out[3]["n_dup_spans"] == 0
    assert 4 not in out  # < 8 tokens: no windows, no row
    # n_spans = len - 7 distinct windows for repeat-free docs (doc 3: 10 tokens)
    assert out[3]["n_spans"] == 10 - 7
    assert abs(out[1]["dup_frac"] - 2 / out[1]["n_spans"]) < 1e-9


def test_dup_span_stats_identical_docs_all_spans_dup(spark):
    text = "a b c d e f g h i j k l"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = dup_span_stats(docs, span_tokens=8).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_dup_spans"] == r["n_spans"] == 12 - 7
        assert r["dup_frac"] == 1.0


def test_semantic_neardup_is_subset_of_exact_pairs(spark, sf_dir):
    """Within-cluster pairs must be a subset of the exact all-pairs result
    at the same threshold, with identical cos_sim values — the coarse
    partition can lose cross-cluster pairs (recall trade) but can never
    invent or perturb one."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["vec_id1"], r["vec_id2"]): r["cos_sim"]
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    sem = semantic_neardup_pairs(emb, threshold=0.4, n_centroids=16).collect()
    assert len(sem) > 0
    for r in sem:
        key = (r["vec_id1"], r["vec_id2"])
        assert key in exact
        assert abs(exact[key] - r["cos_sim"]) < 1e-9
    # the semantic pass should keep a usable share of the true pairs
    # (measured 19/66 = 0.29 at sf0.001 with 16 centroids on 500 vectors —
    # the threshold here is a regression floor, not a quality target)
    assert len(sem) >= 0.25 * len(exact)


def test_semantic_neardup_assignment_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, semantic_neardup_pairs(emb, threshold=0.4).collect()))
    b = sorted(map(tuple, semantic_neardup_pairs(emb, threshold=0.4).collect()))
    assert a == b


def test_snapshot_time_travel_reads_earlier_version(spark, tmp_path):
    """as_of pins the read to the largest version <= the bound; the latest
    read is unaffected; a bound before the first version yields None."""
    from kafka_connect_logminer2_spark.streaming.snapshot import read_snapshot

    snap = tmp_path / "snap"
    for v, vals in ((0, [(1, "a")]), (2, [(1, "a2"), (2, "b")]), (5, [(2, "b")])):
        df = spark.createDataFrame(vals, "k long, val string")
        df.coalesce(1).write.parquet(str(snap / f"v={v}"))
    assert read_snapshot(spark, str(snap)).count() == 1  # v=5
    as_of_3 = read_snapshot(spark, str(snap), as_of=3)  # -> v=2
    assert sorted(r["val"] for r in as_of_3.collect()) == ["a2", "b"]
    as_of_0 = read_snapshot(spark, str(snap), as_of=0)
    assert [r["val"] for r in as_of_0.collect()] == ["a"]
    assert read_snapshot(spark, str(snap / "missing"), as_of=4) is None


def test_shard_export_partition_is_stable_under_repartitioning(spark, sf_dir):
    """The shard/order signature must not depend on input partitioning —
    that's the whole point of hash-derived ordering."""
    from kafka_connect_logminer2_spark.plans.queries import q111_shard_export

    base = sorted(map(tuple, q111_shard_export(spark, sf_dir).collect()))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    h2 = (F.col("doc_id") * F.lit(40503)) % F.lit(65536)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.col("h2").asc(), F.col("doc_id").asc())
    again = sorted(
        map(
            tuple,
            docs.select(
                "doc_id", "n_chars", (h % 8).cast("int").alias("shard"), h2.alias("h2")
            )
            .withColumn("pos", F.row_number().over(w))
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.sum(F.col("pos") * F.col("doc_id")).alias("order_sig"),
            )
            .collect(),
        )
    )
    assert base == again


def test_snapshot_diff_labels_changes(spark, tmp_path):
    """INSERT/UPDATE/DELETE labeling across two versions, null-safe change
    detection, and after-image semantics (NULL image on DELETE)."""
    from kafka_connect_logminer2_spark.streaming.snapshot import snapshot_diff

    snap = tmp_path / "snap"
    v0 = [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)]
    v2 = [(1, "a", 10), (2, "b", 22), (4, "D", 40), (5, "e", 50)]
    for v, vals in ((0, v0), (2, v2)):
        spark.createDataFrame(vals, "k long, name string, val long").coalesce(
            1
        ).write.parquet(str(snap / f"v={v}"))
    out = {
        r["k"]: (r["change_type"], r["name"], r["val"])
        for r in snapshot_diff(spark, str(snap), 0, 2, ["k"]).collect()
    }
    assert 1 not in out  # unchanged
    assert out[2] == ("UPDATE", "b", 22)  # NULL -> value is a change
    assert out[3] == ("DELETE", None, None)  # image nulled on delete
    assert out[4] == ("UPDATE", "D", 40)
    assert out[5] == ("INSERT", "e", 50)
    # missing version -> None, not an exception
    assert snapshot_diff(spark, str(snap), 0, 1, ["k"]) is not None  # v<=1 is v0... diff(v0,v0)
    assert snapshot_diff(spark, str(tmp_path / "none"), 0, 2, ["k"]) is None


def test_snapshot_diff_same_version_is_empty(spark, tmp_path):
    from kafka_connect_logminer2_spark.streaming.snapshot import snapshot_diff

    snap = tmp_path / "snap"
    spark.createDataFrame([(1, "a")], "k long, name string").coalesce(1).write.parquet(
        str(snap / "v=0")
    )
    assert snapshot_diff(spark, str(snap), 0, 0, ["k"]).count() == 0


def test_ivf_partitioned_index_equals_inmemory_and_prunes(spark, sf_dir, tmp_path):
    """The persisted cell-partitioned IVF index is a LAYOUT change, not a
    semantics change: its top-k must equal ivf_topk's bit-for-bit. And the
    point of the layout — the probed-cell filter resolves to
    PartitionFilters at planning time and the scan touches strictly fewer
    partition dirs than exist."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_query_index,
        ivf_topk,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    cmat = ivf_write_index(emb, idx, n_centroids=64, train_iters=2)
    out = ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=5)

    mem = sorted(map(tuple, ivf_topk(emb, queries, k=5, nprobe=5).collect()))
    assert sorted(map(tuple, out.collect())) == mem

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "_cell" in plan.split("PartitionFilters:")[1].split("]")[0]
    # strictly fewer cell dirs actually read than materialized — measured
    # with input_file_name() at execution (inputFiles() lists the
    # pre-pruning FileIndex, so it can't see pruning): one query's 5 probed
    # cells (same float64 stable-argsort math as the reader) must open at
    # most 5 of the 64 directories
    import glob as _glob

    import numpy as np

    qvec = np.asarray(queries.limit(1).collect()[0]["embedding"], dtype=np.float64)
    qvec /= np.linalg.norm(qvec)
    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    probes = [int(c) for c in np.argsort(-(qvec @ cn.T), kind="stable")[:5]]
    seen = {
        f.split("_cell=")[1].split("/")[0]
        for (f,) in spark.read.parquet(idx)
        .filter(F.col("_cell").isin(probes))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    n_cells = len(_glob.glob(f"{idx}/_cell=*"))
    assert 0 < len(seen) <= 5 < n_cells


def test_snapshot_diff_before_images(spark, tmp_path):
    """include_before emits the from-version image per column: NULL for
    INSERT, populated for UPDATE/DELETE — the −before/+after pair
    incremental aggregate maintenance folds."""
    from kafka_connect_logminer2_spark.streaming.snapshot import snapshot_diff

    snap = tmp_path / "snap"
    v0 = [(1, "x", 10), (2, "y", 20)]
    v1 = [(1, "x", 11), (3, "z", 30)]
    for v, vals in ((0, v0), (1, v1)):
        spark.createDataFrame(vals, "k long, g string, val long").coalesce(
            1
        ).write.parquet(str(snap / f"v={v}"))
    out = {
        r["k"]: r
        for r in snapshot_diff(
            spark, str(snap), 0, 1, ["k"], include_before=True
        ).collect()
    }
    assert (out[1]["val_before"], out[1]["val"]) == (10, 11)
    assert (out[2]["change_type"], out[2]["val_before"], out[2]["val"]) == (
        "DELETE",
        20,
        None,
    )
    assert (out[3]["change_type"], out[3]["val_before"], out[3]["val"]) == (
        "INSERT",
        None,
        30,
    )


def test_write_aggregate_group_reassignment_and_as_of(spark, tmp_path):
    """The continuously-maintained aggregate must handle the case the CDC
    scenario doesn't hit: an UPDATE that MOVES a row between groups (the
    −before contribution leaves the old group, the +after joins the new
    one), plus deletes shrinking a group to zero (it leaves the state) and
    as-of reads of earlier aggregate versions."""
    import glob
    import os
    import shutil
    import time as _time

    from kafka_connect_logminer2_spark.plans.cdc import customer_registry, default_config
    from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows
    from kafka_connect_logminer2_spark.streaming.pipeline import (
        cdc_stream,
        read_redo_stream_files,
    )
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        read_aggregate,
        write_aggregate,
    )

    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/redo")
    ins = (
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME","C_NATIONKEY",'
        "\"C_ACCTBAL\",\"C_MKTSEGMENT\") values ({k},'n',1,{bal},'{seg}')"
    )
    batch0 = redo_events_from_rows(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
                 sql_redo=ins.format(k=1, bal=10, seg="AUTOMOBILE"), row_id="r1"),
            dict(scn=3, operation="INSERT", xid="A", table_name="CUSTOMER",
                 sql_redo=ins.format(k=2, bal=20, seg="BUILDING"), row_id="r2"),
            dict(scn=4, operation="COMMIT", xid="A", commit_scn=4),
        ],
    )
    upd = (
        'update "TPCH"."CUSTOMER" set "C_MKTSEGMENT" = \'BUILDING\', "C_ACCTBAL" = 15 '
        'where "C_CUSTKEY" = 1 and "C_MKTSEGMENT" = \'AUTOMOBILE\' and "C_ACCTBAL" = 10'
    )
    dele = 'delete from "TPCH"."CUSTOMER" where "C_CUSTKEY" = 2 and "C_ACCTBAL" = 20'
    batch1 = redo_events_from_rows(
        spark,
        [
            dict(scn=10, operation="START", xid="B"),
            dict(scn=11, operation="UPDATE", xid="B", table_name="CUSTOMER",
                 sql_redo=upd, row_id="r1"),
            dict(scn=12, operation="DELETE", xid="B", table_name="CUSTOMER",
                 sql_redo=dele, row_id="r2"),
            dict(scn=13, operation="COMMIT", xid="B", commit_scn=13),
        ],
    )
    now = _time.time()
    for i, b in enumerate((batch0, batch1)):
        b.coalesce(1).write.parquet(f"{tmp}/stage{i}")
        (part,) = glob.glob(f"{tmp}/stage{i}/part*")
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    q = write_aggregate(
        cdc_stream(
            read_redo_stream_files(spark, f"{tmp}/redo", max_files_per_trigger=1),
            default_config(),
        ),
        customer_registry(),
        "TPCH",
        "CUSTOMER",
        ["C_CUSTKEY"],
        ["C_MKTSEGMENT"],
        ["C_ACCTBAL"],
        f"{tmp}/snap",
        f"{tmp}/agg",
        f"{tmp}/ckpt",
    )
    assert q.awaitTermination(300)

    final = {
        r["C_MKTSEGMENT"]: (r["n"], r["sum_C_ACCTBAL"])
        for r in read_aggregate(spark, f"{tmp}/agg").collect()
    }
    # k1 moved AUTOMOBILE→BUILDING with bal 15; k2 (BUILDING, 20) deleted;
    # AUTOMOBILE shrank to 0 and must be gone entirely
    assert final == {"BUILDING": (1, 15.0)}
    v0 = {
        r["C_MKTSEGMENT"]: (r["n"], r["sum_C_ACCTBAL"])
        for r in read_aggregate(spark, f"{tmp}/agg", as_of=0).collect()
    }
    assert v0 == {"AUTOMOBILE": (1, 10.0), "BUILDING": (1, 20.0)}


def test_vacuum_versions_retention(spark, tmp_path):
    """VACUUM keeps the newest `keep` versions: the latest read is
    unchanged, time travel inside the horizon still works, and as-of reads
    older than the horizon resolve to the oldest surviving version (or
    None below it) — the documented retention trade."""
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        read_snapshot,
        vacuum_versions,
    )

    snap = tmp_path / "snap"
    for v in (0, 1, 3, 7):
        spark.createDataFrame([(v,)], "k long").coalesce(1).write.parquet(
            str(snap / f"v={v}")
        )
    removed = vacuum_versions(str(snap), keep=2)
    assert removed == [0, 1]
    assert read_snapshot(spark, str(snap)).collect()[0]["k"] == 7
    assert read_snapshot(spark, str(snap), as_of=5).collect()[0]["k"] == 3
    # horizon: versions 0/1 are gone — an as-of bound below the oldest
    # survivor finds nothing
    assert read_snapshot(spark, str(snap), as_of=2) is None
    # keep >= number of versions is a no-op; keep < 1 rejected
    assert vacuum_versions(str(snap), keep=5) == []
    try:
        vacuum_versions(str(snap), keep=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_change_feed_window_reads_partition_pruned(spark, tmp_path):
    """read_change_feed's batch bounds must become partition filters over
    the batch= directories, and the feed must carry before-images."""
    from kafka_connect_logminer2_spark.streaming.snapshot import (
        diff_states,
        read_change_feed,
    )

    cdf = tmp_path / "cdf"
    v0 = spark.createDataFrame([(1, 10)], "k long, val long")
    v1 = spark.createDataFrame([(1, 11), (2, 20)], "k long, val long")
    diff_states(None, v0, ["k"], include_before=True).coalesce(1).write.parquet(
        str(cdf / "batch=0")
    )
    diff_states(v0, v1, ["k"], include_before=True).coalesce(1).write.parquet(
        str(cdf / "batch=1")
    )
    feed = read_change_feed(spark, str(cdf))
    assert {(r["batch"], r["k"], r["change_type"]) for r in feed.collect()} == {
        (0, 1, "INSERT"),
        (1, 1, "UPDATE"),
        (1, 2, "INSERT"),
    }
    upd = feed.filter("batch = 1 and k = 1").collect()[0]
    assert (upd["val_before"], upd["val"]) == (10, 11)
    windowed = read_change_feed(spark, str(cdf), from_batch=1)
    assert windowed.count() == 2
    plan = windowed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "batch" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert read_change_feed(spark, str(tmp_path / "nope")) is None


def test_fold_aggregate_survives_added_sum_column(spark):
    """A sum column added by mid-stream DDL is absent from the previous
    snapshot version — the fold must read it as a 0-contribution NULL
    there instead of failing analysis."""
    from kafka_connect_logminer2_spark.streaming.snapshot import fold_aggregate_step

    prev = spark.createDataFrame([(1, "g")], "k long, grp string")  # no 'val' yet
    new = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 7.0)], "k long, grp string, val double"
    )
    keys = new.select("k").distinct()
    # the pre-DDL aggregate state lacks the sum column as well
    base = spark.createDataFrame([("g", 1)], "grp string, n long")
    out = fold_aggregate_step(prev, new, keys, base, ["k"], ["grp"], ["val"]).collect()
    # fold = base(1 row) − prev(key 1, val NULL→0) + new(keys 1,2, 5+7):
    # exactly the aggregate of the post-DDL state
    assert [(r["grp"], r["n"], r["sum_val"]) for r in out] == [("g", 2, 12.0)]


def test_ivf_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Appending the second half of the corpus to an index built on the
    first half (same frozen centroid model) must answer queries
    bit-for-bit like a full one-shot build with that model."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_append_index,
        ivf_centroids,
        ivf_query_index,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.filter("vec_id % 2 = 0")
    second = emb.filter("vec_id % 2 = 1")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # model trained on the FULL corpus in both paths so only the build
    # strategy differs (incremental vs one-shot)
    cmat = ivf_centroids(emb, n_centroids=64, train_iters=2)

    full_idx = str(tmp_path / "full")
    from kafka_connect_logminer2_spark.functions.similarity import _cell_assign_udf

    emb.select(
        "vec_id", "embedding", _cell_assign_udf(cmat)("embedding").alias("_cell")
    ).write.partitionBy("_cell").parquet(full_idx)

    inc_idx = str(tmp_path / "inc")
    first.select(
        "vec_id", "embedding", _cell_assign_udf(cmat)("embedding").alias("_cell")
    ).write.partitionBy("_cell").parquet(inc_idx)
    ivf_append_index(second, inc_idx, cmat)

    a = sorted(map(tuple, ivf_query_index(spark, full_idx, cmat, queries, k=5, nprobe=5).collect()))
    b = sorted(map(tuple, ivf_query_index(spark, inc_idx, cmat, queries, k=5, nprobe=5).collect()))
    assert a == b and len(a) == 40


def test_ivf_centroid_model_persists_and_reopens(spark, sf_dir, tmp_path):
    """An index that can only be queried by the driver that built it is not
    persisted: the centroid model now writes to index_dir/_model alongside
    the cell partitions, and query/append reload it when cmat is not
    passed (the cross-session serving path). Bit-for-bit: reloaded model
    == built model, and cmat=None queries == cmat-in-hand queries. The
    underscore-prefixed _model dir must stay invisible to the data read."""
    import numpy as np

    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_append_index,
        ivf_query_index,
        ivf_write_index,
        load_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    cmat = ivf_write_index(emb, idx, n_centroids=32, train_iters=1)

    assert np.array_equal(load_ivf_centroids(spark, idx), cmat)
    with_model = sorted(
        map(tuple, ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=4).collect())
    )
    model_free = sorted(
        map(tuple, ivf_query_index(spark, idx, None, queries, k=5, nprobe=4).collect())
    )
    assert with_model == model_free and len(model_free) == 40

    # the data read never sees the model: same rows, same columns as the corpus
    data = spark.read.parquet(idx)
    assert data.count() == emb.count()
    assert set(data.columns) == {"vec_id", "embedding", "_cell"}

    # append without the in-memory model: reloads from _model, and the
    # appended index answers identically to a fresh full build
    extra = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    ).limit(50)
    ivf_append_index(extra, idx, None)
    assert spark.read.parquet(idx).count() == emb.count() + 50


def test_ivf_quantized_index_smaller_and_recall_held(spark, sf_dir, tmp_path):
    """quantize=True stores packed-int8 payloads: the index must be
    MATERIALLY smaller on disk and its top-k must agree with the float
    index almost everywhere (int8 rounding perturbs cosines ~1e-3 — ties
    may flip, wholesale rank changes may not)."""
    import os as _os

    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_query_index,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fidx, qidx = str(tmp_path / "f"), str(tmp_path / "q")
    ivf_write_index(emb, fidx, n_centroids=16, train_iters=1)
    ivf_write_index(emb, qidx, n_centroids=16, train_iters=1, quantize=True)

    def du(root):
        return sum(
            _os.path.getsize(_os.path.join(dp, f))
            for dp, _, fs in _os.walk(root)
            for f in fs
            if not dp.endswith("_model")  # same model both layouts
        )

    assert du(qidx) < 0.55 * du(fidx), (du(qidx), du(fidx))

    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_query_index(spark, fidx, None, queries, k=5, nprobe=4).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_query_index(spark, qidx, None, queries, k=5, nprobe=4).collect()
    }
    assert len(full & quant) / len(full) >= 0.9, (len(full & quant), len(full))


def test_ivf_append_matches_quantized_layout(spark, sf_dir, tmp_path):
    """Appending to a quantized index must append QUANTIZED rows (a float
    append would silently corrupt the read schema); queries over the grown
    index keep working and see every row."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_append_index,
        ivf_query_index,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "q")
    ivf_write_index(emb, idx, n_centroids=16, train_iters=1, quantize=True)
    extra = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding").limit(40)
    ivf_append_index(extra, idx, None)

    data = spark.read.parquet(idx)
    assert set(data.columns) == {"vec_id", "scale", "q_bin", "_cell"}
    assert data.count() == emb.count() + 40
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_query_index(spark, idx, None, queries, k=5, nprobe=4)
    assert out.count() == 20


def test_ivf_batch_query_equals_driver_form_no_nested_loop(spark, sf_dir, tmp_path):
    """The corpus-scale serving form (ivf_query_index_batch): queries stay
    a DataFrame, probes explode to (query, cell) rows, the probe join is a
    plain equi-join on _cell. Must be ROW-IDENTICAL to ivf_query_index for
    the same inputs (same stable-argsort probes, rounding, tie-breaks,
    self-exclusion), and the plan must contain NO broadcast nested-loop —
    the exact operator that cannot scale past driver-sized query sets."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_query_index,
        ivf_query_index_batch,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # a WIDE query set — the regime the batch form exists for
    queries = emb.filter(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    cmat = ivf_write_index(emb, idx, n_centroids=64, train_iters=2)

    batch = ivf_query_index_batch(spark, idx, cmat, queries, k=5, nprobe=5)
    driver = ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=5)
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, driver.collect()))

    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # and the model-reload path serves identically after a driver restart
    reloaded = ivf_query_index_batch(spark, idx, None, queries, k=5, nprobe=5)
    assert sorted(map(tuple, reloaded.collect())) == sorted(map(tuple, batch.collect()))


def test_ivf_delete_tombstone_compact_equals_rebuild(spark, sf_dir, tmp_path):
    """Index deletion lifecycle: tombstoned ids vanish from BOTH query
    paths immediately; ivf_compact_index physically applies the
    tombstones with results identical to a fresh rebuild of the surviving
    rows under the same centroid model; appending a live-tombstoned id
    raises (a silent tombstone-eats-new-row is data loss), and works
    again after compaction."""
    import os

    import pytest

    from kafka_connect_logminer2_spark.functions.similarity import (
        _cell_assign_udf,
        ivf_append_index,
        ivf_compact_index,
        ivf_delete_index,
        ivf_query_index,
        ivf_query_index_batch,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    cmat = ivf_write_index(emb, idx, n_centroids=32, train_iters=1)
    n_total = emb.count()

    # delete ids that ARE current answers, so the test bites
    before = ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=4)
    doomed = sorted({r["neighbor_id"] for r in before.collect()})[:3]
    n_hit = ivf_delete_index(spark, idx, doomed + [10**9])  # absent id: no-op
    assert n_hit == 3
    # idempotent re-delete: extra tombstone rows, same visible state
    assert ivf_delete_index(spark, idx, doomed[:1]) == 1

    survivors_idx = str(tmp_path / "rebuilt")
    emb.filter(~F.col("vec_id").isin(doomed)).select(
        "vec_id", "embedding", _cell_assign_udf(cmat)("embedding").alias("_cell")
    ).write.partitionBy("_cell").parquet(survivors_idx)
    want = sorted(
        map(tuple, ivf_query_index(spark, survivors_idx, cmat, queries, k=5, nprobe=4).collect())
    )

    got_tomb = sorted(
        map(tuple, ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=4).collect())
    )
    assert got_tomb == want and len(want) == 40
    assert not set(doomed) & {t[1] for t in got_tomb}
    got_batch = sorted(
        map(tuple, ivf_query_index_batch(spark, idx, cmat, queries, k=5, nprobe=4).collect())
    )
    assert got_batch == want

    # append of a tombstoned id must raise until compaction
    readd = emb.filter(F.col("vec_id") == doomed[0])
    with pytest.raises(ValueError, match="tombstone"):
        ivf_append_index(readd, idx, cmat)

    cells = ivf_compact_index(spark, idx)
    assert cells and not os.path.isdir(f"{idx}/_tombstones")
    assert spark.read.parquet(idx).count() == n_total - 3
    got_compacted = sorted(
        map(tuple, ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=4).collect())
    )
    assert got_compacted == want
    # compaction is idempotent (no tombstones → no-op)
    assert ivf_compact_index(spark, idx) == []

    # the re-append path reopens after compaction
    ivf_append_index(readd, idx, cmat)
    assert spark.read.parquet(idx).count() == n_total - 2


def test_ivf_tombstone_read_pruned_and_payload_blind(spark, sf_dir, tmp_path):
    """Plan audit for the deletion path: the tombstone scan in a probed
    query is partition-pruned to the probed cells (PartitionFilters on
    _cell), its ReadSchema carries only the id (never the vector payload),
    and the suppression is a LeftAnti equi-join — no broadcast hint, so a
    neglected tombstone set degrades to a shuffle join instead of an OOM."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        ivf_delete_index,
        ivf_query_index,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    cmat = ivf_write_index(emb, idx, n_centroids=32, train_iters=1)
    assert ivf_delete_index(spark, idx, [int(r[0]) for r in emb.limit(3).collect()]) == 3

    out = ivf_query_index(spark, idx, cmat, queries, k=5, nprobe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2, plan  # index data + tombstones, nothing else
    # the tombstone scan is the payload-blind one: ReadSchema is the bare
    # id (locations are truncated in the plan string, so the schema IS the
    # identifying mark — and the mark is itself the column-pruning claim)
    tomb = [l for l in scans if "ReadSchema: struct<vec_id:bigint>" in l]
    assert len(tomb) == 1, plan
    for scan in scans:  # both reads pruned to the probed cells
        assert "_cell" in scan.split("PartitionFilters:")[1].split("]")[0]
    assert "LeftAnti" in plan
