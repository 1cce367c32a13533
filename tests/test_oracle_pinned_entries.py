"""The r8 oracle-pinned rewrites of the five formerly rows-only driver
entries (q20/q21/q26/q31/q35 — the r7 verdict's top item): each now emits
a deterministic relation whose DuckDB oracle pins the expected values.
These pytest twins assert the same facts without DuckDB, so a regression
is visible in BOTH gates."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_q20_minhash_planted_pairs_exact(spark):
    from kafka_connect_logminer2_spark.plans.queries import q20_minhash_lsh

    got = [(r["doc_id1"], r["doc_id2"]) for r in q20_minhash_lsh(spark, SF).collect()]
    assert got == [(i, i + 100) for i in range(24)]


def test_q21_simhash_planted_pairs_exact(spark):
    from kafka_connect_logminer2_spark.plans.queries import q21_simhash

    rows = q21_simhash(spark, SF).collect()
    assert [(r["doc_id1"], r["doc_id2"]) for r in rows] == [
        (i, i + 100) for i in range(24)
    ]
    # order-permuted twins hash identically BY CONSTRUCTION
    assert all(r["hamming"] == 0 for r in rows)


def test_q26_exact_count_and_accuracy_gate(spark):
    from kafka_connect_logminer2_spark.plans.queries import q26_approx_distinct

    r = q26_approx_distinct(spark, SF).first()
    assert r["approx_within_5pct"] is True
    assert r["n_exact_users"] > 0 and r["n_events"] >= r["n_exact_users"]


def test_ann_gate_rows_all_pass(spark):
    from kafka_connect_logminer2_spark.plans.queries import q31_ann_lsh, q35_ann_ivf

    from kafka_connect_logminer2_spark.plans.queries import (
        q173_pq_ann,
        q174_ivfpq_ann,
    )

    for fn, prefix in (
        (q31_ann_lsh, "ann_lsh"),
        (q35_ann_ivf, "ann_ivf"),
        (q173_pq_ann, "ann_pq"),
        (q174_ivfpq_ann, "ann_ivfpq"),
    ):
        rows = fn(spark, SF).collect()
        assert len(rows) == 5
        assert all(r["metric"].startswith(prefix) for r in rows)
        assert all(r["pass"] for r in rows), [
            r["metric"] for r in rows if not r["pass"]
        ]


def test_q175_clustered_gap_gates(spark):
    """r12 (r11 verdict #5): on the planted mixture-of-Gaussians corpus,
    residual-PQ must beat raw PQ by the gated margin at the same 128-bit
    budget, the IVF-PQ recall floor must hold with real margin, and the
    seeded fixture's checksum must be bit-stable — same facts the DuckDB
    oracle pins TRUE."""
    from kafka_connect_logminer2_spark.plans.queries import (
        q175_ivfpq_clustered,
    )

    rows = q175_ivfpq_clustered(spark, SF).collect()
    assert len(rows) == 3
    by = {r["metric"]: r for r in rows}
    assert by["ivfpq_beats_pq_on_clustered"]["pass"]
    assert by["ivfpq_clustered_recall_at_5"]["pass"]
    assert by["ivfpq_clustered_fixture_checksum"]["pass"]


def test_q176_rerank_gates_and_identity(spark):
    """r12: the two-stage (PQ prefilter → exact re-rank) gates must hold —
    recall floor 0.80 with the beats-raw-PQ margin, and the C ≥ N identity
    with cosine_topk that pins the re-rank stage to the exact operator."""
    from kafka_connect_logminer2_spark.plans.queries import q176_pq_rerank

    rows = q176_pq_rerank(spark, SF).collect()
    assert len(rows) == 7
    bad = [r["metric"] for r in rows if not r["pass"]]
    assert not bad, bad


def test_r8_gate_converted_entries_all_pass(spark):
    """The r8 batch of rows-only → gate-row conversions (q59, q114, q120,
    q123, q126, q132, q136): every emitted gate must pass — the same
    facts their DuckDB oracles pin TRUE."""
    from kafka_connect_logminer2_spark.plans import queries as Q

    reg = Q.queries()
    for name in (
        "q59_kmeans", "q114_ann_partitioned", "q120_pca_whiten",
        "q123_ann_pca", "q126_ann_ivf_batch", "q132_bpe_train",
        "q136_audio_spectrogram",
    ):
        rows = reg[name](spark, SF).collect()
        assert rows and all(r["pass"] for r in rows), (
            name, [r["metric"] for r in rows if not r["pass"]]
        )


def test_q138_pagerank_full_relation(spark):
    """q138's r8 full oracle (10 unrolled iterations in DuckDB): the
    pytest side pins the kernel invariants on the same emission —
    Σrank == 1 and all ranks positive across every node."""
    from kafka_connect_logminer2_spark.plans.queries import q138_pagerank

    import pyspark.sql.functions as F

    df = q138_pagerank(spark, SF)
    agg = df.agg(F.sum("rank").alias("s"), F.min("rank").alias("mn")).first()
    assert abs(agg["s"] - 1.0) < 1e-4 and agg["mn"] > 0


def test_q162_bpe_tokenize_gates(spark):
    from kafka_connect_logminer2_spark.plans.queries import q162_bpe_tokenize

    rows = q162_bpe_tokenize(spark, SF).collect()
    assert rows and all(
        r["reconstruction_lossless"] and r["tokens_within_bound"] for r in rows
    )
    assert sum(r["n_docs"] for r in rows) > 0


def test_q163_chunking_window_math(spark):
    """chunk_documents window arithmetic on a controlled doc: 100 tokens
    at (16, 4) -> stride 12 -> 8 chunks (start 96 is fully contained in
    the window at 84 and is DROPPED — the r9 tail contract); empty text
    one 1-token chunk."""
    from kafka_connect_logminer2_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    assert sorted(by_doc[1]) == [(i, 16) for i in range(8)]
    assert by_doc[2] == [(0, 2)]
    assert by_doc[3] == [(0, 1)]  # split('') is [''] in both engines
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_q163_tail_contract_no_contained_duplicates(spark):
    """The r8 advisor's duplicate-tail cases and the contract's two
    invariants: every token appears in >=1 chunk (nothing lost), every
    chunk contributes >=1 token the previous chunk didn't cover (no pure
    duplicates) — across token counts straddling every stride boundary."""
    from kafka_connect_logminer2_spark.functions.text import chunk_documents

    cases = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 140)]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride, chunk, overlap = 48, 64, 16
    for n, _ in cases:
        chunks = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
        # coverage: the last chunk must reach the last token
        last_start = chunks[-1]["chunk_idx"] * stride
        assert last_start + chunks[-1]["n_tokens"] == n, n
        # no contained duplicates: each start past 0 adds unseen tokens
        for r in chunks[1:]:
            s = r["chunk_idx"] * stride
            prev_end = (r["chunk_idx"] - 1) * stride + chunk
            assert s + r["n_tokens"] > prev_end or r["n_tokens"] == chunk, n
            assert s < n - overlap, n
    # the advisor's examples: 97 tokens -> starts {0, 48}, not 96;
    # 49 tokens -> the 1-token chunk at 48 is gone
    assert [r["chunk_idx"] for r in sorted(by_doc[97], key=lambda r: r["chunk_idx"])] == [0, 1]
    assert [r["chunk_idx"] for r in by_doc[49]] == [0]
    assert by_doc[49][0]["n_tokens"] == 49


def test_q177_filtered_ann_prefilter_semantics(spark):
    """r12: every neighbor satisfies the predicate, every query gets
    exactly k rows (pre-filter semantics — post-filtering approximate
    candidates can return fewer), and the result is the exact top-k of
    the filtered corpus."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        cosine_topk,
    )
    from kafka_connect_logminer2_spark.plans.queries import q177_filtered_ann
    from pyspark.sql import functions as F

    rows = q177_filtered_ann(spark, SF).collect()
    assert len(rows) == 40  # 8 queries x 5
    assert all(r["neighbor_id"] % 7 == 3 for r in rows)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = cosine_topk(emb.filter(F.col("vec_id") % 7 == 3), q, k=5).orderBy(
        "query_id", "rank"
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]


def test_q178_rrf_membership_and_scores(spark):
    """r12: RRF output is drawn from the union of the two top-10 lists,
    scores equal the hand-computed 1/(60+rank) sums, and a doc in BOTH
    lists outranks equal-single-list docs."""
    from kafka_connect_logminer2_spark.plans.queries import (
        q178_rrf_fusion,
        q98_bm25,
    )
    from kafka_connect_logminer2_spark.functions.similarity import (
        cosine_topk,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lex = {r["doc_id"]: r["rank"] for r in q98_bm25(spark, SF).collect()}
    den = {
        r["neighbor_id"]: r["rank"]
        for r in cosine_topk(emb, q, k=10).collect()
    }
    got = q178_rrf_fusion(spark, SF).collect()
    assert 1 <= len(got) <= 10
    union = set(lex) | set(den)
    for r in got:
        assert r["doc_id"] in union
        want = round(
            (1.0 / (60 + lex[r["doc_id"]]) if r["doc_id"] in lex else 0.0)
            + (1.0 / (60 + den[r["doc_id"]]) if r["doc_id"] in den else 0.0),
            6,
        )
        assert abs(r["rrf"] - want) < 1e-9, (r, want)
