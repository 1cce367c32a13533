"""corpus_pipeline as a LIBRARY (functions/corpus.py): q119 value-hash
checks the ledger against SQL; these tests pin the STAGE FRAMES a real
caller materializes — cross-stage consistency (survivor sets nest, ledgers
equal the frames they summarize) and the knobs' semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.corpus import corpus_pipeline


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_stage_frames_nest_and_match_ledger(spark, sf_dir):
    out = corpus_pipeline(_docs(spark, sf_dir))
    ledger = {r["stage"]: (r["n_rows"], r["checksum"]) for r in out["ledger"].collect()}

    clean_ids = {r["doc_id"] for r in out["clean"].select("doc_id").collect()}
    kept_ids = {r["doc_id"] for r in out["kept"].select("doc_id").collect()}
    rep_ids = {r["doc_id"] for r in out["reps"].select("doc_id").collect()}
    train_ids = {r["doc_id"] for r in out["train"].select("doc_id").collect()}
    # survivors nest stage by stage
    assert train_ids <= rep_ids <= kept_ids <= clean_ids
    # ledger rows ARE the frames' aggregates
    assert ledger["01_quality"][0] == len(clean_ids)
    assert ledger["02_span_dedup"][0] == len(kept_ids)
    assert ledger["03_neardup_reps"][0] == len(rep_ids)
    assert ledger["04_train_split"][0] == len(train_ids)
    # monotone yield 00 -> 04
    counts = [ledger[s][0] for s in
              ("00_raw", "01_quality", "02_span_dedup", "03_neardup_reps",
               "04_train_split")]
    assert counts == sorted(counts, reverse=True)
    # packing conserves tokens: bins' token sum == train's token sum
    bt = out["bins"].agg(F.sum("bt")).collect()[0][0]
    tt = out["train"].agg(F.sum("n_tok_ws")).collect()[0][0]
    assert bt == tt == ledger["05_packed"][1]
    # sharding conserves docs: shard doc counts sum to the train count
    # (the 06 ledger's n_rows is the SHARD count, its checksum the order sig)
    sd = out["shards"].agg(F.sum("n_docs")).collect()[0][0]
    assert sd == len(train_ids)
    assert ledger["06_shards"][0] == 8


def test_reps_are_cluster_minima(spark, sf_dir):
    out = corpus_pipeline(_docs(spark, sf_dir))
    reps = out["reps"].select("doc_id", "cluster").collect()
    assert all(r["doc_id"] == r["cluster"] for r in reps)
    # one rep per cluster
    clusters = [r["cluster"] for r in reps]
    assert len(clusters) == len(set(clusters))


def test_train_pct_knob_widens_split(spark, sf_dir):
    full = corpus_pipeline(_docs(spark, sf_dir), train_pct=100)
    some = corpus_pipeline(_docs(spark, sf_dir), train_pct=90)
    n_full = full["train"].count()
    n_some = some["train"].count()
    assert n_full == full["reps"].count()  # 100% keeps every rep
    assert n_some < n_full
