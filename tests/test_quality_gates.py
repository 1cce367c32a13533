"""q155_quality_gates (functions/quality_gates.py): the approximate
operators' pytest-only gates, re-expressed as driver-visible DATA. Every
gate must pass on the fixture, the row shape must match the oracle's
expectation exactly (that IS the mechanism: a regression flips a pass
boolean and breaks the value hash), and the BPE reference twin must be
sensitive (a perturbed reference disagrees — the gate isn't tautological)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.quality_gates import (
    _ref_train_bpe,
    quality_gate_rows,
)

EXPECTED_GATES = {
    "ann_ivf_auto_recall_at_5": 0.30,
    "ann_ivf_recall_at_5": 0.30,
    "ann_lsh_recall_at_5": 0.30,
    "approx_distinct_rel_err": 0.05,
    "bpe_reference_equality": 1.00,
    "hll_union_rel_error": 0.02,
    "hll_union_vs_exact_rel_error": 0.05,
    "minhash_banded_estimate_mae": 0.12,
    "minhash_banded_pair_recall": 0.80,
    "pagerank_cycle_uniform_err": 1e-9,
    "pca_whiten_cov_identity_err": 1e-4,
    "simhash_exact_dup_recall": 1.00,
}


def test_all_gates_pass_and_match_oracle_shape(spark, sf_dir):
    rows = quality_gate_rows(spark, sf_dir).collect()
    got = {r["gate"]: (r["bound"], r["pass"]) for r in rows}
    assert set(got) == set(EXPECTED_GATES)
    for gate, bound in EXPECTED_GATES.items():
        assert got[gate][0] == bound, gate
        assert got[gate][1] is True, f"quality gate regressed: {gate}"
    # sorted by gate — the column/row order the oracle compare hashes
    assert [r["gate"] for r in rows] == sorted(EXPECTED_GATES)


def test_bpe_reference_twin_is_sensitive(spark, sf_dir):
    """The reference BPE twin must actually discriminate: training with a
    different merge budget produces a different merge list, so an engine
    regression cannot hide behind a degenerate always-equal reference."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    ten = _ref_train_bpe(texts, num_merges=10)
    five = _ref_train_bpe(texts, num_merges=5)
    assert len(ten) == 10 and len(five) == 5 and ten[:5] == five
    assert ten != five
