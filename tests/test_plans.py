"""Physical-plan audits — the 100 TB scale guards.

Correctness tests prove the queries right at small SF; these prove the
*plans* stay right: dimension joins broadcast, filters reach the parquet
scan, the as-of join shuffles exactly once, and no query ever falls back to
row-at-a-time Python (BatchEvalPython) — only Arrow-batched UDFs are allowed.
A regression here is invisible at sf0.001 and fatal at 1000 executors.
"""

from __future__ import annotations

import pytest

from kafka_connect_logminer2_spark.plans.queries import QUERY_REGISTRY


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_all_broadcast(spark, sf_dir):
    """q03 joins lineitem to orders/customer/nation/region — every dim side
    must broadcast; a sort-merge join here means a full lineitem shuffle."""
    plan = plan_of(QUERY_REGISTRY["q03_star_join"][0](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_pricing_summary_filter_pushed_to_scan(spark, sf_dir):
    """q01's shipdate predicate must reach the parquet reader (PushedFilters),
    not run post-scan — at 100 TB that's the difference between reading one
    partition range and reading everything."""
    plan = plan_of(QUERY_REGISTRY["q01_pricing_summary"][0](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Map-side combine: the agg must run partial_ before the key shuffle."""
    plan = plan_of(QUERY_REGISTRY["q01_pricing_summary"][0](spark, sf_dir))
    assert "partial_" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union + running-last as-of formulation costs exactly one exchange
    (by user_id); more means an accidental join/regrouping crept in."""
    plan = plan_of(QUERY_REGISTRY["q37_asof_join"][0](spark, sf_dir))
    assert plan.count("Exchange") == 1


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    """ANN brute force must broadcast the (small) query set, never shuffle
    the corpus for the join."""
    plan = plan_of(QUERY_REGISTRY["q22_cosine_topk"][0](spark, sf_dir))
    assert "Broadcast" in plan


def test_column_pruning_documents(spark, sf_dir):
    """q33 touches only lang+text; the scan must not read doc_id/source."""
    plan = plan_of(QUERY_REGISTRY["q33_bpe_tokens"][0](spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" in scan_line and "text" in scan_line
    assert "source" not in scan_line and "n_chars" not in scan_line


def test_range_join_rides_equi_key(spark, sf_dir):
    """q39's interval predicate must NOT degrade the join to a nested-loop /
    cartesian product — the user_id=o_custkey equi key carries it (hash or
    sort-merge), with the range as a post-join filter. A BNLJ here is O(n·m)
    at scale."""
    plan = plan_of(QUERY_REGISTRY["q39_range_join"][0](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_correlated_subquery_decorrelated(spark, sf_dir):
    """q40 must run as one aggregate + one equi join — no per-row subquery
    (no nested-loop), bounded exchanges."""
    plan = plan_of(QUERY_REGISTRY["q40_correlated_subquery"][0](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 3


def test_grouping_sets_single_pass(spark, sf_dir):
    """q44's three grouping sets must evaluate in ONE scan via an Expand
    node (rows replicated per set), not three separate aggregations."""
    plan = plan_of(QUERY_REGISTRY["q44_grouping_sets"][0](spark, sf_dir))
    assert "Expand" in plan
    assert "partial_" in plan


def test_ngram_profile_prunes_columns(spark, sf_dir):
    """q45 reads only lang+text; doc_id/source/n_chars must be pruned at the
    parquet scan."""
    plan = plan_of(QUERY_REGISTRY["q45_ngram_profile"][0](spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" in scan_line and "text" in scan_line
    assert "source" not in scan_line and "n_chars" not in scan_line


# Scenario queries run a full streaming pipeline and return a
# localCheckpoint'd result — their "plan" is a bare RDD scan, so auditing it
# proves nothing while costing a complete stream execution each. Their
# Python usage is audited through the operators they are built from (the
# cdc01-06 batch plans below plus the streaming suites).
_SCENARIO_STREAMS = {
    "q29_streaming_window",
    "q107_tws_running_counts",
    "q109_compaction_roundtrip",
    "q113_stream_dedup",
    "q114_ann_partitioned",
    "cdc07_incremental_snapshot",
    "cdc08_foreachbatch_stream",
    "cdc09_fb_snapshot",
    "cdc10_time_travel",
    "cdc11_snapshot_diff",
    "cdc12_ddl_evolution",
    "cdc13_consistent_cut",
    "cdc14_streaming_aggregate",
    "cdc15_change_feed",
    "cdc16_streaming_model_stats",
    "cdc17_dedup_ingest",
    "cdc18_neardup_ingest",
    "q115_incremental_agg",
    # r7: q155 measures gates driver-side and returns a built LOCAL frame
    # (plan = LocalTableScan; the measured operators' plans are audited via
    # their own entries); cdc27 runs the full video-ingest pipeline and
    # returns a localCheckpoint'd result (bare RDD scan) — Python usage is
    # audited through tests/test_video_ingest.py + the multimodal suites.
    "q155_quality_gates",
    "cdc27_video_ingest",
}


@pytest.mark.parametrize(
    "name", sorted(set(QUERY_REGISTRY) - _SCENARIO_STREAMS)
)
def test_no_row_python_udfs(spark, sf_dir, name):
    """No query may use row-at-a-time Python (BatchEvalPython); Python is
    allowed only Arrow-batched (ArrowEvalPython / mapInPandas / FlatMapsInPandas)."""
    plan = plan_of(QUERY_REGISTRY[name][0](spark, sf_dir))
    assert "BatchEvalPython" not in plan


def test_scenario_stream_exclusions_are_checkpointed_results():
    """Every name excluded from the Python-UDF audit must actually exist in
    the registry — a stale entry here would silently drop coverage."""
    assert _SCENARIO_STREAMS <= set(QUERY_REGISTRY)


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    """q49's eval slice is tiny by construction; the contamination join must
    broadcast it — shuffling the train-side gram relation on gram would be
    the 100 TB bottleneck."""
    plan = plan_of(QUERY_REGISTRY["q49_decontamination"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_doc_chunks_no_shuffle(spark, sf_dir):
    """q46 chunking is a pure per-row expansion — zero exchanges; chunks
    inherit the scan's partitioning."""
    plan = plan_of(QUERY_REGISTRY["q46_doc_chunks"][0](spark, sf_dir))
    assert "Exchange" not in plan


def test_sequence_packing_two_level_shape(spark, sf_dir):
    """q51's running cumsum is the two-level decomposition: every window
    over the full token relation must partition on (source, block) — a
    source-alone window there would sort each source in one task (the
    100 TB ceiling). Source-alone windows are permitted ONLY over the tiny
    (source, block) totals table; no global sort anywhere; exchange count
    stays bounded (scan-side agg + offset window + join + final agg)."""
    plan = plan_of(QUERY_REGISTRY["q51_sequence_packing"][0](spark, sf_dir))
    assert "Exchange rangepartitioning" not in plan  # no global sort
    for line in plan.splitlines():
        if "windowspecdefinition(source" in line and "n_tokens" in line:
            assert "_blk" in line.split("windowspecdefinition")[1][:60]
    assert plan.count("Exchange") <= 6


def test_hopping_window_partial_aggregation(spark, sf_dir):
    """q52's x2 window expansion must still combine map-side before the
    (window, type) shuffle."""
    plan = plan_of(QUERY_REGISTRY["q52_window_hopping"][0](spark, sf_dir))
    assert "partial_" in plan


def test_gapfill_grid_broadcasts(spark, sf_dir):
    """q54's dense calendar grid is tiny (hours x types); the gap-fill join
    must broadcast it against the rolled-up fact side — a sort-merge join
    here shuffles the rollup a second time for no reason."""
    plan = plan_of(QUERY_REGISTRY["q54_gapfill"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_joins_broadcast(spark, sf_dir):
    """q55 joins per-doc tf with the df vocabulary and the scalar N — both
    small relative to the exploded term relation; neither may sort-merge."""
    plan = plan_of(QUERY_REGISTRY["q55_tfidf"][0](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan


def test_funnel_two_exchanges(spark, sf_dir):
    """q56 is the no-self-join funnel: exactly one shuffle on user_id plus
    the final stage rollup — a third exchange means a join crept in."""
    plan = plan_of(QUERY_REGISTRY["q56_funnel"][0](spark, sf_dir))
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_pmi_no_forced_vocab_broadcast(spark, sf_dir):
    """q57's unigram sides are VOCABULARY-sized (hundreds of millions of
    rows at 100 TB) — a forced broadcast hint on them is a driver/executor
    OOM at scale. Only the two 1-row totals may carry a hint; the unigram
    joins stay statistics-driven (AQE still broadcasts them at test scale,
    which is fine — the hazard is the unconditional hint, not the runtime
    choice)."""
    df = QUERY_REGISTRY["q57_pmi_collocations"][0](spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    # exactly the two scalar totals are hinted — not ux/uy
    assert logical.count("ResolvedHint") == 2
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_broadcast_if_small_gates_on_catalyst_estimate(spark, sf_dir):
    """The size-gated hint helper: at fixture scale the hint fires (plan
    audits downstream rely on the pinned all-broadcast star shape); with a
    synthetic 1-byte threshold the SAME relation comes back unhinted, so a
    join against it falls back to Catalyst's statistics-driven choice —
    the behavior a 20-billion-row part table needs at 100 TB."""
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.operators.hints import (
        broadcast_if_small,
        plan_size_bytes,
    )
    from kafka_connect_logminer2_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    assert plan_size_bytes(part) > 0
    hinted = broadcast_if_small(part)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    over = broadcast_if_small(part, max_bytes=1)
    assert "ResolvedHint" not in over._jdf.queryExecution().analyzed().toString()
    # and the gated fallback join is still a legal plan (no hint anywhere)
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    j = l.join(over, F.col("l_partkey") == F.col("p_partkey"))
    assert "ResolvedHint" not in j._jdf.queryExecution().analyzed().toString()


def test_tpch_q74_pure_scan_aggregate(spark, sf_dir):
    """q74 (TPC-H Q6) is the canonical scan-filter-agg: all four predicates
    must reach the parquet reader, the sum must combine map-side, and no
    join may appear anywhere."""
    plan = plan_of(QUERY_REGISTRY["q74_forecast_revenue"][0](spark, sf_dir))
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    assert "partial_" in plan
    assert "Join" not in plan


def test_tpch_q73_supplier_dim_broadcast(spark, sf_dir):
    """q73 (Q5): the supplier x nation x region slice is dimension-sized and
    must broadcast into lineitem; only the orderkey fact-fact join may
    shuffle."""
    plan = plan_of(QUERY_REGISTRY["q73_local_supplier_volume"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_tpch_q78_aggregates_before_dimensions(spark, sf_dir):
    """q78 (Q10): revenue is aggregated per-customer BEFORE the customer /
    nation joins (partial_ appears) and the top-20 is a TakeOrderedAndProject,
    not a global sort of the joined relation."""
    plan = plan_of(QUERY_REGISTRY["q78_returned_items"][0](spark, sf_dir))
    assert "partial_" in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q82_or_predicate_broadcast(spark, sf_dir):
    """q82 (Q19): the OR-of-conjunctions join condition must not force a
    sort-merge — part stays broadcast with the disjunction evaluated in the
    hash join's residual filter."""
    plan = plan_of(QUERY_REGISTRY["q82_discount_revenue"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q81_decorrelated_broadcasts(spark, sf_dir):
    """q81 (Q17): both the brand part-list and the per-part qty-limit
    aggregate are bounded by the filtered part count — each joins broadcast;
    lineitem is never shuffled."""
    plan = plan_of(QUERY_REGISTRY["q81_small_qty_revenue"][0](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_tpch_q86_dims_broadcast_ties_window(spark, sf_dir):
    """q86 (Q2): every dimension side broadcasts; the only exchanges are the
    bridge DISTINCT and the per-part window."""
    plan = plan_of(QUERY_REGISTRY["q86_min_acct_supplier"][0](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bucketed_join_zero_join_exchanges(spark, sf_dir):
    """q87: both facts are stored bucketed on orderkey, so the sort-merge
    join itself needs no exchange — the only shuffle in the whole plan is
    the final 5-row priority rollup."""
    plan = plan_of(QUERY_REGISTRY["q87_bucketed_join"][0](spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SelectedBucketsCount" in plan


def test_temperature_sampling_corpus_never_shuffled(spark, sf_dir):
    """q93: per-source rates broadcast back onto the corpus scan; the only
    wide exchanges are the tiny per-source aggregates. The corpus text
    column never leaves the scan (doc_id/source/n_chars only)."""
    plan = plan_of(QUERY_REGISTRY["q93_temperature_sampling"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("text" not in l for l in scan_lines)


def test_quantile_cut_threshold_broadcast(spark, sf_dir):
    """q94: the per-lang median joins broadcast and the corpus is filtered
    at scan+join time. The median is a counting median: no percentile()
    buffering aggregate anywhere, and the only Window runs over the
    partial-aggregated (lang, q) grid — its exchange carries the grid
    counts, never the corpus rows (partial_count before the exchange)."""
    plan = plan_of(QUERY_REGISTRY["q94_quantile_cut"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "percentile" not in plan
    # the window's input is the aggregated grid: a partial count runs
    # below the exchange feeding it
    assert "partial_count" in plan or "partial" in plan.lower()


def test_pipeline_dedup_single_wide_exchange_of_hash(spark, sf_dir):
    """q95: the only corpus-sized exchange carries (h, source, doc_id,
    n_chars) after partial aggregation — the text column is consumed
    scan-side by the md5/quality expressions and never shuffles."""
    plan = plan_of(QUERY_REGISTRY["q95_pipeline_dedup"][0](spark, sf_dir))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 2  # hash fold + tiny source rollup
    assert all("text" not in l for l in ex)


def test_rolling_actives_no_window_sort(spark, sf_dir):
    """q97: rolling COUNT DISTINCT via contribution expansion — a hash-agg
    pipeline with broadcast day-level joins, NO window operator (the naive
    sliding-window formulation would sort every partition)."""
    plan = plan_of(QUERY_REGISTRY["q97_rolling_actives"][0](spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_no_corpus_join(spark, sf_dir):
    """q98: doc length rides through the explode, df/stats broadcast — the
    posting-list agg is the only corpus-sized exchange; no sort-merge join
    anywhere."""
    plan = plan_of(QUERY_REGISTRY["q98_bm25"][0](spark, sf_dir))
    assert "SortMergeJoin" not in plan


def test_retention_single_fact_exchange(spark, sf_dir):
    """q96: the events fact is exchanged exactly once (on user_id, carrying
    the collect_set partial aggregate); the final (cohort, offset) rollup is
    a second tiny exchange. No join, no window."""
    plan = plan_of(QUERY_REGISTRY["q96_retention_cohorts"][0](spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_token_entropy_two_hash_aggs(spark, sf_dir):
    """q102: explode → (source, term) agg → per-source agg; both exchanges
    carry counts, never text; partial aggregation runs before each."""
    plan = plan_of(QUERY_REGISTRY["q102_token_entropy"][0](spark, sf_dir))
    assert "Join" not in plan
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 2
    assert all("text" not in l for l in ex)
    assert "partial" in plan.lower()


def test_lateral_decorrelates_to_group_limit(spark, sf_dir):
    """q103: the LATERAL per-customer subquery must NOT execute per row —
    Catalyst decorrelates it into a ranked window with WindowGroupLimit,
    including a PARTIAL pass before the exchange (map-side top-k pruning:
    the shuffle carries ≤k rows per customer per input partition)."""
    plan = plan_of(QUERY_REGISTRY["q103_lateral_topn"][0](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# TPC-H family shapes (r2): pin broadcast/shuffle structure for the queries
# that lacked audits. Counts are at the audit SF (sf0.001, AQE on) — the
# invariants are the semantic ones: dims broadcast, only genuine fact-fact
# joins may sort-merge, filters reach the scan, nothing falls back to
# cartesian products or row-Python.
# ---------------------------------------------------------------------------

def _audit(spark, sf_dir, name, max_smj, min_bhj=1, require_pushed=True):
    plan = plan_of(QUERY_REGISTRY[name][0](spark, sf_dir))
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
    assert plan.count("SortMergeJoin") <= max_smj, (
        f"{name}: {plan.count('SortMergeJoin')} sort-merge joins (cap {max_smj}) — "
        "a dimension join stopped broadcasting"
    )
    assert plan.count("BroadcastHashJoin") >= min_bhj, name
    if require_pushed:
        assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, name
    return plan


def test_tpch_q75_single_fact_fact_smj(spark, sf_dir):
    """Q7 bilateral trade: nation-filtered supplier/customer sides broadcast;
    ONLY the lineitem-orders orderkey join may shuffle both sides."""
    _audit(spark, sf_dir, "q75_volume_shipping", max_smj=1, min_bhj=3)


def test_tpch_q76_market_share_dims_broadcast(spark, sf_dir):
    """Q8: part/supplier/nation/region dims broadcast into lineitem; the
    only permissible sort-merge is the vol-orders orderkey join."""
    _audit(spark, sf_dir, "q76_market_share", max_smj=1, min_bhj=4)


def test_tpch_q77_profit_dims_broadcast(spark, sf_dir):
    """Q9: the red-part and supplier-nation dims broadcast; lineitem joins
    orders on orderkey (fact-fact, allowed to shuffle)."""
    _audit(spark, sf_dir, "q77_product_profit", max_smj=1, min_bhj=2)


def test_tpch_q79_promo_all_broadcast_single_agg(spark, sf_dir):
    """Q14: single broadcast join + one global aggregate — no fact shuffle
    beyond the final 1-group agg; the month filter pushes to the scan."""
    plan = _audit(spark, sf_dir, "q79_promo_effect", max_smj=0)
    assert "partial_" in plan  # map-side combine of the conditional sums


def test_tpch_q80_top_supplier_no_smj(spark, sf_dir):
    """Q15: per-supplier revenue aggregated once; the scalar max comes back
    as a broadcast, never a sort-merge or cartesian."""
    _audit(spark, sf_dir, "q80_top_supplier", max_smj=0, min_bhj=1)


def test_tpch_q83_not_in_becomes_broadcast_anti(spark, sf_dir):
    """Q16: NOT IN negative-balance suppliers must execute as a broadcast
    left-anti (a shuffled anti or BNLJ over lineitem dies at scale)."""
    plan = _audit(spark, sf_dir, "q83_parts_supplier_count", max_smj=0, min_bhj=2)
    assert "LeftAnti, BuildRight" in plan or "LeftAnti BuildRight" in plan.replace(",", "")


def test_tpch_q84_rollup_reuses_reduced_relation(spark, sf_dir):
    """Q20: the part-level total is a WINDOW over the per-(part,supplier)
    aggregate riding the same l_partkey exchange — lineitem is scanned
    exactly once (the naive two-aggregate formulation physically duplicated
    the whole scan+join+agg chain; this pin keeps it fixed)."""
    plan = _audit(spark, sf_dir, "q84_potential_promo", max_smj=1, min_bhj=1)
    assert sum(1 for line in plan.splitlines() if "lineitem.parquet" in line) == 1


def test_tpch_q85_exists_as_semi_anti_no_bnlj(spark, sf_dir):
    """Q21: EXISTS/NOT EXISTS with the non-equi suppkey condition must ride
    the orderkey equi-key (semi + anti hash joins), never a nested loop."""
    plan = _audit(spark, sf_dir, "q85_waiting_suppliers", max_smj=0, min_bhj=2)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_tpch_q90_top10_fuses_take_ordered(spark, sf_dir):
    """Q3: top-10 must fuse into TakeOrderedAndProject (per-partition top-k
    + driver merge), not a global sort of the aggregate."""
    plan = _audit(spark, sf_dir, "q90_shipping_priority", max_smj=0, min_bhj=1)
    assert "TakeOrderedAndProject" in plan
    assert "Sort [revenue" not in plan  # no full sort before the limit


def test_tpch_q91_threshold_scalar_broadcast(spark, sf_dir):
    """Q11: the 0.1%-of-total threshold is a 1-row broadcast against the
    per-part rollup (BroadcastNestedLoopJoin on a single row is the right
    plan); the rollup itself must not be recomputed via a second lineitem
    scan chain with a sort-merge."""
    plan = _audit(spark, sf_dir, "q91_important_stock", max_smj=0, min_bhj=2)
    assert "BroadcastNestedLoopJoin" in plan


def test_tpch_q99_shipmode_fact_join_pushed_dates(spark, sf_dir):
    """Q12: the date window pushes to the lineitem scan; the orderkey join
    is the only shuffle-bearing join; conditional sums partial-aggregate."""
    plan = _audit(spark, sf_dir, "q99_shipmode_priority", max_smj=1)
    assert "partial_" in plan


def test_pii_scrub_is_pure_map_stage(spark, sf_dir):
    """q106: counting + redaction must stay a zero-exchange map stage —
    a shuffle here would mean the scrub accidentally grew an aggregation."""
    plan = plan_of(QUERY_REGISTRY["q106_pii_scrub"][0](spark, sf_dir))
    assert plan.count("Exchange") == 0
    assert "BatchEvalPython" not in plan


def test_int8_quantization_is_pure_map_stage(spark, sf_dir):
    """q108: per-vector quantization is embarrassingly parallel — zero
    exchanges, zero Python."""
    plan = plan_of(QUERY_REGISTRY["q108_int8_quantization"][0](spark, sf_dir))
    assert plan.count("Exchange") == 0
    assert "BatchEvalPython" not in plan


def test_jaccard_capped_bounded_exchanges(spark, sf_dir):
    """q104: the capped production form keeps the q19 shuffle shape (shingle
    relation + pair aggregation + size joins) — exchange growth would mean
    the cap filter stopped riding the posting-list aggregation."""
    plan = plan_of(QUERY_REGISTRY["q104_jaccard_capped"][0](spark, sf_dir))
    assert plan.count("Exchange") <= 4
    assert "BatchEvalPython" not in plan


def test_substring_dedup_shuffles_hashes_only(spark, sf_dir):
    """q110: the span relation that shuffles is (doc_id, span_hash) — the
    span text is consumed by xxhash64 scan-side and never crosses an
    exchange; two wide exchanges total (per-span window + per-doc rollup)."""
    plan = plan_of(QUERY_REGISTRY["q110_substring_dedup"][0](spark, sf_dir))
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 2
    assert all("span" not in l and "text" not in l for l in ex)
    assert "BatchEvalPython" not in plan


def test_shard_export_single_corpus_exchange(spark, sf_dir):
    """q111: the corpus-wide window must hash on (shard, h2) — NEVER on
    shard alone, which would cap the sort at n_shards tasks — and
    hash-derived ordering must not add a global sort."""
    plan = plan_of(QUERY_REGISTRY["q111_shard_export"][0](spark, sf_dir))
    assert "Exchange rangepartitioning" not in plan  # no global sort
    # every corpus-row window partitions on BOTH shard and h2; the only
    # shard-alone window is over the tiny (shard, h2) count table
    for line in plan.splitlines():
        if "windowspecdefinition(shard" in line and "pos" in line:
            assert "h2" in line.split("windowspecdefinition")[1][:40]
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("text" not in l for l in scan_lines)  # column pruning


def test_shard_export_sort_width_exceeds_shard_count(spark, sf_dir):
    """THE r2 scale ceiling, pinned closed: with n_shards=8 the rank/sort
    stage must still run at full shuffle width. Count the non-empty tasks
    actually holding ranked rows — > n_shards proves the per-shard window
    ceiling is gone (a per-shard row_number would collapse to ≤ 8)."""
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.plans.queries import shard_ranked

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ranked = shard_ranked(docs, n_shards=8)
    # the width available to the sort = distinct (shard, h2) hash groups —
    # this is what a 1000-executor cluster can spread; n_shards never caps it
    groups = ranked.select("shard", "h2").distinct().count()
    assert groups > 8
    # and the stage really does run wider than n_shards once AQE's
    # small-data coalescing (correct at test scale, absent at 100 TB task
    # sizes) is held off
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        # keep pos referenced all the way to collect() — .count() (or a
        # pos-free projection) lets Catalyst prune the window AND its
        # exchange, and the pid would measure the 1-file scan stage instead
        rows = (
            shard_ranked(docs, n_shards=8)
            .select("pos", F.spark_partition_id().alias("p"))
            .groupBy("p")
            .agg(F.sum("pos"))
            .collect()
        )
        assert len(rows) > 8
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_packing_cumsum_width_exceeds_source_count(spark, sf_dir):
    """q51/q117/q119's packing ceiling, pinned closed: the running token
    cumsum must partition on (source, block), never source alone — a
    per-source window would pack a 100 TB corpus on n_sources cores. Width
    check mirrors test_shard_export_sort_width_exceeds_shard_count: count
    non-empty tasks actually holding cumsum rows with AQE coalescing held
    off; > n_sources proves the single-task-per-source ceiling is gone."""
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.functions.sharding import two_level_cumsum

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", "source", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    n_sources = toks.select("source").distinct().count()
    cum = two_level_cumsum(toks, "source", "doc_id", "n_tokens", block_size=256)
    # the window partitions on (source, block): its group count is the
    # available sort width — must beat the per-source ceiling
    groups = (
        toks.select("source", F.floor(F.col("doc_id") / F.lit(256)).alias("b"))
        .distinct()
        .count()
    )
    assert groups > n_sources
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        # keep cum_excl referenced through collect() — a cumsum-free
        # projection lets Catalyst prune the window and its exchange
        rows = (
            two_level_cumsum(toks, "source", "doc_id", "n_tokens", block_size=256)
            .select("cum_excl", F.spark_partition_id().alias("p"))
            .groupBy("p")
            .agg(F.sum("cum_excl"))
            .collect()
        )
        assert len(rows) > n_sources
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_semantic_dedup_arrow_only_python(spark, sf_dir):
    """q112: assignment + per-cluster tiles run as Arrow-batched Python
    (pandas UDF / applyInPandas) — never row-at-a-time BatchEvalPython."""
    plan = plan_of(QUERY_REGISTRY["q112_semantic_dedup"][0](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan or "FlatMapGroupsInPandas" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Catalyst's runtime row-level bloom filter: a selective filter on one
    join side injects a bloom_filter_agg subquery whose might_contain()
    predicate prunes the OTHER side's scan before the shuffle — at 100 TB
    this is the difference between shuffling all of lineitem and shuffling
    the ~1% that can possibly match. The audit pins that the engine config
    leaves the rewrite reachable (a silent conf regression would only show
    up as a 100× shuffle at scale)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_unigram_logprob_shuffles_hashes_only(spark, sf_dir):
    """q116: token text is hashed scan-side; the vocabulary count, the
    rescore join, and the per-doc rollup all exchange 8-byte hashes — the
    token string never crosses an exchange, and nothing vocab-sized is
    collected (no broadcast of the counts side)."""
    plan = plan_of(QUERY_REGISTRY["q116_unigram_logprob"][0](spark, sf_dir))
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert all("tok" not in l and "text" not in l for l in ex)
    assert "BatchEvalPython" not in plan


def test_pack_assemble_two_level_no_global_sort(spark, sf_dir):
    """q117: the running-token cumsum is the two-level decomposition — the
    data-relation window partitions on (source, block), never source alone
    (that single-task-per-source sort was the 100 TB packing ceiling);
    source-alone windows only over the tiny block-totals table. Per-bin
    ordering still happens via array_sort inside the hash aggregate, never
    a rangepartitioning global sort; exchanges stay bounded."""
    plan = plan_of(QUERY_REGISTRY["q117_pack_assemble"][0](spark, sf_dir))
    for line in plan.splitlines():
        if "windowspecdefinition(source" in line and "n_tokens" in line:
            assert "_blk" in line.split("windowspecdefinition")[1][:60]
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) <= 6
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_vocab_coverage_takeordered_and_broadcast(spark, sf_dir):
    """q121: the top-1000 vocab must be a TakeOrdered over the token
    aggregate (nothing vocabulary-sized on the driver, no global sort) and
    must come back as a broadcast — the corpus-side pass joins it without
    shuffling wide rows."""
    plan = plan_of(QUERY_REGISTRY["q121_vocab_coverage"][0](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "BatchEvalPython" not in plan


def test_wide_shard_export_shuffle_join_rides_window_partitioning(spark, sf_dir):
    """q122 (n_shards=256): the offsets table's worst case is
    256·65536 ≈ 16.7M rows — past the broadcast bound, so the join must go
    shuffle-side, and its (shard, h2) hash partitioning must be the SAME
    one the rank window needs: the corpus still crosses the wire exactly
    once for join+window combined."""
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.plans.queries import shard_ranked

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def offsets_join_hint(n):
        lp = (
            shard_ranked(docs, n_shards=n)
            .select(F.sum("pos"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return any("strategy=broadcast" in l for l in lp.splitlines() if "Join" in l)

    # wide: NO planning-time broadcast hint — the 16.7M-row worst case must
    # be left to statistics (at test scale Catalyst/AQE still broadcast the
    # actually-tiny side, which is them working as designed; the hint is
    # what would force it at real sizes). Narrow keeps the explicit hint.
    assert not offsets_join_hint(256)
    assert offsets_join_hint(8)
    # either way the join keys are (shard, h2) — identical to the rank
    # window's partitioning, so join+window cost ONE corpus exchange
    plan = plan_of(shard_ranked(docs, n_shards=256).select(F.sum("pos")))
    assert "windowspecdefinition(shard" in plan and "h2" in plan


def test_gopher_rules_scan_speed_no_exchange(spark, sf_dir):
    """q129 is a pure projection battery: every rule must stay a JVM-side
    expression in one codegen'd pass over the scan — zero exchanges, zero
    Python, zero joins. Any Exchange here means a rule grew an aggregation
    it doesn't need."""
    plan = plan_of(QUERY_REGISTRY["q129_gopher_rules"][0](spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "*(" in plan  # the whole pass is codegen'd (the *(N) stage marker)


def test_dsir_count_tables_broadcast(spark, sf_dir):
    """q130's bucket-count tables are ≤ B rows by construction — the
    per-gram weight lookups must be broadcast joins, never a sort-merge
    of the exploded gram stream (which is the corpus × grams-per-doc and
    must not shuffle for a lookup)."""
    plan = plan_of(QUERY_REGISTRY["q130_dsir_importance"][0](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_bigram_logprob_no_cartesian_no_python(spark, sf_dir):
    """q131's count-table joins are equi-joins on token keys (vocab-sized
    sides — SMJ is legitimate there); what must never appear is a
    cartesian fallback or row-Python in the scoring path."""
    plan = plan_of(QUERY_REGISTRY["q131_bigram_logprob"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # exactly one conditionless BNLJ is allowed: the broadcast scalar
    # corpus-total join — never a fallback on the token-key lookups
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BatchEvalPython" not in plan


def test_phrase_search_single_posting_exchange(spark, sf_dir):
    """q134's matcher: the only hash exchange is the groupBy(doc_id) over
    phrase-term postings (plus the final sort's range exchange); and the
    conjunctive contains() prefilter must sit in the scan stage's data
    filters, BEFORE the generate multiplies rows."""
    from kafka_connect_logminer2_spark.functions.search import phrase_match_counts
    from kafka_connect_logminer2_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = plan_of(phrase_match_counts(docs, ["batch", "merge"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Contains" in plan
    # prefilter evaluates pre-explode: Filter with Contains appears below
    # Generate in the tree (Generate listed before its child's Filter)
    assert "Generate" in plan


def test_heavy_hitters_recount_broadcasts_candidates(spark, sf_dir):
    """q135 phase 2: the candidate set joins broadcast (left_semi BHJ) —
    a shuffled semi-join would defeat the sketch's purpose — and the
    sketch phase is Arrow mapInPandas, not a row Python UDF."""
    plan = plan_of(QUERY_REGISTRY["q135_heavy_hitters"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_graph_degree_partial_aggs_no_udf(spark, sf_dir):
    """q137: both direction rollups partial-aggregate before their
    exchange; pure JVM (no Python)."""
    plan = plan_of(QUERY_REGISTRY["q137_graph_degree"][0](spark, sf_dir))
    assert "partial_" in plan
    assert "Python" not in plan


def test_zorder_key_jvm_only_single_agg_exchange(spark, sf_dir):
    """q139: the Morton key is pure JVM bitwise arithmetic — no UDF of
    any kind — and the block rollup is one partial-agg'd hash exchange
    (plus the orderBy range exchange)."""
    plan = plan_of(QUERY_REGISTRY["q139_zorder_key"][0](spark, sf_dir))
    assert "Python" not in plan
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_join_mv_step_broadcasts_touched_keys(spark, sf_dir):
    """cdc20's fold: the touched-key sets drive broadcast joins against
    the MV/base relations — the per-batch cost contract is O(changed
    keys), and a sort-merge join against the base would re-sort the whole
    MV every batch."""
    from kafka_connect_logminer2_spark.streaming.join_mv import join_mv_step

    l0 = spark.createDataFrame([(1, 10, 5.0)], "o long, ck long, price double")
    r0 = spark.createDataFrame([(10, "a")], "c long, name string")
    base = join_mv_step(None, l0, r0, None, None, ["o"], "ck", "c").localCheckpoint()
    tl = spark.createDataFrame([(1,)], "o long")
    out = join_mv_step(base, l0, r0, tl, None, ["o"], "ck", "c")
    plan = plan_of(out)
    # the touched-key prunes (anti on the base, semi on the left snapshot)
    # must be broadcast builds; the refresh ⋈ dim join's strategy is
    # rightly data-dependent (a big dim SHOULD sort-merge) so it is not
    # constrained here
    assert "BroadcastHashJoin [o#" in plan or "BroadcastHashJoin [o`" in plan
    assert "LeftAnti, BuildRight" in plan
    assert "LeftSemi, BuildRight" in plan
