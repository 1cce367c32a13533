"""CDC assembly under TRANSACTION skew (operators/transactions.py): one
giant xid carrying ~10% of the log. AQE's skew-join split never fires on
this runtime (documented, BASELINE.md), so the per-xid window makes that
xid a 10%-of-data straggler task. annotate_transactions_salted is the
explicit route: per-xid facts as a partial-combined hash aggregate +
salted join back — value-identical output, hot rows spread over the salt
fan-out. These tests pin (a) equality with the window path on realistic
mixed logs and (b) the task-distribution bound that IS the skew claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.operators.transactions import (
    annotate_transactions,
    annotate_transactions_salted,
    assemble_transactions,
)
from kafka_connect_logminer2_spark.sources.redo import (
    redo_events_from_rows,
    redo_inserts_from_customer,
)

INS = 'insert into "TPCH"."CUSTOMER"("C_CUSTKEY") values ({k})'


def _skewed_redo(spark, n_events=120_000, hot_frac=0.10, n_cold_txns=4000):
    """Synthetic redo log: one 'HOT' xid holds ``hot_frac`` of all DML;
    the rest spreads evenly over ``n_cold_txns`` committed transactions."""
    n_hot = int(n_events * hot_frac)
    n_cold = n_events - n_hot
    base = (
        "cast(null as long) as commit_scn",
        "timestamp_ntz'2026-01-01' as timestamp",
        "cast(null as timestamp_ntz) as commit_timestamp",
        "'TPCH' as seg_owner",
        "'CUSTOMER' as table_name",
        "'U' as username",
        "concat('insert into \"TPCH\".\"CUSTOMER\"(\"C_CUSTKEY\") values (', id, ')') as sql_redo",
        "concat('r', id) as row_id",
        "false as csf",
        "'0' as rollback",
        "0 as rbasqn",
        "concat('rs', id) as rs_id",
        "cast(null as string) as info",
    )
    hot = spark.range(n_hot).selectExpr(
        "id + 1 as scn", "'HOT' as xid", "'INSERT' as operation", *base
    )
    cold = spark.range(n_cold).selectExpr(
        f"id + {n_hot + 10} as scn",
        f"concat('C', id % {n_cold_txns}) as xid",
        "'INSERT' as operation",
        *base,
    )
    commit_base = (
        "timestamp_ntz'2026-01-01' as timestamp",
        "timestamp_ntz'2026-01-01' as commit_timestamp",
        "cast(null as string) as seg_owner",
        "cast(null as string) as table_name",
        "'U' as username",
        "cast(null as string) as sql_redo",
        "cast(null as string) as row_id",
        "false as csf",
        "'0' as rollback",
        "0 as rbasqn",
        "cast(null as string) as rs_id",
        "cast(null as string) as info",
    )
    commits = spark.range(n_cold_txns).selectExpr(
        f"id + {n_events + 100} as scn",
        f"id + {n_events + 100} as commit_scn",
        f"concat('C', id) as xid",
        "'COMMIT' as operation",
        *commit_base,
    ).unionByName(
        spark.range(1).selectExpr(
            f"{2 * n_events + 1000} as scn",
            f"{2 * n_events + 1000} as commit_scn",
            "'HOT' as xid",
            "'COMMIT' as operation",
            *commit_base,
        )
    )
    cols = [
        "scn", "commit_scn", "xid", "timestamp", "commit_timestamp",
        "operation", "seg_owner", "table_name", "username", "sql_redo",
        "row_id", "csf", "rollback", "rbasqn", "rs_id", "info",
    ]
    return hot.select(cols).unionByName(cold.select(cols)).unionByName(
        commits.select(cols)
    )


def _assembled_rows(df):
    return sorted(
        (r["scn"], r["xid"], r["commit_scn"], r["operation"], r["row_id"])
        for r in df.select("scn", "xid", "commit_scn", "operation", "row_id").collect()
    )


def test_salted_assembly_equals_window_on_fixture(spark, sf_dir):
    """Value identity on the realistic fixture log (commits, multiple
    tables, per-txn metadata): every committed DML row bit-equal."""
    redo = redo_inserts_from_customer(spark, sf_dir)
    a = _assembled_rows(assemble_transactions(redo))
    b = _assembled_rows(assemble_transactions(redo, skew_salts=16))
    assert a == b and len(a) > 0


def test_salted_assembly_equals_window_on_rollbacks(spark):
    """Partial-rollback pairs and full rollbacks survive the salted route
    identically — the repair/discard logic consumes the same facts."""
    rows = [
        dict(scn=1, operation="START", xid="A"),
        dict(scn=2, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=1), row_id="r1"),
        dict(scn=3, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=2), row_id="r2"),
        dict(scn=4, operation="INSERT", xid="A", table_name="CUSTOMER",
             sql_redo=INS.format(k=2), row_id="r2", rollback="1"),
        dict(scn=5, operation="COMMIT", xid="A", commit_scn=5),
        dict(scn=6, operation="START", xid="B"),
        dict(scn=7, operation="INSERT", xid="B", table_name="CUSTOMER",
             sql_redo=INS.format(k=3), row_id="r3"),
        dict(scn=8, operation="ROLLBACK", xid="B"),
    ]
    redo = redo_events_from_rows(spark, rows)
    a = _assembled_rows(assemble_transactions(redo))
    b = _assembled_rows(assemble_transactions(redo, skew_salts=8))
    assert a == b
    assert [r[4] for r in a] == ["r1"]  # pair repaired, B discarded


def test_auto_route_engages_on_hot_xid_and_matches_window(spark):
    """skew_salts='auto' must flip to the salted route on the 10%-hot log
    WITHOUT any manual flag, stay on the cheaper window plan for a
    balanced log, and produce output value-identical to the explicit
    window path either way. The route decision is audited via
    resolve_skew_salts (the assembler's materialization barrier truncates
    its plan, so the chosen shape isn't visible there); explicit ints and
    invalid strings are pinned too."""
    import pytest

    from kafka_connect_logminer2_spark.operators.transactions import (
        detect_xid_skew,
        resolve_skew_salts,
    )

    hot = _skewed_redo(spark, n_events=20_000, hot_frac=0.10).localCheckpoint()
    balanced = _skewed_redo(spark, n_events=20_000, hot_frac=0.0).localCheckpoint()

    # the detector itself: full-scan share on the hot log ≈ 0.10 (commit
    # rows dilute it slightly); sampled share must land the same side of
    # the 5% threshold
    assert detect_xid_skew(hot, sample_fraction=1.0) > 0.08
    assert detect_xid_skew(hot, sample_fraction=0.2) > 0.05
    assert detect_xid_skew(balanced, sample_fraction=1.0) < 0.05

    assert resolve_skew_salts(hot, "auto", auto_sample_fraction=0.2) == 16
    assert resolve_skew_salts(balanced, "auto", auto_sample_fraction=0.2) is None
    assert resolve_skew_salts(hot, 8) == 8 and resolve_skew_salts(hot, None) is None
    with pytest.raises(ValueError, match="auto"):
        resolve_skew_salts(hot, "always")

    auto_hot = assemble_transactions(hot, skew_salts="auto",
                                     auto_sample_fraction=0.2)
    auto_bal = assemble_transactions(balanced, skew_salts="auto",
                                     auto_sample_fraction=0.2)
    assert _assembled_rows(auto_hot) == _assembled_rows(assemble_transactions(hot))
    assert _assembled_rows(auto_bal) == _assembled_rows(
        assemble_transactions(balanced)
    )


def test_salted_route_bounds_hot_xid_task_share(spark):
    """THE skew claim, measured: with 10% of events in one xid, the window
    path concentrates ≥ that share in a single task, while the salted
    route's largest task stays near the balanced share. Row counts per
    task are the portable proxy for task time (same per-row work)."""
    redo = _skewed_redo(spark, n_events=60_000, hot_frac=0.10).localCheckpoint()

    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # at test scale AQE broadcasts the tiny facts side (no xid shuffle at
    # all — even better); at 100 TB facts are txn-count-sized and must
    # shuffle-join, which is the regime the salt exists for — force it
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        def shares(ann):
            rows = (
                ann.select("xid", "_commit_scn")
                .withColumn("p", F.spark_partition_id())
                .groupBy("p")
                # keep the annotation column referenced so the window/join
                # stage under measurement cannot be pruned away
                .agg(F.count(F.lit(1)).alias("n"), F.sum("_commit_scn"))
                .collect()
            )
            total = sum(r["n"] for r in rows)
            return max(r["n"] for r in rows) / total

        window_share = shares(annotate_transactions(redo))
        salted_share = shares(annotate_transactions_salted(redo, num_salts=16))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    assert window_share >= 0.095  # the hot xid IS one straggler task
    # salted: hot rows split 16 ways on top of the balanced hash spread —
    # largest task ≤ half the hot share (in practice ≈ 1/32 + hot/16)
    assert salted_share <= 0.05, (window_share, salted_share)


def test_config_threads_skew_route_through_cdc_envelope(spark, monkeypatch):
    """The measured auto-route win must be reachable from CONFIG alone
    (r5 verdict #4): cdc.skew.salts parses from the connect map, defaults
    to 'auto', and cdc_envelope hands exactly the configured route to
    assemble_transactions (spied — the materialization barrier hides the
    route in the plan); envelope output is value-identical across routes
    on the hot fixture."""
    import pytest

    from kafka_connect_logminer2_spark.config import EngineConfig
    from kafka_connect_logminer2_spark.plans import cdc as cdc_plans

    # connect-map key → typed knob → assembler argument
    cfg = EngineConfig.from_connect_map(
        {"cdc.skew.salts": "8", "table.whitelist": "TPCH.*"}
    )
    assert cfg.skew_salts_arg() == 8
    assert EngineConfig().skew_salts_arg() == "auto"  # the default route
    assert EngineConfig(cdc_skew_salts="off").skew_salts_arg() is None
    with pytest.raises(ValueError, match="cdc.skew.salts"):
        EngineConfig(cdc_skew_salts="always").skew_salts_arg()

    seen = []
    real = cdc_plans.assemble_transactions

    def spy(redo, skew_salts=None, **kw):
        seen.append(skew_salts)
        return real(redo, skew_salts=skew_salts, **kw)

    monkeypatch.setattr(cdc_plans, "assemble_transactions", spy)

    hot = _skewed_redo(spark, n_events=20_000, hot_frac=0.10).localCheckpoint()
    auto_out = cdc_plans.cdc_envelope(hot, EngineConfig(table_whitelist="TPCH.*"))
    off_out = cdc_plans.cdc_envelope(
        hot, EngineConfig(table_whitelist="TPCH.*", cdc_skew_salts="off")
    )
    assert seen == ["auto", None]
    key = lambda df: sorted(
        (r["SCN"], r["ROW_ID"]) for r in df.select("SCN", "ROW_ID").collect()
    )
    a, b = key(auto_out), key(off_out)
    assert a == b and len(a) > 0


def test_auto_route_detection_memoized_per_input(spark, monkeypatch):
    """The auto route pays detect_xid_skew ONCE per distinct input plan
    (r6 verdict #2/#4): repeated resolve_skew_salts over the same frame —
    bench reruns, multi-table fan-out over one redo frame — hit the
    application-scoped route cache; a different input still detects."""
    from kafka_connect_logminer2_spark.operators import transactions as tx

    calls = []
    real = tx.detect_xid_skew

    def spy(redo, sample_fraction=0.02, seed=7):
        calls.append(1)
        return real(redo, sample_fraction=sample_fraction, seed=seed)

    monkeypatch.setattr(tx, "detect_xid_skew", spy)

    hot = _skewed_redo(spark, n_events=5_000, hot_frac=0.10).localCheckpoint()
    balanced = _skewed_redo(spark, n_events=5_000, hot_frac=0.0).localCheckpoint()

    r1 = tx.resolve_skew_salts(hot, "auto")
    r2 = tx.resolve_skew_salts(hot, "auto")
    assert len(calls) == 1  # second call is a cache hit
    assert r1 == r2 == 16  # hot input routes salted, stably

    r3 = tx.resolve_skew_salts(balanced, "auto")
    assert len(calls) == 2  # distinct input -> fresh detection
    assert r3 is None
    # a different policy is a different cache key, not a stale hit
    r4 = tx.resolve_skew_salts(hot, "auto", auto_threshold=0.9)
    assert len(calls) == 3 and r4 is None


def test_auto_route_persisted_across_sessions(spark, monkeypatch, tmp_path):
    """With $SPARK_GRAFT_ROUTE_CACHE set, the auto decision lands in a
    per-key route_<sha1>.json file and a COLD session (simulated by
    clearing the in-process cache) reuses it without a detection job
    (r7 verdict #3). Unset, no file appears and behavior is unchanged."""
    import json
    import os

    from kafka_connect_logminer2_spark.operators import transactions as tx

    calls = []
    real = tx.detect_xid_skew

    def spy(redo, sample_fraction=0.02, seed=7):
        calls.append(1)
        return real(redo, sample_fraction=sample_fraction, seed=seed)

    monkeypatch.setattr(tx, "detect_xid_skew", spy)
    monkeypatch.setenv(tx._ROUTE_CACHE_ENV, str(tmp_path / "routes"))
    hot = _skewed_redo(spark, n_events=5_000, hot_frac=0.10).localCheckpoint()

    assert tx.resolve_skew_salts(hot, "auto") == 16
    assert len(calls) == 1
    files = sorted((tmp_path / "routes").glob("route_*.json"))
    assert len(files) == 1
    assert json.load(open(files[0]))["salts"] == 16

    tx._ROUTE_CACHE.clear()  # "new session"
    assert tx.resolve_skew_salts(hot, "auto") == 16
    assert len(calls) == 1  # served from the persisted cache

    # disabled -> in-process only, no file writes
    monkeypatch.delenv(tx._ROUTE_CACHE_ENV)
    tx._ROUTE_CACHE.clear()
    os.remove(files[0])
    assert tx.resolve_skew_salts(hot, "auto") == 16
    assert len(calls) == 2 and not files[0].exists()


def test_route_cache_self_heals_corruption(spark, monkeypatch, tmp_path):
    """A corrupted cache file is a MISS, never an error, and the next
    detection's write replaces it (r8 advisor: the old shared routes.json
    was permanently poisoned by one bad write). Per-key files also mean a
    second key's write cannot drop the first key's entry (no lost update)."""
    import json

    from kafka_connect_logminer2_spark.operators import transactions as tx

    calls = []
    real = tx.detect_xid_skew

    def spy(redo, sample_fraction=0.02, seed=7):
        calls.append(1)
        return real(redo, sample_fraction=sample_fraction, seed=seed)

    monkeypatch.setattr(tx, "detect_xid_skew", spy)
    monkeypatch.setenv(tx._ROUTE_CACHE_ENV, str(tmp_path / "routes"))
    hot = _skewed_redo(spark, n_events=5_000, hot_frac=0.10).localCheckpoint()

    assert tx.resolve_skew_salts(hot, "auto") == 16 and len(calls) == 1
    (path,) = sorted((tmp_path / "routes").glob("route_*.json"))
    path.write_text("{ truncated garbage")  # simulate a torn/corrupt write

    tx._ROUTE_CACHE.clear()
    assert tx.resolve_skew_salts(hot, "auto") == 16  # miss -> re-detect
    assert len(calls) == 2
    assert json.load(open(path))["salts"] == 16  # self-healed on write

    tx._ROUTE_CACHE.clear()
    assert tx.resolve_skew_salts(hot, "auto") == 16
    assert len(calls) == 2  # healed file serves the hit again

    # a DIFFERENT key (other policy) writes its own file; first entry intact
    assert tx.resolve_skew_salts(hot, "auto", auto_threshold=0.9) is None
    files = sorted((tmp_path / "routes").glob("route_*.json"))
    assert len(files) == 2
    assert json.load(open(path))["salts"] == 16
