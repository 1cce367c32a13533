"""Round-5 additions: winnowing fingerprints (q142), the one-pass
expectation suite (q143), cross-corpus containment (q144), and SCD Type-2
history from CDC (cdc22)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from kafka_connect_logminer2_spark.functions.dedup import (
    containment_pairs,
    winnow_fingerprints,
    winnow_pairs,
)
from kafka_connect_logminer2_spark.functions.expectations import (
    accepted_values,
    completeness,
    expectation_report,
    referential_report,
    row_count,
    uniqueness,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _py_winnow(text, k=4, w=5):
    """Independent pure-python reference for winnow_fingerprints."""
    toks = text.lower().split(" ")
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    if len(hs) < w:
        return set()
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


class TestWinnowing:
    def test_matches_python_reference(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "a b c d e f g h i j k l m n o p",
            "short one",  # < k tokens -> no fingerprints
            "exactly four token doc",  # 1 gram < w windows -> none
        ]
        got = {
            (r["id"], r["fp"])
            for r in winnow_fingerprints(_docs(spark, texts)).collect()
        }
        want = {
            (i, fp) for i, t in enumerate(texts) for fp in _py_winnow(t)
        }
        assert got == want

    def test_shared_run_guarantee(self, spark):
        # winnowing guarantees: a shared token run of length >= w+k-1
        # yields at least one shared fingerprint
        run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
        texts = [
            f"completely unrelated prefix words here {run}",
            f"{run} and some other trailing material instead",
        ]
        pairs = winnow_pairs(_docs(spark, texts), min_shared=1).collect()
        assert len(pairs) == 1 and pairs[0]["n_shared"] >= 1

    def test_identical_docs_full_overlap(self, spark):
        t = "one two three four five six seven eight nine ten eleven twelve"
        out = winnow_pairs(_docs(spark, [t, t]), min_shared=1).collect()
        assert len(out) == 1
        assert out[0]["overlap"] == pytest.approx(1.0)

    def test_density_below_window_count(self, spark):
        # winnowed fingerprints must be far fewer than q110-style windows
        text = " ".join(f"tok{i % 97}" for i in range(400))
        n_fp = winnow_fingerprints(_docs(spark, [text])).count()
        n_windows = 400 - 4 + 1 - 4  # grams minus window slack
        assert 0 < n_fp < n_windows / 2

    def test_max_fp_freq_drops_boilerplate(self, spark):
        boiler = "this license text is identical in every single document"
        texts = [f"{boiler} plus unique tail {i} {i} {i}" for i in range(6)]
        all_pairs = winnow_pairs(_docs(spark, texts), min_shared=1).count()
        capped = winnow_pairs(
            _docs(spark, texts), min_shared=1, max_fp_freq=3
        ).count()
        assert capped < all_pairs


class TestExpectations:
    def test_pass_fail_and_bounds(self, spark):
        df = spark.createDataFrame(
            [Row(a=1, b="x"), Row(a=2, b="y"), Row(a=2, b=None)]
        )
        rep = {
            r["check_name"]: r
            for r in expectation_report(
                df,
                [
                    ("comp_b", completeness("b"), 1, 1),
                    ("uniq_a", uniqueness("a"), 1, 1),
                    ("min_a", F.min("a"), 1, None),
                    ("rows", row_count(), 3, 3),
                    ("acc_b", accepted_values("b", ["x", "y"]), 1, 1),
                ],
            ).collect()
        }
        assert rep["comp_b"]["metric"] == pytest.approx(2 / 3)
        assert not rep["comp_b"]["passed"]
        assert not rep["uniq_a"]["passed"]  # 2 distinct / 3 rows
        assert rep["min_a"]["passed"]
        assert rep["rows"]["passed"]
        # accepted_values averages over NON-NULL values only
        assert rep["acc_b"]["metric"] == pytest.approx(1.0)
        assert rep["acc_b"]["passed"]

    def test_null_metric_fails_closed(self, spark):
        empty = spark.createDataFrame([], "a int")
        (r,) = expectation_report(empty, [("min_a", F.min("a"), 0, None)]).collect()
        assert r["metric"] is None and r["passed"] is False

    def test_referential_orphans(self, spark):
        child = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=9)])
        parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
        (r,) = referential_report(child, "k", parent, "pk", "fk").collect()
        assert r["metric"] == 1.0 and not r["passed"]

    def test_single_aggregation_pass(self, spark):
        # every non-distinct metric must land in ONE Aggregate over ONE scan
        df = spark.createDataFrame([Row(a=1, b="x")])
        plan = expectation_report(
            df,
            [
                ("comp", completeness("b"), 1, 1),
                ("min", F.min("a"), 0, None),
                ("rows", row_count(), 1, None),
            ],
        )._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Aggregate") == 1


class TestContainment:
    def test_subset_copy_asymmetry(self, spark):
        short = "alpha beta gamma delta epsilon"
        long = (
            "zero one two three four five six seven eight nine ten "
            + short
            + " eleven twelve thirteen fourteen fifteen sixteen seventeen"
        )
        q = _docs(spark, [short])
        c = _docs(spark, [long]).withColumn("doc_id", F.col("doc_id") + 100)
        out = containment_pairs(q, c, threshold=0.5).collect()
        # the short doc is fully contained -> containment 1.0
        assert len(out) == 1 and out[0]["containment"] == pytest.approx(1.0)
        # reversed direction: the long doc is NOT contained in the short one
        rev = containment_pairs(c, q, threshold=0.5).collect()
        assert rev == []

    def test_max_shingle_freq_caps_fanout(self, spark):
        boiler = "same same same same same"
        q = _docs(spark, [boiler])
        c = _docs(spark, [boiler] * 8).withColumn(
            "doc_id", F.col("doc_id") + 100
        )
        full = containment_pairs(q, c, threshold=0.5).count()
        capped = containment_pairs(q, c, threshold=0.5, max_shingle_freq=2).count()
        assert full == 8 and capped == 0


class TestSCD2:
    def _typed(self, spark, rows):
        """(op, cscn, scn, key, val_or_None) -> typed-change frame with the
        apply_table_schema column contract."""
        data = [
            Row(
                OPERATION=op,
                COMMIT_SCN=cscn,
                SCN=scn,
                data=Row(K=None, V=None) if op == "DELETE" else Row(K=k, V=v),
                before=Row(K=k, V=None) if op == "DELETE" else None,
            )
            for (op, cscn, scn, k, v) in rows
        ]
        return spark.createDataFrame(
            data,
            "OPERATION string, COMMIT_SCN long, SCN long, "
            "data struct<K: long, V: string>, before struct<K: long, V: string>",
        )

    def test_insert_update_delete_intervals(self, spark):
        from kafka_connect_logminer2_spark.operators.scd import scd2_history

        typed = self._typed(
            spark,
            [
                ("INSERT", 10, 1, 1, "a"),
                ("UPDATE", 20, 2, 1, "b"),
                ("DELETE", 30, 3, 1, None),
                ("INSERT", 10, 1, 2, "x"),
            ],
        )
        hist = {
            (r["K"], r["valid_from"]): r
            for r in scd2_history(typed, ["K"]).collect()
        }
        assert hist[(1, 10)]["valid_to"] == 20 and not hist[(1, 10)]["is_current"]
        assert hist[(1, 20)]["valid_to"] == 30 and not hist[(1, 20)]["is_current"]
        assert hist[(1, 20)]["V"] == "b"
        assert hist[(2, 10)]["valid_to"] is None and hist[(2, 10)]["is_current"]
        assert len(hist) == 3  # the DELETE emits no version row

    def test_update_merges_missing_columns(self, spark):
        # UPDATE after-images carry only SET+WHERE columns; a column absent
        # from the update (NULL in data) must inherit the INSERT's value
        from kafka_connect_logminer2_spark.operators.scd import scd2_history

        typed = spark.createDataFrame(
            [
                Row(
                    OPERATION="INSERT", COMMIT_SCN=10, SCN=1,
                    data=Row(K=1, V="orig", W="keep"), before=None,
                ),
                Row(
                    OPERATION="UPDATE", COMMIT_SCN=20, SCN=2,
                    data=Row(K=1, V="new", W=None), before=None,
                ),
            ],
            "OPERATION string, COMMIT_SCN long, SCN long, "
            "data struct<K: long, V: string, W: string>, "
            "before struct<K: long, V: string, W: string>",
        )
        rows = {
            r["valid_from"]: r
            for r in scd2_history(typed, ["K"]).collect()
        }
        assert rows[20]["V"] == "new" and rows[20]["W"] == "keep"

    def test_tombstone_blocks_value_carryover(self, spark):
        # re-insert after DELETE starts a fresh generation: a NULL column in
        # the re-insert must NOT resurrect the pre-delete value
        from kafka_connect_logminer2_spark.operators.scd import scd2_history

        typed = spark.createDataFrame(
            [
                Row(
                    OPERATION="INSERT", COMMIT_SCN=10, SCN=1,
                    data=Row(K=1, V="old"), before=None,
                ),
                Row(
                    OPERATION="DELETE", COMMIT_SCN=20, SCN=2,
                    data=Row(K=None, V=None), before=Row(K=1, V="old"),
                ),
                Row(
                    OPERATION="INSERT", COMMIT_SCN=30, SCN=3,
                    data=Row(K=1, V=None), before=None,
                ),
            ],
            "OPERATION string, COMMIT_SCN long, SCN long, "
            "data struct<K: long, V: string>, before struct<K: long, V: string>",
        )
        rows = {
            r["valid_from"]: r
            for r in scd2_history(typed, ["K"]).collect()
        }
        assert rows[10]["valid_to"] == 20
        assert rows[30]["V"] is None  # NOT "old"
        assert rows[30]["is_current"]

    def test_single_exchange_plan(self, spark):
        # every window pass rides ONE hash exchange on the key columns
        from kafka_connect_logminer2_spark.operators.scd import scd2_history

        typed = self._typed(spark, [("INSERT", 10, 1, 1, "a")])
        plan = (
            scd2_history(typed, ["K"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestExpectationGate:
    def _run(self, spark, tmp, checks, docs_rows):
        import glob
        import os
        import shutil
        import time

        from kafka_connect_logminer2_spark.streaming.expectations import (
            write_expectation_gate,
        )

        docs = spark.createDataFrame(docs_rows)
        os.makedirs(f"{tmp}/in", exist_ok=True)
        now = time.time()
        for i in range(3):
            docs.filter(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/s{i}")
            src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
            shutil.copy(src, f"{tmp}/in/f{i}.parquet")
            os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)
        q = write_expectation_gate(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            checks=checks,
            out_dir=f"{tmp}/out",
            quarantine_dir=f"{tmp}/qr",
            metrics_dir=f"{tmp}/metrics",
            checkpoint_dir=f"{tmp}/ckpt",
        )
        assert q.awaitTermination(300)

    def test_quarantine_and_metrics(self, spark, tmp_path):
        import os

        from kafka_connect_logminer2_spark.streaming.expectations import (
            read_gate_metrics,
            read_gated,
        )

        tmp = str(tmp_path)
        rows = [Row(doc_id=i, text=f"doc {i}") for i in range(30)]
        self._run(
            spark,
            tmp,
            [("max_res", F.max(F.pmod("doc_id", F.lit(3))), 0, 1)],
            rows,
        )
        assert sorted(os.listdir(f"{tmp}/out")) == ["batch=0", "batch=1"]
        assert os.listdir(f"{tmp}/qr") == ["batch=2"]
        m = read_gate_metrics(spark, f"{tmp}/metrics").collect()
        assert [r["accepted"] for r in m] == [True, True, False]
        g = read_gated(spark, f"{tmp}/out", f"{tmp}/metrics")
        assert g.count() == 20
        assert set(r["batch"] for r in g.select("batch").distinct().collect()) == {0, 1}

    def test_report_is_commit_marker(self, spark, tmp_path):
        # a batch dir without its metrics segment must stay invisible
        import os
        import shutil

        from kafka_connect_logminer2_spark.streaming.expectations import read_gated

        tmp = str(tmp_path)
        rows = [Row(doc_id=i, text=f"doc {i}") for i in range(30)]
        self._run(
            spark, tmp, [("rows", F.count(F.lit(1)).cast("double"), 1, None)], rows
        )
        shutil.rmtree(f"{tmp}/metrics/v=1")
        g = read_gated(spark, f"{tmp}/out", f"{tmp}/metrics")
        assert set(r["batch"] for r in g.select("batch").distinct().collect()) == {0, 2}
        assert os.path.isdir(f"{tmp}/out/batch=1")  # data present, just gated


class TestPITJoin:
    def _hist(self, spark):
        return spark.createDataFrame(
            [
                Row(K=1, V="v1", valid_from=10, valid_to=20, is_current=False),
                Row(K=1, V="v2", valid_from=20, valid_to=None, is_current=True),
                Row(K=2, V="x1", valid_from=10, valid_to=30, is_current=False),
            ],
            "K long, V string, valid_from long, valid_to long, is_current boolean",
        )

    def test_version_selection(self, spark):
        from kafka_connect_logminer2_spark.operators.scd import pit_join

        facts = spark.createDataFrame(
            [
                Row(fk=1, t=15),   # inside v1
                Row(fk=1, t=20),   # boundary: v2 opens AT 20
                Row(fk=1, t=99),   # open version v2
                Row(fk=2, t=30),   # key 2's only version closed AT 30 -> no match
                Row(fk=2, t=5),    # before key 2 existed -> no match
                Row(fk=9, t=15),   # unknown key -> no match
            ],
            "fk long, t long",
        )
        out = {
            (r["fk"], r["t"]): r["V"]
            for r in pit_join(facts, self._hist(spark), "fk", "K", "t").collect()
        }
        assert out[(1, 15)] == "v1"
        assert out[(1, 20)] == "v2"
        assert out[(1, 99)] == "v2"
        assert out[(2, 30)] is None
        assert out[(2, 5)] is None
        assert out[(9, 15)] is None
        assert len(out) == 6  # left join keeps every fact exactly once

    def test_inner_drops_unmatched(self, spark):
        from kafka_connect_logminer2_spark.operators.scd import pit_join

        facts = spark.createDataFrame([Row(fk=2, t=5)], "fk long, t long")
        assert pit_join(facts, self._hist(spark), "fk", "K", "t", how="inner").count() == 0

    def test_plan_is_hash_join_not_bnlj(self, spark):
        from kafka_connect_logminer2_spark.operators.scd import pit_join

        facts = spark.createDataFrame([Row(fk=1, t=15)], "fk long, t long")
        plan = (
            pit_join(facts, self._hist(spark), "fk", "K", "t")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan


class TestSketchRollup:
    def test_union_equals_direct_and_near_exact(self, spark):
        from kafka_connect_logminer2_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        direct = (
            docs.agg(F.hll_sketch_agg("text", F.lit(12)).alias("sk"))
            .select(F.hll_sketch_estimate("sk").cast("long").alias("est"))
            .collect()[0]["est"]
        )
        union_est = (
            docs.groupBy("source")
            .agg(F.hll_sketch_agg("text", F.lit(12)).alias("sk"))
            .agg(F.hll_union_agg("sk").alias("sk"))
            .select(F.hll_sketch_estimate("sk").cast("long").alias("est"))
            .collect()[0]["est"]
        )
        # merging per-source sketches must reproduce the whole-corpus
        # estimate to within the union's HLL_4->HLL_8 rounding (sub-1%;
        # measured 502 vs 501 here — not bit-identical, the union path
        # keeps a wider register encoding)
        assert abs(union_est - direct) / direct < 0.01
        exact = docs.select("text").distinct().count()
        assert abs(direct - exact) / exact < 0.05

    def test_rollup_shape(self, spark):
        from kafka_connect_logminer2_spark.plans.queries import q146_sketch_rollup

        out = q146_sketch_rollup(spark, "/root/testdata/sf0.001")
        rows = {r["source"]: (r["n_exact"], r["est_ok"])
                for r in out.collect()}
        assert "__all__" in rows
        srcs = [s for s in rows if s != "__all__"]
        # r8 emission: exact counts + pinned accuracy gates per row
        assert all(rows[s][1] for s in rows)
        # global exact cannot exceed the sum of per-source exacts
        # (distinct texts shared across sources merge in the union)
        assert rows["__all__"][0] <= sum(rows[s][0] for s in srcs)
