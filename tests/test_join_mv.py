"""streaming/join_mv.py: incremental join-MV maintenance.

join_mv_step is a pure fold — every test checks it against the ground
truth "full re-join of the current snapshots", which is exactly the
equivalence the incremental plan must preserve. The cases are the
delta-join hazard list: left update, left delete, right non-pk update,
right delete (cascades to all its left rows), JOIN-KEY CHANGE on the left
(remove under old key, re-add under new), a row touched on both sides in
the same batch (must not duplicate), dangling foreign keys, and add-only
schema evolution. The streamed end-to-end path (write_join_mv over the
banded two-table CDC stream) is covered by cdc20's relational oracle and
the resume test here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.streaming.join_mv import join_mv_step


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


L_SCHEMA = "o long, ck long, price double"
R_SCHEMA = "c long, name string"
K_SCHEMA = "o long"
CK_SCHEMA = "c long"


def _truth(left, right):
    return left.join(right.withColumnRenamed("c", "ck"), "ck", "inner")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _check(base, l_new, r_new, tl, tr, spark):
    got = join_mv_step(base, l_new, r_new, tl, tr, ["o"], "ck", "c")
    assert _rows(got) == _rows(_truth(l_new, r_new))
    return got


class TestJoinMvStep:
    def test_first_materialization(self, spark):
        l = _df(spark, [(1, 10, 5.0), (2, 20, 6.0), (3, 99, 7.0)], L_SCHEMA)
        r = _df(spark, [(10, "a"), (20, "b")], R_SCHEMA)
        mv = _check(None, l, r, None, None, spark)
        assert mv.count() == 2  # dangling ck=99 dropped by inner join

    def test_left_insert_and_update(self, spark):
        l0 = _df(spark, [(1, 10, 5.0)], L_SCHEMA)
        r = _df(spark, [(10, "a"), (20, "b")], R_SCHEMA)
        base = join_mv_step(None, l0, r, None, None, ["o"], "ck", "c")
        l1 = _df(spark, [(1, 10, 9.9), (2, 20, 6.0)], L_SCHEMA)  # upd + ins
        _check(base, l1, r, _df(spark, [(1,), (2,)], K_SCHEMA), None, spark)

    def test_left_delete(self, spark):
        l0 = _df(spark, [(1, 10, 5.0), (2, 20, 6.0)], L_SCHEMA)
        r = _df(spark, [(10, "a"), (20, "b")], R_SCHEMA)
        base = join_mv_step(None, l0, r, None, None, ["o"], "ck", "c")
        l1 = _df(spark, [(2, 20, 6.0)], L_SCHEMA)  # order 1 deleted
        mv = _check(base, l1, r, _df(spark, [(1,)], K_SCHEMA), None, spark)
        assert mv.count() == 1

    def test_left_join_key_change(self, spark):
        l0 = _df(spark, [(1, 10, 5.0)], L_SCHEMA)
        r = _df(spark, [(10, "a"), (20, "b")], R_SCHEMA)
        base = join_mv_step(None, l0, r, None, None, ["o"], "ck", "c")
        l1 = _df(spark, [(1, 20, 5.0)], L_SCHEMA)  # moved to customer 20
        mv = _check(base, l1, r, _df(spark, [(1,)], K_SCHEMA), None, spark)
        assert mv.filter(F.col("name") == "b").count() == 1
        assert mv.filter(F.col("name") == "a").count() == 0

    def test_right_update_rewrites_its_rows_only(self, spark):
        l = _df(spark, [(1, 10, 5.0), (2, 10, 6.0), (3, 20, 7.0)], L_SCHEMA)
        r0 = _df(spark, [(10, "a"), (20, "b")], R_SCHEMA)
        base = join_mv_step(None, l, r0, None, None, ["o"], "ck", "c")
        r1 = _df(spark, [(10, "a2"), (20, "b")], R_SCHEMA)
        mv = _check(base, l, r1, None, _df(spark, [(10,)], CK_SCHEMA), spark)
        assert mv.filter(F.col("name") == "a2").count() == 2

    def test_right_delete_cascades(self, spark):
        l = _df(spark, [(1, 10, 5.0), (2, 10, 6.0), (3, 20, 7.0)], L_SCHEMA)
        r0 = _df(spark, [(10, "a"), (20, "b")], R_SCHEMA)
        base = join_mv_step(None, l, r0, None, None, ["o"], "ck", "c")
        r1 = _df(spark, [(20, "b")], R_SCHEMA)  # customer 10 deleted
        mv = _check(base, l, r1, None, _df(spark, [(10,)], CK_SCHEMA), spark)
        assert mv.count() == 1

    def test_both_sides_touch_same_row_no_duplicate(self, spark):
        # order 1 updated AND its customer updated in one batch — the
        # refresh union must fold to ONE copy per left pk
        l0 = _df(spark, [(1, 10, 5.0)], L_SCHEMA)
        r0 = _df(spark, [(10, "a")], R_SCHEMA)
        base = join_mv_step(None, l0, r0, None, None, ["o"], "ck", "c")
        l1 = _df(spark, [(1, 10, 9.9)], L_SCHEMA)
        r1 = _df(spark, [(10, "a2")], R_SCHEMA)
        mv = _check(
            base, l1, r1,
            _df(spark, [(1,)], K_SCHEMA), _df(spark, [(10,)], CK_SCHEMA), spark,
        )
        assert mv.count() == 1

    def test_untouched_batch_returns_base(self, spark):
        l = _df(spark, [(1, 10, 5.0)], L_SCHEMA)
        r = _df(spark, [(10, "a")], R_SCHEMA)
        base = join_mv_step(None, l, r, None, None, ["o"], "ck", "c")
        assert _rows(join_mv_step(base, l, r, None, None, ["o"], "ck", "c")) == _rows(base)

    def test_insert_to_dangling_key_stays_out(self, spark):
        l0 = _df(spark, [(1, 10, 5.0)], L_SCHEMA)
        r = _df(spark, [(10, "a")], R_SCHEMA)
        base = join_mv_step(None, l0, r, None, None, ["o"], "ck", "c")
        l1 = _df(spark, [(1, 10, 5.0), (2, 77, 6.0)], L_SCHEMA)
        mv = _check(base, l1, r, _df(spark, [(2,)], K_SCHEMA), None, spark)
        assert mv.count() == 1

    def test_dangling_key_later_satisfied_by_right_insert(self, spark):
        # order 2 arrives pointing at absent customer 30; customer 30
        # arrives the NEXT batch — the right-touched refresh must pull
        # order 2 in.
        l = _df(spark, [(1, 10, 5.0), (2, 30, 6.0)], L_SCHEMA)
        r0 = _df(spark, [(10, "a")], R_SCHEMA)
        base = join_mv_step(
            None, l, r0, None, None, ["o"], "ck", "c"
        )
        r1 = _df(spark, [(10, "a"), (30, "c")], R_SCHEMA)
        mv = _check(base, l, r1, None, _df(spark, [(30,)], CK_SCHEMA), spark)
        assert mv.count() == 2

    def test_schema_evolution_add_column(self, spark):
        l0 = _df(spark, [(1, 10, 5.0)], L_SCHEMA)
        r = _df(spark, [(10, "a")], R_SCHEMA)
        base = join_mv_step(None, l0, r, None, None, ["o"], "ck", "c")
        l1 = _df(
            spark,
            [(1, 10, 5.0, "n"), (2, 10, 6.0, "n")],
            "o long, ck long, price double, note string",
        )
        mv = join_mv_step(
            base, l1, r, _df(spark, [(2,)], K_SCHEMA), None, ["o"], "ck", "c"
        )
        assert "note" in mv.columns
        # untouched row backfills NULL; refreshed row carries the value
        vals = {r["o"]: r["note"] for r in mv.collect()}
        assert vals[1] is None and vals[2] == "n"

    def test_fold_chain_matches_full_rejoin(self, spark):
        # three-batch chain with mixed operations, checked after each fold
        l0 = _df(spark, [(i, (i % 3) * 10, float(i)) for i in range(12)], L_SCHEMA)
        r0 = _df(spark, [(0, "z"), (10, "a"), (20, "b")], R_SCHEMA)
        mv = join_mv_step(None, l0, r0, None, None, ["o"], "ck", "c")
        # batch 1: orders 0-3 repriced, customer 10 renamed
        l1 = _df(
            spark,
            [(i, (i % 3) * 10, float(i) + (100.0 if i < 4 else 0.0)) for i in range(12)],
            L_SCHEMA,
        )
        r1 = _df(spark, [(0, "z"), (10, "A!"), (20, "b")], R_SCHEMA)
        mv = _check(
            mv, l1, r1,
            _df(spark, [(i,) for i in range(4)], K_SCHEMA),
            _df(spark, [(10,)], CK_SCHEMA), spark,
        )
        # batch 2: customer 20 deleted, orders 4,5 deleted
        l2 = l1.filter(~F.col("o").isin(4, 5))
        r2 = r1.filter(F.col("c") != 20)
        mv = _check(
            mv, l2, r2,
            _df(spark, [(4,), (5,)], K_SCHEMA),
            _df(spark, [(20,)], CK_SCHEMA), spark,
        )
        assert mv.count() == l2.filter(F.col("ck").isin(0, 10)).count()
