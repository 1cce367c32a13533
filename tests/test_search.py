"""functions/search.py: positional phrase search (one-shot + prebuilt
postings) and exact heavy hitters (Misra-Gries candidates + exact recount).

The phrase matcher's correctness traps: overlapping occurrences, a phrase
with REPEATED terms ("batch batch" — both conditional collects see the
same position set; the shifted intersect must still count adjacency, not
membership), matches at document boundaries, and the F.transform arity
trap (a two-parameter lambda silently becomes the (element, index) form —
the q134 bug _shift exists to prevent).

Heavy hitters' contract is EXACTNESS despite the sketch: the MG candidate
union is a guaranteed superset of every item with freq ≥ total/denom, for
ANY partitioning and ANY arrival order, so the recount equals a plain
GROUP BY/HAVING. Tests force tiny capacities and adversarial partitioning
to make the sketch actually prune.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.search import (
    _mg_fold,
    heavy_hitters_exact,
    phrase_match_counts,
    phrase_match_counts_indexed,
    positional_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _counts(df):
    return {r["doc_id"]: r["n_matches"] for r in df.collect()}


class TestPhraseMatch:
    def test_basic_and_overlap(self, spark):
        docs = _docs(
            spark,
            [
                (1, "batch merge x batch merge"),  # two disjoint occurrences
                (2, "batch x merge"),  # terms present, never adjacent
                (3, "merge batch merge"),  # match not at position 0
                (4, "batch merge"),  # whole doc is the phrase
                (5, "no relevant words"),
            ],
        )
        assert _counts(phrase_match_counts(docs, ["batch", "merge"])) == {
            1: 2,
            3: 1,
            4: 1,
        }

    def test_three_term_phrase(self, spark):
        docs = _docs(
            spark,
            [
                (1, "a b c a b c"),  # two occurrences
                (2, "a b x c"),  # broken in the middle
                (3, "x a b c"),  # offset match
            ],
        )
        assert _counts(phrase_match_counts(docs, ["a", "b", "c"])) == {1: 2, 3: 1}

    def test_repeated_term_phrase(self, spark):
        # "batch batch": overlapping run of 3 → 2 matches (positions 0,1)
        docs = _docs(
            spark,
            [(1, "batch batch batch x"), (2, "batch x batch"), (3, "batch batch")],
        )
        assert _counts(phrase_match_counts(docs, ["batch", "batch"])) == {1: 2, 3: 1}

    def test_case_folding(self, spark):
        docs = _docs(spark, [(1, "Batch MERGE end")])
        assert _counts(phrase_match_counts(docs, ["BATCH", "merge"])) == {1: 1}

    def test_single_term(self, spark):
        docs = _docs(spark, [(1, "a b a"), (2, "b")])
        assert _counts(phrase_match_counts(docs, ["a"])) == {1: 2}

    def test_empty_phrase_raises(self, spark):
        docs = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            phrase_match_counts(docs, [])
        with pytest.raises(ValueError):
            phrase_match_counts_indexed(positional_postings(docs), [])

    def test_indexed_path_equals_oneshot(self, spark):
        rows = [
            (1, "batch merge x batch merge"),
            (2, "batch x merge"),
            (3, "merge batch merge batch merge"),
            (4, "batch merge"),
            (5, "other text entirely"),
        ]
        docs = _docs(spark, rows)
        postings = positional_postings(docs)
        for phrase in (["batch", "merge"], ["merge", "batch", "merge"], ["batch"]):
            one = _counts(phrase_match_counts(docs, phrase))
            idx = _counts(phrase_match_counts_indexed(postings, phrase, spark))
            assert one == idx, phrase

    def test_postings_positions_one_based(self, spark):
        docs = _docs(spark, [(7, "x y")])
        rows = positional_postings(docs).orderBy("pos").collect()
        assert [r["pos"] for r in rows] == [1, 2]
        assert rows[0]["h"] == rows[0]["h"]  # hashed term column present
        assert set(positional_postings(docs).columns) == {"h", "doc_id", "pos"}


class TestMisraGries:
    def test_fold_exact_when_under_capacity(self):
        c = _mg_fold({}, ["a", "b", "a"], [3, 2, 1], capacity=10)
        assert c == {"a": 4, "b": 2}

    def test_fold_prunes_to_capacity(self):
        c = _mg_fold({}, list("abcdef"), [1] * 6, capacity=2)
        assert len(c) <= 2

    def test_fold_undercount_bound(self):
        # 100 of 'hot', 1 each of 50 rares, capacity 4: hot's estimate must
        # be >= true - total/(capacity+1) and hot must survive.
        items = ["hot"] * 100 + [f"r{i}" for i in range(50)]
        weights = [1] * len(items)
        c = _mg_fold({}, items, weights, capacity=4)
        assert "hot" in c
        assert c["hot"] >= 100 - (150 // 5)

    def test_exactness_vs_group_by(self, spark):
        # skewed multiset across several partitions; tiny capacity forces
        # real pruning; answer must equal the plain GROUP BY / HAVING.
        rows = (
            [("x",)] * 400 + [("y",)] * 200 + [("z",)] * 90
            + [(f"noise{i % 97}",) for i in range(300)]
        )
        df = spark.createDataFrame(rows, "item string").repartition(8)
        total = df.count()
        got = {
            (r["item"], r["n"])
            for r in heavy_hitters_exact(df, "item", total, denom=10).collect()
        }
        truth = {
            (r["item"], r["n"])
            for r in df.groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") * 10 >= total)
            .collect()
        }
        assert got == truth and got  # non-empty: x and y qualify

    def test_exactness_adversarial_partitioning(self, spark):
        # the heavy item arrives LAST in every partition, after the noise
        # has filled the sketch — candidates must still include it.
        rows = [(f"n{i}",) for i in range(500)] + [("hh",)] * 60
        df = spark.createDataFrame(rows, "item string").coalesce(1)
        total = df.count()
        got = heavy_hitters_exact(
            df, "item", total, denom=10, capacity=16
        ).collect()
        assert {(r["item"], r["n"]) for r in got} == {("hh", 60)}

    def test_capacity_below_denom_raises(self, spark):
        df = spark.createDataFrame([("a",)], "item string")
        with pytest.raises(ValueError):
            heavy_hitters_exact(df, "item", 1, denom=10, capacity=4)
        with pytest.raises(ValueError):
            heavy_hitters_exact(df, "item", 0, denom=10)

    def test_counts_are_exact_not_estimates(self, spark):
        # MG alone undercounts; the recount pass must report TRUE counts.
        rows = [("a",)] * 37 + [(f"n{i}",) for i in range(200)]
        df = spark.createDataFrame(rows, "item string").repartition(4)
        total = df.count()
        out = heavy_hitters_exact(df, "item", total, denom=8, capacity=8).collect()
        assert {(r["item"], r["n"]) for r in out} == {("a", 37)}


# ---------------------------------------------------------------------------
# property tests vs independent python references
# ---------------------------------------------------------------------------

from collections import Counter  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ALPHABET = ["aa", "bb", "cc"]
_doc = st.lists(st.sampled_from(_ALPHABET), min_size=0, max_size=12)


def _phrase_count_py(tokens: list[str], phrase: list[str]) -> int:
    k = len(phrase)
    return sum(1 for i in range(len(tokens) - k + 1) if tokens[i : i + k] == phrase)


class TestPhraseProperty:
    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(_doc, min_size=1, max_size=6),
        st.lists(st.sampled_from(_ALPHABET), min_size=1, max_size=3),
    )
    def test_matches_python_reference(self, spark, docs_tokens, phrase):
        docs = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(docs_tokens)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_match_counts(docs, phrase).collect()
        }
        want = {
            i: c
            for i, t in enumerate(docs_tokens)
            if (c := _phrase_count_py(t, phrase)) > 0
        }
        assert got == want


class TestHeavyHittersProperty:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(
            st.sampled_from([f"t{i}" for i in range(12)]), min_size=1, max_size=300
        ),
        st.integers(min_value=2, max_value=20),
        st.integers(min_value=1, max_value=8),
    )
    def test_exact_for_any_multiset_and_partitioning(
        self, spark, items, denom, n_parts
    ):
        df = spark.createDataFrame([(x,) for x in items], "item string").repartition(
            n_parts
        )
        total = len(items)
        got = {
            (r["item"], r["n"])
            for r in heavy_hitters_exact(df, "item", total, denom=denom).collect()
        }
        want = {
            (k, c) for k, c in Counter(items).items() if c * denom >= total
        }
        assert got == want
