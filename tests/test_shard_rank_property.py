"""Property test for the two-level shard rank (plans/queries.py::
shard_ranked): for ANY set of distinct int64 doc_ids — including negatives,
values past 2^32 (where the naive Knuth product overflows), and ids that
collide in the 16-bit h2 prefix — the (shard, pos) assignment must equal
the straightforward per-shard global rank computed independently in pandas
with unbounded-int hashing. This is what the DuckDB oracle can't cover:
it runs on the fixture's small positive ids only."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

K = 2654435761


def _shard(x: int, n: int) -> int:
    return ((x % 2**32) * K) % 2**32 % n


def _h2(x: int) -> int:
    return (x % 65536) * 40503 % 65536


ids = st.lists(
    st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        # force h2-prefix collisions: same value mod 65536
        st.integers(min_value=0, max_value=30).map(lambda i: 7 + 65536 * i),
    ),
    min_size=1,
    max_size=60,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=ids, n_shards=st.sampled_from([1, 3, 8]))
def test_two_level_rank_equals_global_rank(spark, ids, n_shards):
    from kafka_connect_logminer2_spark.plans.queries import shard_ranked

    docs = spark.createDataFrame(
        [(i, abs(i) % 1000) for i in ids], "doc_id long, n_chars long"
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_ranked(docs, n_shards).collect()
    }

    ref = pd.DataFrame(
        {
            "doc_id": ids,
            "shard": [_shard(i, n_shards) for i in ids],
            "h2": [_h2(i) for i in ids],
        }
    ).sort_values(["shard", "h2", "doc_id"], kind="mergesort")
    ref["pos"] = ref.groupby("shard").cumcount() + 1

    expected = {
        int(r.doc_id): (int(r.shard), int(r.pos)) for r in ref.itertuples()
    }
    assert got == expected


cum_ids = st.lists(
    st.one_of(
        st.integers(min_value=-(2**40), max_value=2**40),
        # dense small ids → many rows per block
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=60,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=cum_ids, block_size=st.sampled_from([1, 7, 4096]))
def test_two_level_cumsum_equals_naive_window(spark, ids, block_size):
    """The packing prefix-sum decomposition (two_level_cumsum) must be
    EXACT for any distinct int64 order keys — negatives (floor-division
    blocks), sparse ids (singleton blocks), dense ids (multi-row blocks),
    and any block size including 1 — matching the naive single-window
    running sum computed independently in pandas."""
    from kafka_connect_logminer2_spark.functions.sharding import two_level_cumsum

    rows = [(i, f"src{abs(i) % 3}", abs(i) % 97 + 1) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    got = {
        r["doc_id"]: r["cum_excl"]
        for r in two_level_cumsum(
            df, "source", "doc_id", "v", block_size=block_size
        ).collect()
    }

    ref = pd.DataFrame(rows, columns=["doc_id", "source", "v"]).sort_values(
        ["source", "doc_id"], kind="mergesort"
    )
    ref["cum_excl"] = ref.groupby("source")["v"].cumsum() - ref["v"]
    expected = {int(r.doc_id): int(r.cum_excl) for r in ref.itertuples()}
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=2, max_value=40),
    block_size=st.sampled_from([1, 5, 4096]),
)
def test_two_level_cumsum_tie_cols_break_order_collisions(spark, n, block_size):
    """tie_cols contract (the q127 past-2^32 regime in miniature): rows
    whose ORDER key collides must still cumsum deterministically, ordered
    by the tie column — matching pandas truth sorted by (order, tie).
    Every order value is duplicated across two tie ids, so without
    tie_cols the result would be partition-order-dependent."""
    from kafka_connect_logminer2_spark.functions.sharding import two_level_cumsum

    rows = []
    for i in range(n):
        rows.append((i % 7, i, "g", i + 1))       # (order, tie, group, value)
        rows.append((i % 7, 1000 + i, "g", 2 * i + 1))
    df = spark.createDataFrame(rows, "h long, doc_id long, source string, v long")
    got = {
        (r["h"], r["doc_id"]): r["cum_excl"]
        for r in two_level_cumsum(
            df, "source", "h", "v", block_size=block_size, tie_cols=["doc_id"]
        ).collect()
    }

    ref = pd.DataFrame(rows, columns=["h", "doc_id", "source", "v"]).sort_values(
        ["h", "doc_id"], kind="mergesort"
    )
    ref["cum_excl"] = ref["v"].cumsum() - ref["v"]
    expected = {
        (int(r.h), int(r.doc_id)): int(r.cum_excl) for r in ref.itertuples()
    }
    assert got == expected
