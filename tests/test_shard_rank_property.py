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
