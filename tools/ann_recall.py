"""Recall@k measurement for the approximate ANN paths (q31 LSH, q35 IVF)
against the exact brute-force baseline (q22).

An approximate operator without a measured recall number is not done: the
100 TB pitch for LSH/IVF is "prune most of the corpus, keep most of the
neighbors" — this harness quantifies the second half. Run standalone:

    python tools/ann_recall.py [sf_dir]

prints one JSON line {"lsh": r, "ivf": r, "k": 5, "n_queries": ...}.
Also imported by tests/test_ann_recall.py which asserts floor values.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from kafka_connect_logminer2_spark.functions import similarity as S  # noqa: E402
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.sources.tables import load_table  # noqa: E402


def recall_at_k(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 8
) -> dict[str, float]:
    """Mean fraction of the exact top-k recovered by each approximate path,
    averaged over the same query set the q31/q35 registry entries use."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = S.cosine_topk(emb, queries, k=k).select("query_id", "neighbor_id")
    n = emb.count()
    auto_k, auto_probe = S.ivf_auto_params(n)
    approx = {
        "lsh": S.lsh_bucketed_topk(emb, queries, k=k),
        "ivf": S.ivf_topk(emb, queries, k=k, nprobe=5),
        # corpus-size-aware params: n_centroids ~ 4*sqrt(N), probed corpus
        # fraction held constant — the rule that keeps recall flat as N grows
        "ivf_auto": S.ivf_topk(
            emb, queries, k=k, n_centroids=auto_k, nprobe=auto_probe
        ),
    }
    total = exact.count()  # n_queries * k (or fewer on tiny corpora)
    out: dict[str, float] = {}
    for name, df in approx.items():
        hits = (
            df.select("query_id", "neighbor_id")
            .join(exact, ["query_id", "neighbor_id"], "inner")
            .count()
        )
        out[name] = round(hits / total, 4) if total else 0.0
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    r = recall_at_k(spark, sf_dir)
    print(json.dumps({**r, "k": 5, "sf_dir": sf_dir}))
    spark.stop()
