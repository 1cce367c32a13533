"""Quality measurement for the MinHash-LSH near-dup path (q20) against the
exact n-gram Jaccard baseline (q19).

The 100 TB pitch for MinHash is "banded bucket joins instead of the pairwise
shingle join, keeping the real near-dups" — this harness quantifies the kept
half two ways:

  * pair_recall: fraction of exact pairs with jaccard >= ``threshold`` that
    appear among the MinHash candidate pairs (misses come from banding: a
    true pair whose signatures collide in no hash table is never seen);
  * mae: mean |(1 - reported jaccard distance) - exact jaccard| over the
    recovered pairs. MinHashLSH's distCol is the exact Jaccard on the
    HashingTF feature vectors (the banding only gates candidates), so mae
    isolates feature-hash collision error — expect ~0 until shingle
    cardinality approaches num_features (2^18).

Run standalone:

    python tools/minhash_quality.py [sf_dir]

prints one JSON line. Imported by tests/test_minhash_quality.py which
asserts floor/ceiling values (an approximate operator with an unmeasured
miss rate is not done).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from kafka_connect_logminer2_spark.functions import dedup as D  # noqa: E402
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.sources.tables import load_table  # noqa: E402


def minhash_quality(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
) -> dict[str, float]:
    """Recall + estimate error of MinHash candidates vs exact Jaccard pairs
    at ``threshold`` similarity (0.5 = the classic near-dup cut)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        D.jaccard_pairs(docs, k=3, threshold=threshold)
        .select("doc_id1", "doc_id2", "jaccard")
        .localCheckpoint(eager=False)
    )
    approx = D.minhash_neardup_pairs(
        docs, k=3, num_hashes=num_hashes, max_jaccard_distance=1.0 - threshold + 0.2
    ).select("doc_id1", "doc_id2", "jaccard_distance_est")
    banded = D.minhash_banded_pairs(
        docs, k=3, num_hashes=num_hashes, num_bands=num_hashes // 4
    ).select("doc_id1", "doc_id2", "jaccard_est")

    n_exact = exact.count()
    joined = exact.join(approx, ["doc_id1", "doc_id2"], "inner")
    stats = joined.agg(
        F.count(F.lit(1)).alias("hits"),
        F.avg(F.abs((1.0 - F.col("jaccard_distance_est")) - F.col("jaccard"))).alias(
            "mae"
        ),
    ).collect()[0]
    hits, mae = stats["hits"], stats["mae"]
    bjoined = exact.join(banded, ["doc_id1", "doc_id2"], "inner")
    bstats = bjoined.agg(
        F.count(F.lit(1)).alias("hits"),
        F.avg(F.abs(F.col("jaccard_est") - F.col("jaccard"))).alias("mae"),
    ).collect()[0]
    return {
        "pair_recall": round(hits / n_exact, 4) if n_exact else 1.0,
        "mae": round(mae, 4) if mae is not None else 0.0,
        "banded_pair_recall": round(bstats["hits"] / n_exact, 4) if n_exact else 1.0,
        "banded_mae": round(bstats["mae"], 4) if bstats["mae"] is not None else 0.0,
        "n_exact_pairs": n_exact,
        "threshold": threshold,
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({**minhash_quality(spark, sf_dir), "sf_dir": sf_dir}))
    spark.stop()
