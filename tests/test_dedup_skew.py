"""Stop-shingle skew guard (functions/dedup.py::jaccard_pairs
max_shingle_freq): on a corpus where one boilerplate shingle appears in 20%
of documents, the uncapped pair expansion is quadratic in that hot-posting
size while the capped variant's expansion is bounded — the difference
between an operator that survives 100 TB and one that doesn't.

The expansion count is measured exactly (sum of C(|posting|, 2) over
posting lists — the number of struct pairs the flatten/transform actually
emits), so the assertion is deterministic rather than a flaky timing
comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.dedup import jaccard_pairs
from kafka_connect_logminer2_spark.functions.text import shingles

N_DOCS = 500
HOT_FRACTION = 0.2  # one boilerplate header shared by 20% of docs
CAP = 10


def _skewed_docs(spark):
    """Every doc gets 4 unique shingle-able words; docs with id % 5 == 0
    additionally start with the same 3-word boilerplate header."""
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 5 == 0, F.lit("terms of service apply "))
            .otherwise(F.lit("")),
            F.format_string("alpha%d bravo%d charlie%d delta%d", "id", "id", "id", "id"),
        ).alias("text"),
    )


def _expansion_count(docs, cap):
    """Exactly how many candidate pairs the posting-list expansion emits."""
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.transform(shingles(F.col("text"), 3), lambda s: F.xxhash64(s))
        ).alias("shingle"),
    )
    postings = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n"))
    if cap is not None:
        postings = postings.filter(F.col("n") <= cap)
    row = postings.select(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs")
    ).collect()[0]
    return int(row["pairs"] or 0)


def test_capped_expansion_bounded_on_skew(spark):
    docs = _skewed_docs(spark).localCheckpoint()
    hot = N_DOCS * HOT_FRACTION  # 100 docs share the boilerplate shingles

    uncapped = _expansion_count(docs, None)
    capped = _expansion_count(docs, CAP)

    # the hot posting alone contributes C(100,2) = 4950 pairs per boilerplate
    # shingle — quadratic in the hot-doc count
    assert uncapped >= hot * (hot - 1) / 2
    # capped: every surviving posting expands to at most C(CAP,2) = 45;
    # the skewed corpus's unique shingles collide only incidentally, so the
    # capped expansion collapses by orders of magnitude
    assert capped <= uncapped / 50
    # scale-invariance of the bound itself: no surviving posting exceeds cap
    assert capped <= CAP * (CAP - 1) / 2 * 64  # 64-bit-hash collisions only


def test_capped_drops_only_hot_shingle_pairs(spark):
    """Semantics of the cap: pairs connected ONLY via the boilerplate
    disappear; pairs sharing non-hot shingles keep their (uncapped) set
    sizes in the denominator."""
    docs = _skewed_docs(spark).localCheckpoint()
    capped = jaccard_pairs(docs, k=3, threshold=0.0001, max_shingle_freq=CAP)
    # the boilerplate-only docs share no other shingles -> no pairs at all
    assert capped.count() == 0

    uncapped = jaccard_pairs(docs, k=3, threshold=0.0001)
    # uncapped: every hot-doc pair appears (C(100,2) pairs via the header)
    hot = int(N_DOCS * HOT_FRACTION)
    assert uncapped.count() >= hot * (hot - 1) / 2


def test_pii_scrub_redacts_all_categories(spark):
    from kafka_connect_logminer2_spark.functions.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.b@x.io call 555-123-4567 ssn 123-45-6789 "
              "ip 192.168.0.1 card 4111111111111111 end")],
        "id long, text string",
    )
    c = pii_counts(F.col("text"))
    row = df.select(
        pii_scrub(F.col("text")).alias("t"),
        *[v.alias(k) for k, v in c.items()],
    ).collect()[0]
    assert row["email"] == row["phone"] == row["ssn"] == row["ipv4"] == row["ccnum"] == 1
    assert row["t"] == ("mail <EMAIL> call <PHONE> ssn <SSN> "
                        "ip <IPV4> card <CCNUM> end")


def test_star_buckets_preserve_clusters_with_linear_edges(spark):
    """The giant-bucket guard (minhash_banded_pairs star_bucket_size): a
    boilerplate page duplicated m times is one LSH bucket expanding to
    m(m-1)/2 pairs inside a single row. Star mode must (a) cut the edge
    count to O(m) and (b) leave dup_clusters' components IDENTICAL — the
    hub keeps the group connected."""
    from pyspark.sql import Row

    from kafka_connect_logminer2_spark.functions.dedup import (
        dup_clusters,
        minhash_banded_pairs,
    )

    boiler = "all your base are belong to us now and forever " * 4
    rows = [Row(doc_id=i, text=boiler) for i in range(60)] + [
        Row(doc_id=1000 + i, text=f"unique document number {i} with words {i*7} {i*13}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows)

    full = minhash_banded_pairs(docs, num_hashes=16, num_bands=4)
    star = minhash_banded_pairs(docs, num_hashes=16, num_bands=4, star_bucket_size=8)
    n_full, n_star = full.count(), star.count()
    # 60 identical docs: all-pairs = 1770 edges; star = 59
    assert n_full >= 1770 and n_star < 100

    lab = lambda pairs: {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    assert lab(star) == lab(full)  # identical components, 30x fewer edges


def test_winnow_cap_bounds_posting_expansion(spark):
    """q154's claim (the q104 discipline applied to the MOSS family): on a
    corpus where one boilerplate block appears in 20% of documents, every
    winnowed fingerprint of the block is a hot posting expanding to
    C(hot, 2) pairs inside ONE row; max_fp_freq drops those postings so
    no surviving posting expands past C(cap, 2) — while pairs connected
    by non-boilerplate fingerprints are untouched."""
    from kafka_connect_logminer2_spark.functions.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    # boilerplate long enough that several pure-boilerplate windows
    # survive winnowing (k=4 grams, w=5 windows) with >= min_shared
    # distinct fingerprints shared by every hot pair
    boiler = (
        "terms of service apply to all users of this site always "
        "and by continuing to browse you accept the cookie policy "
        "as well as the privacy statement published by the operator "
    )
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 5 == 0, F.lit(boiler)).otherwise(F.lit("")),
            F.format_string(
                "alpha%d bravo%d charlie%d delta%d echo%d foxtrot%d golf%d "
                "hotel%d india%d juliet%d",
                *(["id"] * 10),
            ),
        ).alias("text"),
    ).localCheckpoint()
    hot = N_DOCS * HOT_FRACTION

    fps = winnow_fingerprints(docs, k=4, w=5)
    posting_sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    expansion = lambda p: int(
        (p.select(F.sum(F.col("n") * (F.col("n") - 1) / 2)).collect()[0][0]) or 0
    )
    uncapped = expansion(posting_sizes)
    capped = expansion(posting_sizes.filter(F.col("n") <= CAP))
    assert uncapped >= hot * (hot - 1) / 2     # the hot block is quadratic
    assert capped <= uncapped / 50             # the cap collapses it
    # and the registered operator's output: boilerplate-only pairs gone
    pairs = winnow_pairs(docs, k=4, w=5, min_shared=2, max_fp_freq=CAP)
    assert pairs.count() == 0
    pairs_uncapped = winnow_pairs(docs, k=4, w=5, min_shared=2)
    assert pairs_uncapped.count() >= hot * (hot - 1) / 2


def test_remove_dup_spans_rewrite(spark):
    """Planted boilerplate: an 8-token header shared by 3 docs is removed
    EVERYWHERE (all occurrences, not all-but-one), unique prose survives
    in order, short docs pass through verbatim, and a fully-boilerplate
    doc rewrites to the empty signature."""
    import hashlib

    from pyspark.sql import Row

    from kafka_connect_logminer2_spark.functions.dedup import remove_dup_spans

    header = "this license header is shared across documents verbatim"  # 8 tokens
    docs = [
        (0, f"{header} alpha beta gamma"),
        (1, f"{header} delta epsilon"),
        (2, f"zeta eta {header}"),
        (3, "totally unique text that nobody repeats anywhere at all"),
        (4, "tiny doc"),          # < 8 tokens: no grams, passes through
        (5, header),              # nothing but boilerplate
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r["doc_id"]: r for r in remove_dup_spans(df, min_docs=2).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got[0]["sig"] == md5("alpha beta gamma")
    assert got[1]["sig"] == md5("delta epsilon")
    assert got[2]["sig"] == md5("zeta eta")
    assert got[3]["sig"] == md5(docs[3][1])      # untouched
    assert got[3]["n_tokens_after"] == got[3]["n_tokens_before"]
    assert got[4]["sig"] == md5("tiny doc")      # short doc: verbatim
    assert got[5]["sig"] == md5("") and got[5]["n_tokens_after"] == 0


def test_remove_repeated_spans_keep_first(spark):
    """Keep-first semantics: a doc repeating an 8-token chorus keeps ONE
    copy; a run of one token collapses to that token; docs without
    intra-doc repeats are untouched even when they duplicate ANOTHER doc
    (within-doc scope only)."""
    import hashlib

    from pyspark.sql import Row

    from kafka_connect_logminer2_spark.functions.dedup import (
        remove_repeated_spans,
    )

    chorus = "one two three four five six seven eight"
    docs = [
        (0, f"{chorus} bridge part {chorus}"),
        (1, " ".join(["a"] * 12)),
        (2, "totally unique words that never repeat inside this doc"),
        (3, "totally unique words that never repeat inside this doc"),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r["doc_id"]: r for r in remove_repeated_spans(df).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got[0]["sig"] == md5(f"{chorus} bridge part")
    assert got[1]["sig"] == md5("a") and got[1]["n_tokens_after"] == 1
    # cross-doc duplication is q159's job — both copies untouched here
    assert got[2]["sig"] == md5(docs[2][1]) and got[3]["sig"] == md5(docs[3][1])
