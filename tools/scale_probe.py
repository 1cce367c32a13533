"""Scale probe: does runtime stay ~linear when the data grows 4× and 10×?

Synthesizes larger inputs in-memory (base table unioned M times with
key-offset copies — no files written) and times representative operators at
each multiplier. A super-linear ratio flags a plan that would fall over at
cluster scale (quadratic join blowup, collected driver state, skew).

Usage: python tools/scale_probe.py [sf_dir]   # default /root/testdata/sf0.1
Prints one JSON line per operator: {"op": ..., "x1": s, "x4": s, "x10": s,
"r10_vs_linear": ratio} where r10_vs_linear = t(10x) / (10 * t(1x)) — ~1.0
or below means the operator scales linearly or better locally.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kafka_connect_logminer2_spark.functions import dedup as D  # noqa: E402
from kafka_connect_logminer2_spark.functions import similarity as S  # noqa: E402
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.sources.tables import load_table  # noqa: E402

MULTIPLIERS = (1, 4, 10)


def replicate(df: DataFrame, m: int, key_cols: list[str], span: int) -> DataFrame:
    """m key-offset copies (distinct keys per copy, same distributions)."""
    out = df
    for i in range(1, m):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + i * span)
        out = out.unionByName(c)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="scale_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = load_table(spark, sf_dir, "lineitem").localCheckpoint()
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
    events = load_table(spark, sf_dir, "events").localCheckpoint()
    span_li = 10_000_000
    span = 1_000_000

    def agg_op(m):
        df = replicate(lineitem, m, ["l_orderkey"], span_li)
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
        )

    def dedup_op(m):
        return D.exact_dedup(replicate(docs, m, ["doc_id"], span))

    def window_op(m):
        from pyspark.sql import Window

        df = replicate(lineitem, m, ["l_orderkey"], span_li)
        w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc())
        return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)

    def topk_op(m):
        corpus = replicate(emb, m, ["vec_id"], span)
        q = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return S.cosine_topk(corpus, q, k=5)

    def asof_op(m):
        df = replicate(events, m, ["event_id", "user_id"], span)
        from kafka_connect_logminer2_spark.plans.queries import q37_asof_join  # noqa: F401
        # inline the as-of shape over the replicated frame
        ev = df.filter(F.col("event_type").isin("click", "purchase"))
        tagged = ev.select(
            "user_id", "ts", "event_id",
            F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
            "event_type",
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            tagged.withColumn("lc", F.last("click_ts", ignorenulls=True).over(w))
            .filter(F.col("event_type") == "purchase")
        )

    def jaccard_op(m):
        # plain key-offset replication keeps the TEXT identical, making every
        # copy a true near-dup of every other — O(m^2) real pairs, which OOMs
        # at 10x and is the operator working as designed, not a scaling flaw.
        # Rotate the frequent-letter alphabet per copy so copies are textually
        # disjoint and the probe measures linear-work growth instead.
        alpha = "etaoinshr"
        out = docs
        for i in range(1, m):
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            out = out.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + i * span).withColumn(
                    "text", F.translate("text", alpha, rot)
                )
            )
        return D.jaccard_pairs(out, k=3, threshold=0.3)

    def kmeans_assign_op(m):
        # one Lloyd's assignment pass (the per-iteration heavy step)
        from kafka_connect_logminer2_spark.functions.clustering import kmeans

        corpus = replicate(emb, m, ["vec_id"], span)
        out, _, _ = kmeans(corpus, k=8, max_iter=1)
        return out

    def pipeline_fold_op(m):
        # q95's shape: scan-side clean+md5+quality, hash fold with min_by,
        # per-source rollup. Identical copies collapse into the same hash
        # groups (real dups, counted not paired — linear work by design).
        df = replicate(docs, m, ["doc_id"], span)
        cleaned = F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower("text"), r"https?://\S+", " "),
                    r"[a-z0-9._%+-]+@[a-z0-9.-]+",
                    " ",
                ),
                r"\s+",
                " ",
            )
        )
        from kafka_connect_logminer2_spark.functions.text import quality_score

        scored = (
            df.withColumn("h", F.md5(cleaned))
            .withColumn("q", quality_score(F.col("text")))
            .filter(F.col("q") >= 0.4)
        )
        canon = scored.groupBy("h").agg(
            F.min_by("source", "doc_id").alias("source"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        return canon.groupBy("source").agg(F.count(F.lit(1)), F.sum("n_copies"))

    def retention_op(m):
        # q96's shape: one (user, week-set) exchange via map-side collect_set
        df = replicate(events, m, ["event_id", "user_id"], span)
        per_user = (
            df.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
            .groupBy("user_id")
            .agg(F.array_sort(F.collect_set("wk")).alias("wks"))
        )
        return (
            per_user.select(
                F.element_at("wks", 1).alias("cw"), F.explode("wks").alias("wk")
            )
            .groupBy("cw", F.datediff("wk", "cw").alias("off"))
            .agg(F.count(F.lit(1)))
        )

    def minhash_banded_op(m):
        # q105's shape: vectorized signatures + band-bucket join. Each copy's
        # words get a copy-suffix so shingle spaces are DISJOINT across
        # copies (plain replication would make every copy an exact dup of
        # its source — m² pairs by fixture construction, not operator cost).
        parts = [docs]
        for i in range(1, m):
            parts.append(
                docs.withColumn("doc_id", F.col("doc_id") + i * span).withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1c{i}")
                )
            )
        df = parts[0]
        for c in parts[1:]:
            df = df.unionByName(c)
        return D.minhash_banded_pairs(df, k=3, num_hashes=16, num_bands=4)

    def pii_scrub_op(m):
        # q106's shape: pure regexp map stage — must be exactly linear
        from kafka_connect_logminer2_spark.functions.text import pii_scrub

        df = replicate(docs, m, ["doc_id"], span)
        return df.select(F.md5(pii_scrub(F.col("text"))).alias("h")).filter(
            F.col("h").isNotNull()
        )

    def quantize_op(m):
        # q108's shape: per-vector arithmetic, no shuffle at all
        corpus = replicate(emb, m, ["vec_id"], span)
        return S.quantize_embeddings_int8(corpus).filter(F.col("n_clipped") >= 0)

    def dup_span_op(m):
        # q110's shape: per-doc distinct 8-token windows, hashed before the
        # exchange. Same alphabet rotation as jaccard_op: textually disjoint
        # copies, so span-collision counts stay fixture-linear.
        alpha = "etaoinshr"
        out = docs
        for i in range(1, m):
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            out = out.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + i * span).withColumn(
                    "text", F.translate("text", alpha, rot)
                )
            )
        return D.dup_span_stats(out, span_tokens=8)

    def semantic_dedup_op(m):
        # q112's shape: coarse-centroid assign (matmul UDF) + per-cluster
        # BLAS tiles. Tile flops are sum of per-cluster n_c² = N²/k, so the
        # production contract is k ∝ N (more clusters as the corpus grows,
        # constant cluster size) — the probe scales n_centroids with m and
        # measures that total time then stays ~linear. Holding k fixed
        # while N grows 10× would be 100× flops BY DESIGN, not a plan flaw.
        corpus = replicate(emb, m, ["vec_id"], span)
        return S.semantic_neardup_pairs(
            corpus, threshold=0.4, n_centroids=16 * m
        )

    def shard_export_op(m):
        # q111's shape: two-level within-shard rank (window on (shard, h2) +
        # broadcast offset table). Sort width is decoupled from n_shards, so
        # with n_shards FIXED at 8 the growth must stay ~linear — the r2
        # per-shard-window version was the one registered plan hard-capped
        # at 8 tasks.
        from kafka_connect_logminer2_spark.plans.queries import shard_export

        df = replicate(docs, m, ["doc_id"], span)
        return shard_export(df.select("doc_id", "n_chars"), n_shards=8)

    def packing_cumsum_op(m):
        # q51/q117/q119's packing stage: two-level running token sum —
        # the per-source single-task window would flatline at n_sources
        # tasks; the block decomposition must grow ~linearly
        from kafka_connect_logminer2_spark.functions.sharding import two_level_cumsum

        df = replicate(docs, m, ["doc_id"], span)
        toks = df.select(
            "doc_id", "source",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
        return two_level_cumsum(toks, "source", "doc_id", "n_tok").groupBy(
            "source"
        ).agg(F.sum("cum_excl"))

    def salted_assembly_op(m):
        # CDC assembly with a 10%-hot xid via the salted route — replicate
        # keeps the skew fraction constant, growth must stay ~linear
        from kafka_connect_logminer2_spark.operators.transactions import (
            assemble_transactions,
        )

        base_redo = _skew_redo
        df = replicate(base_redo, m, ["scn"], 100_000_000)
        return assemble_transactions(df, skew_salts=16)

    def gopher_rules_op(m):
        # q129's shape: codegen'd projection battery, zero exchanges —
        # must be exactly scan-linear
        from kafka_connect_logminer2_spark.plans.queries import q129_gopher_rules  # noqa: F401

        df = replicate(docs, m, ["doc_id"], span)
        words = F.split(F.col("text"), " ")
        n_words = F.size(words)
        return df.select(
            "doc_id",
            ((n_words >= 50) & (n_words <= 100000)).alias("p1"),
            (((F.length("text") - (n_words - F.lit(1))) / n_words).between(3, 10)).alias("p2"),
            (F.expr("size(filter(split(text, ' '), w -> w rlike '[A-Za-z]'))") / n_words >= 0.8).alias("p3"),
        ).filter("p1 and p2 and p3")

    def dsir_weights_op(m):
        # q130's shape: exploded grams bucket via md5, broadcast count
        # tables (B fixed at any corpus size), one per-doc rollup exchange
        from kafka_connect_logminer2_spark.functions.sharding import md5_bucket
        from kafka_connect_logminer2_spark.plans.queries import _doc_grams

        B = 8192
        df = replicate(docs, m, ["doc_id"], span)
        g = _doc_grams(df).withColumn("b", md5_bucket(F.col("gram"), B))
        raw = g.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        tgt = g.filter(F.col("lang") == "en").groupBy("b").agg(
            F.count(F.lit(1)).alias("ct")
        )
        tot = g.agg(
            F.count(F.lit(1)).alias("tr"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("tt"),
        )
        lw = F.log((F.col("ct") + 1) / (F.col("tt") + B)) - F.log(
            (F.col("cr") + 1) / (F.col("tr") + B)
        )
        return (
            g.join(F.broadcast(raw), "b")
            .join(F.broadcast(tgt), "b", "left")
            .na.fill({"ct": 0})
            .join(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.round(F.sum(lw), 6).alias("w"))
        )

    def bigram_lm_op(m):
        # q131's shape: pair explode + token-key count joins. Identical
        # copies keep the vocab (and so the count tables) FIXED while the
        # scoring stream grows ×m — the join cost must track the stream
        toks = F.split(F.lower("text"), " ")
        df = replicate(docs, m, ["doc_id"], span)
        pairs = df.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("p"),
        ).select("doc_id", "p.w1", "p.w2")
        c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
        cs = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("cs"))
        return (
            pairs.join(c2, ["w1", "w2"])
            .join(cs, "w1")
            .groupBy("doc_id")
            .agg(F.sum(-F.log(F.col("c2") / F.col("cs"))).alias("s"))
        )

    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location("t_skew", "tests/test_skew_cdc.py")
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    _skew_redo = _mod._skewed_redo(spark, n_events=60_000, hot_frac=0.10).localCheckpoint()

    def phrase_search_op(m):
        from kafka_connect_logminer2_spark.functions.search import (
            phrase_match_counts,
        )

        return phrase_match_counts(
            replicate(docs, m, ["doc_id"], span), ["batch", "merge"]
        )

    def heavy_hitters_op(m):
        from kafka_connect_logminer2_spark.functions.search import (
            heavy_hitters_exact,
        )

        d = replicate(docs, m, ["doc_id"], span)
        bigrams = d.select(F.split(F.lower("text"), " ").alias("_a")).select(
            F.explode(
                F.expr(
                    "transform(slice(_a, 1, size(_a) - 1),"
                    " (x, i) -> concat(x, ' ', _a[i + 1]))"
                )
            ).alias("bigram")
        ).localCheckpoint(eager=False)
        return heavy_hitters_exact(bigrams, "bigram", bigrams.count(), denom=800)

    def graph_degree_op(m):
        from kafka_connect_logminer2_spark.functions.graph import degree_stats

        li = replicate(lineitem, m, ["l_orderkey"], span_li)
        edges = li.select(
            (F.col("l_orderkey") % 10000 * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        ).groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("weight"))
        return degree_stats(edges)

    def pagerank_op(m):
        # 3 iterations — the probe measures per-iteration edge-join growth,
        # not convergence
        from kafka_connect_logminer2_spark.functions.graph import pagerank

        li = replicate(lineitem, m, ["l_orderkey"], span_li)
        edges = li.select(
            (F.col("l_orderkey") % 10000 * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        ).groupBy("src", "dst").agg(F.count(F.lit(1)).cast("double").alias("weight"))
        return pagerank(edges, n_iter=3)

    def zorder_op(m):
        from kafka_connect_logminer2_spark.functions.layout import zorder_key

        li = replicate(lineitem, m, ["l_orderkey"], span_li)
        return li.select(
            zorder_key(["l_partkey", "l_orderkey"]).alias("z")
        ).groupBy(F.shiftright("z", 20)).count()

    def winnow_op(m):
        # rotated-alphabet copies (see jaccard_op): textually disjoint, so
        # the probe measures fingerprint+posting growth, not real-pair blowup
        alpha = "etaoinshr"
        out = docs
        for i in range(1, m):
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            out = out.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + i * span).withColumn(
                    "text", F.translate("text", alpha, rot)
                )
            )
        return D.winnow_pairs(out, min_shared=2)

    def containment_op(m):
        # the serving shape: the query batch stays FIXED while the corpus
        # history grows xm (rotated copies) — probe cost must track the
        # corpus posting volume, never corpus x query
        alpha = "etaoinshr"
        q = docs.filter(F.col("source") >= "src5")
        corpus = docs.filter(F.col("source") < "src5")
        out = corpus
        for i in range(1, m):
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            out = out.unionByName(
                corpus.withColumn("doc_id", F.col("doc_id") + i * span).withColumn(
                    "text", F.translate("text", alpha, rot)
                )
            )
        return D.containment_pairs(q, out, threshold=0.3)

    def expectations_op(m):
        # q143's shape: every metric in ONE agg pass — must be scan-linear
        # at any check count
        from kafka_connect_logminer2_spark.functions.expectations import (
            accepted_values,
            completeness,
            expectation_report,
            row_count,
            uniqueness,
        )

        df = replicate(lineitem, m, ["l_orderkey"], span_li)
        return expectation_report(
            df,
            [
                ("acc_rf", accepted_values("l_returnflag", ["A", "N", "R"]), 1, 1),
                ("comp_ship", completeness("l_shipdate"), 1, 1),
                ("max_disc", F.max("l_discount"), None, 0.1),
                ("mean_tax", F.avg("l_tax"), 0, 0.09),
                ("min_qty", F.min("l_quantity"), 1, None),
                ("rows", row_count(), 1, None),
                ("uniq", uniqueness("l_orderkey", "l_linenumber"), 1, 1),
            ],
        )

    def scd2_pit_op(m):
        # cdc22/q145's shape: synthetic 1-2 changes per key -> history ->
        # point-in-time join back to the facts; one key exchange for the
        # windows + one hash join, both must grow ~linearly
        from kafka_connect_logminer2_spark.operators.scd import (
            pit_join,
            scd2_history,
        )

        o = replicate(
            load_table(spark, sf_dir, "orders"), m, ["o_orderkey"], span_li
        )
        null_img = F.expr("CAST(NULL AS struct<K: BIGINT, V: DOUBLE>)")
        ins = o.select(
            F.lit("INSERT").alias("OPERATION"),
            (F.col("o_orderkey") * 10).alias("COMMIT_SCN"),
            (F.col("o_orderkey") * 10).alias("SCN"),
            F.struct(
                F.col("o_orderkey").alias("K"), F.col("o_totalprice").alias("V")
            ).alias("data"),
            null_img.alias("before"),
        )
        upd = o.filter(F.col("o_orderkey") % 2 == 0).select(
            F.lit("UPDATE").alias("OPERATION"),
            (F.col("o_orderkey") * 10 + 5).alias("COMMIT_SCN"),
            (F.col("o_orderkey") * 10 + 5).alias("SCN"),
            F.struct(
                F.col("o_orderkey").alias("K"),
                (F.col("o_totalprice") + 1).alias("V"),
            ).alias("data"),
            null_img.alias("before"),
        )
        hist = scd2_history(ins.unionByName(upd), ["K"])
        facts = o.select(
            "o_orderkey", (F.col("o_orderkey") * 10 + 7).alias("t")
        )
        return pit_join(facts, hist, "o_orderkey", "K", "t").groupBy(
            F.col("V").isNull()
        ).count()

    def skyline_op(m):
        # q153's shape in the regime that killed the r5 plan: each copy
        # jitters prices by a distinct sub-cent offset, so |distinct
        # prices| grows ~linearly with the data (continuous domain — no
        # small dimension to broadcast, no single-partition window to
        # hide in). Cost must track the per-price hash agg + block-local
        # windows, i.e. stay ~linear.
        from kafka_connect_logminer2_spark.functions.sharding import (
            two_level_cummax,
        )

        p = load_table(spark, sf_dir, "part")
        out = p
        for i in range(1, m):
            out = out.unionByName(
                p.withColumn("p_partkey", F.col("p_partkey") + i * span)
                .withColumn("p_retailprice", F.col("p_retailprice") + i * 0.0001)
            )
        per_price = out.groupBy("p_retailprice").agg(F.max("p_size").alias("_best"))
        frontier = two_level_cummax(
            per_price, "p_retailprice", "_best", out_col="_pb", block_width=16.0
        )
        return out.join(
            frontier.select("p_retailprice", "_pb"), "p_retailprice"
        ).filter(F.col("_pb").isNull() | (F.col("p_size") >= F.col("_pb")))

    def span_removal_op(m):
        # rotated-alphabet copies (see jaccard_op): each copy group keeps
        # its own internal duplication, so frequent spans AND cover sets
        # grow ∝ m — the op must stay ~linear (hash aggs + anti-join only)
        from kafka_connect_logminer2_spark.functions.dedup import (
            remove_dup_spans,
        )

        alpha = "etaoinshr"
        out = docs
        for i in range(1, m):
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            out = out.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + i * span).withColumn(
                    "text", F.translate("text", alpha, rot)
                )
            )
        return remove_dup_spans(out, min_docs=2)

    def bloom_op(m):
        # distinct values per copy (text ⊕ doc_id), half the corpus as the
        # filter's history, probe everything: the bitmap stays m/32 rows
        # regardless of m, so cost must track the k-row explode — linear
        from kafka_connect_logminer2_spark.functions import bloom as B

        d = replicate(docs, m, ["doc_id"], span).withColumn(
            "_v", F.concat("text", F.col("doc_id").cast("string"))
        )
        hist = d.filter(F.col("doc_id") % 2 == 0).select("_v")
        bl = B.bloom_build(hist, F.col("_v"), num_bits=1 << 20)
        return B.bloom_probe(
            d, F.col("_v"), bl, ["doc_id"], num_bits=1 << 20
        ).groupBy("might_contain").count()

    def cross_modal_op(m):
        # m× clips AND m× images (content-distinct seeds): candidates stay
        # truth-sized (planted pairs only), so cost must track the decode
        # passes + band-key join — linear in total media
        from kafka_connect_logminer2_spark.functions import multimodal as M

        imgs, vids = M.cross_modal_fixture(
            spark, n_clips=4 * m, n_images=8 * m, planted=4
        )
        return M.cross_modal_neardup_pairs(imgs, vids)

    ops = {
        "hash_agg": agg_op,
        "packing_cumsum": packing_cumsum_op,
        "salted_assembly": salted_assembly_op,
        "shard_export": shard_export_op,
        "exact_dedup": dedup_op,
        "topk_window": window_op,
        "cosine_topk": topk_op,
        "asof_join": asof_op,
        "jaccard_pairs": jaccard_op,
        "kmeans_assign": kmeans_assign_op,
        "pipeline_fold": pipeline_fold_op,
        "retention": retention_op,
        "minhash_banded": minhash_banded_op,
        "pii_scrub": pii_scrub_op,
        "int8_quantize": quantize_op,
        "dup_span": dup_span_op,
        "semantic_dedup": semantic_dedup_op,
        "gopher_rules": gopher_rules_op,
        "dsir_weights": dsir_weights_op,
        "bigram_lm": bigram_lm_op,
        "phrase_search": phrase_search_op,
        "heavy_hitters": heavy_hitters_op,
        "graph_degree": graph_degree_op,
        "pagerank3": pagerank_op,
        "zorder_key": zorder_op,
        "winnow_pairs": winnow_op,
        "containment": containment_op,
        "expectations": expectations_op,
        "scd2_pit": scd2_pit_op,
        "skyline_frontier": skyline_op,
        "span_removal": span_removal_op,
        "bloom_probe": bloom_op,
        "cross_modal_neardup": cross_modal_op,
    }

    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, op in ops.items():
        if only is not None and name not in only:
            continue
        op(1).count()  # warm
        times = {}
        for m in MULTIPLIERS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                op(m).count()
                best = min(best, time.time() - t0)
            times[f"x{m}"] = round(best, 3)
        ratio = round(times["x10"] / (10 * times["x1"]), 3) if times["x1"] else None
        print(json.dumps({"op": name, **times, "r10_vs_linear": ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
