"""Web two-tier store scale probe (r10 verdict #5): are the per-batch
ingest and takedown costs of the URL-gate + content-near-dup store
INDEPENDENT of the resident page population?

For m in (1, 4, 10): seed both tiers DIRECTLY with m×BASE pages' state —
the URL tier with their canonical-URL fingerprints, the near tier with
their REAL MinHash banded signatures (computed by the production kernel,
so the probe batch's republished pages genuinely collide and the verify
step fires) — then run ONE fixed 1,000-page batch through the full
``ingest_batch_web(content_neardup=True)`` front door (canonicalize →
extract → floor → URL gate → near tier) and ONE 200-page takedown, and
record wall seconds plus the BYTES each tier's delta segments added.

The two-tier claim is the curve shape: seconds and delta-bytes FLAT as
history grows 10× (the batch's work is touched-bucket bounded — reading
the whole store per batch would scale ∝ m). The probe batch is
adversarial: 40% exact URL re-crawls (utm variants → URL tier reject),
30% republished content at new URLs (→ near tier reject), 30% novel.

Usage: python tools/web_store_probe.py [BASE]    # default 10000 pages
Prints one JSON line per m: {"m": ..., "seed_pages": ..., "ingest_sec":
..., "takedown_sec": ..., "url_delta_bytes": ..., "near_delta_bytes":
..., "accepted": ...} — BASELINE.md records them.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_logminer2_spark.functions.dedup import (  # noqa: E402
    minhash_band_keys,
    minhash_signatures,
)
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402
from kafka_connect_logminer2_spark.streaming.corpus_ingest import (  # noqa: E402
    _bucket,
    _ensure_meta,
    _fp,
    _note_row_schema,
    _row_ddl,
    _write_delta,
)
from kafka_connect_logminer2_spark.streaming.snapshot import (  # noqa: E402
    _mark_committed,
)
from kafka_connect_logminer2_spark.streaming.web_ingest import (  # noqa: E402
    ingest_batch_web,
    takedown_batch_web,
)

NB = 16          # num_buckets — ingest_batch_web default
BATCH = 1000     # fixed probe batch size
TAKE = 200       # fixed takedown size
WORDS = 40       # article length (tokens) — above the floor, cheap to hash


def _pages(spark, n, offset=0):
    """n distinct pages (doc_id, url, html) with token-disjoint articles."""
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://site"), F.col("id"), F.lit(".example.com/a"))
        .alias("url"),
        F.concat(
            F.lit("<p>"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(WORDS - 1)),
                    lambda j: F.concat(
                        F.lit("w"), F.col("id"), F.lit("_"), j.cast("string")
                    ),
                ),
            ),
            F.lit("</p>"),
        ).alias("html"),
    )


def _seed(spark, store_dir, pages):
    """Write both tiers' batch-0 state directly (the store mechanics under
    test are the PROBE batch's; seeding through the full front door would
    just re-measure extraction at m×BASE)."""
    from kafka_connect_logminer2_spark.functions.text import (
        html_to_text,
        url_canonicalize,
    )

    url_store = os.path.join(store_dir, "url")
    near_store = os.path.join(store_dir, "near")
    _ensure_meta(url_store, {
        "kind": "exact", "num_buckets": NB, "bloom_bits": None,
        "bloom_hashes": None, "owner_ids": False,
    })
    _ensure_meta(near_store, {
        "kind": "neardup", "num_buckets": NB, "k": 3, "num_hashes": 16,
        "num_bands": 4, "seed": 42, "threshold": 0.5, "bloom_bits": None,
        "bloom_hashes": None,
    })
    canon = pages.select(
        "doc_id", url_canonicalize(F.col("url")).alias("canon"),
        html_to_text(F.col("html")).alias("text"),
    )
    fps = canon.select(_fp("canon").alias("fp")).withColumn(
        "_b", _bucket(F.col("fp"), NB)
    )
    _note_row_schema(url_store, _row_ddl(fps))
    _write_delta(fps, url_store, 0)
    _mark_committed(url_store, 0)
    sigs = minhash_signatures(canon, "text", "doc_id")
    bands = minhash_band_keys(sigs).join(sigs, "id").select(
        "band", "key", "id", "sig"
    ).withColumn(
        "_b", F.pmod(F.xxhash64(F.col("band"), F.col("key")), F.lit(NB)).cast("int")
    )
    _note_row_schema(near_store, _row_ddl(bands))
    _write_delta(bands, near_store, 0)
    _mark_committed(near_store, 0)


def _delta_bytes(store, batch_id):
    return sum(
        os.path.getsize(f)
        for f in glob.glob(f"{store}/b=*/v={batch_id}/*.parquet")
    )


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark(app_name="web_store_probe", extra_conf={
        "spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    for m in (1, 4, 10):
        n = base * m
        tmp = tempfile.mkdtemp(prefix=f"webprobe{m}_")
        try:
            store = f"{tmp}/store"
            _seed(spark, store, _pages(spark, n))
            # probe batch: 400 utm re-crawls of history URLs, 300 history
            # articles republished at NEW urls, 300 novel pages
            recrawl = _pages(spark, 400, offset=0).withColumn(
                "url", F.concat(F.col("url"), F.lit("?utm_x=1"))
            )
            repub = _pages(spark, 300, offset=500).withColumn(
                "url",
                F.concat(F.lit("http://mirror"), F.col("doc_id"),
                         F.lit(".example.net/copy")),
            ).withColumn("doc_id", F.col("doc_id") + 10_000_000)
            novel = _pages(spark, 300, offset=20_000_000)
            batch = recrawl.unionByName(repub).unionByName(novel)
            batch = batch.localCheckpoint()  # synthesis out of the timing
            t0 = time.time()
            ingest_batch_web(
                spark, batch, 1, f"{tmp}/out", store,
                min_tokens=5, content_neardup=True,
            )
            ingest_sec = time.time() - t0
            accepted = spark.read.parquet(f"{tmp}/out/batch=1").count()
            takedown = _pages(spark, TAKE, offset=1000).select("doc_id", "url")
            takedown = takedown.localCheckpoint()
            t0 = time.time()
            takedown_batch_web(
                spark, takedown, 2, store, content_neardup=True
            )
            takedown_sec = time.time() - t0
            print(json.dumps({
                "m": m, "seed_pages": n,
                "ingest_sec": round(ingest_sec, 2),
                "takedown_sec": round(takedown_sec, 2),
                "url_delta_bytes": _delta_bytes(f"{store}/url", 1),
                "near_delta_bytes": _delta_bytes(f"{store}/near", 1),
                "accepted": accepted,
            }), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
