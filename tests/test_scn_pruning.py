"""SCN-range partition pruning for the archived change stream (SURVEY §4):
writing the per-table sink with ``scn_range_size`` must let an SCN-bounded
read prune whole partition directories at PLANNING time — PartitionFilters
in the scan and strictly fewer input files — not just filter rows after a
full-history scan. At 100 TB of archived changes this is the difference
between reading one range and reading everything."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.plans.cdc import customer_registry, default_config
from kafka_connect_logminer2_spark.sources.redo import redo_inserts_from_customer
from kafka_connect_logminer2_spark.streaming.pipeline import (
    cdc_stream,
    read_archived_changes,
    read_redo_stream_files,
    write_per_table,
)

RANGE = 1000  # commit SCNs are c_custkey*10+1003 → many distinct ranges


def _archive(spark, sf_dir, tmp):
    redo = redo_inserts_from_customer(spark, sf_dir)
    redo.orderBy("scn").repartitionByRange(4, "scn").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/redo")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/redo/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    q = write_per_table(
        cdc_stream(read_redo_stream_files(spark, f"{tmp}/redo"), default_config()),
        customer_registry(),
        f"{tmp}/out",
        f"{tmp}/ckpt",
        scn_range_size=RANGE,
    )
    assert q.awaitTermination(300)
    return f"{tmp}/out"


def test_scn_bounded_read_prunes_partitions(spark, sf_dir, tmp_path):
    out = _archive(spark, sf_dir, str(tmp_path))

    full = read_archived_changes(spark, out, "TPCH", "CUSTOMER")
    bounded = read_archived_changes(
        spark, out, "TPCH", "CUSTOMER",
        scn_min=2_000, scn_max=2_499, scn_range_size=RANGE,
    )

    # planning-time pruning: the scan carries a PartitionFilter on scn_range
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "scn_range" in plan.split("PartitionFilters:")[1].split("]")[0]
    # ... and the COMMIT_SCN residual is pushed into the parquet reader
    assert "COMMIT_SCN" in plan.split("PushedFilters:")[1].split("]")[0]

    # fewer files actually read, strictly (input_file_name at execution —
    # inputFiles() lists the pre-pruning FileIndex, so it can't see pruning)
    n_full = full.select(F.input_file_name()).distinct().count()
    n_bounded = bounded.select(F.input_file_name()).distinct().count()
    assert n_bounded < n_full, (n_bounded, n_full)

    # and the bounded result is exactly the SCN slice of the full archive
    expect = (
        full.filter((F.col("COMMIT_SCN") >= 2_000) & (F.col("COMMIT_SCN") <= 2_499))
        .count()
    )
    assert bounded.count() == expect > 0


def test_scn_partitioned_archive_round_trips_all_rows(spark, sf_dir, tmp_path):
    """Partitioning must not change the archive's content: the unioned
    partitions hold exactly the rows an unpartitioned sink would."""
    out = _archive(spark, sf_dir, str(tmp_path))
    df = read_archived_changes(spark, out, "TPCH", "CUSTOMER")
    # scenario rule: k%10 in {3,4} never commit → 800/1000 customers at
    # sf0.001-like fixtures; just assert non-empty and key-distinctness here
    assert df.count() == df.select("SCN").distinct().count() > 0
    assert "scn_range" in df.columns
