"""Source-format parity: the CDC pipeline must produce identical committed
envelopes whether the redo stream arrives as parquet, JSON-lines, or CSV."""

from __future__ import annotations

import pytest

from kafka_connect_logminer2_spark.plans.cdc import run_cdc_batch
from kafka_connect_logminer2_spark.sources.redo import redo_inserts_from_customer
from kafka_connect_logminer2_spark.sources.redo_files import (
    read_redo_csv,
    read_redo_json,
    read_redo_orc,
    write_redo_csv,
    write_redo_json,
    write_redo_orc,
)


def _shape(df):
    # file readers surface every field nullable; names+types are the contract
    return [(f.name, f.dataType) for f in df.schema.fields]


def _envelopes(out):
    rows = out.select("SCN", "COMMIT_SCN", "OPERATION", "data").collect()
    return sorted((r.SCN, r.COMMIT_SCN, r.OPERATION, str(r.data)) for r in rows)


@pytest.fixture(scope="module")
def redo(spark, sf_dir):
    return redo_inserts_from_customer(spark, sf_dir)


@pytest.fixture(scope="module")
def parquet_result(spark, redo):
    return _envelopes(run_cdc_batch(redo))


def test_json_roundtrip_matches_parquet(spark, redo, parquet_result, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("redo_json"))
    write_redo_json(redo, path)
    back = read_redo_json(spark, path)
    assert _shape(back) == _shape(redo)
    assert _envelopes(run_cdc_batch(back)) == parquet_result


def test_csv_roundtrip_matches_parquet(spark, redo, parquet_result, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("redo_csv"))
    write_redo_csv(redo, path)
    back = read_redo_csv(spark, path)
    assert _shape(back) == _shape(redo)
    assert _envelopes(run_cdc_batch(back)) == parquet_result


def test_orc_roundtrip_matches_parquet(spark, redo, parquet_result, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("redo_orc"))
    write_redo_orc(redo, path)
    back = read_redo_orc(spark, path)
    assert _shape(back) == _shape(redo)
    assert _envelopes(run_cdc_batch(back)) == parquet_result
