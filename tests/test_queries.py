"""Query-suite differential tests vs DuckDB at sf0.001 (the fast tier; the
driver re-runs the same comparison at sf0.01). One test per oracle-paired
query, parameterized — plus rows-only sanity for the unpaired ones."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kafka_connect_logminer2_spark.plans.queries import QUERY_REGISTRY
from kafka_connect_logminer2_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLE_QUERIES = [n for n, (_, sql) in QUERY_REGISTRY.items() if sql is not None]
ROWS_ONLY = [n for n, (_, sql) in QUERY_REGISTRY.items() if sql is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = QUERY_REGISTRY[name]
    s = normalize(fn(spark, sf_dir).toPandas())
    d = normalize(duck.execute(sql).fetchdf())
    assert list(s.columns) == list(d.columns)
    assert len(s) == len(d)
    pd.testing.assert_frame_equal(s, d, check_dtype=False)


def test_registry_is_fully_oracle_paired():
    """Since r9 every registry entry carries oracle SQL (q105, the last
    rows-only holdout, emits gate rows) — the old rows-only smoke test
    would otherwise silently skip on its empty parametrization. The
    same-commit enforcement lives in tests/test_registry_hygiene.py."""
    assert ROWS_ONLY == []
