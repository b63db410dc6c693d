"""Mirror of the driver's correctness gate: every ``queries()`` entry must
match its ``oracle_sql()`` DuckDB result — row count, schema shape, and exact
values (columns sorted by name, rows sorted by all columns)."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    assert sql is not None, f"{name} has no oracle"

    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(duck.sql(sql).df())

    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: rows spark={len(got)} duck={len(want)}"
    assert len(got) > 0, f"{name}: empty result proves nothing"
    for col in got.columns:
        a, b = got[col], want[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, atol=0, rtol=0
            )
        else:
            assert a.astype(object).tolist() == b.astype(object).tolist(), f"{name}.{col}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"query_id", "doc_id", "score", "rank"} <= set(df.columns)
