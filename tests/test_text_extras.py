"""Repetition features and PII redaction: semantics + Spark/DuckDB parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from suggest_spark.functions.text import (
    duckdb_pii_sql,
    duckdb_repetition_sql,
    pii_counts,
    redact_pii,
    repetition_features,
)

DOCS = [
    (0, "a b c d"),                               # all distinct
    (1, "a a a a"),                               # 3/4 duplicate words
    (2, "one line\none line\nother line"),        # dup lines + dup bigram
    (3, ""),                                      # empty: all ratios 0
    (4, "x y x y x y"),                           # bigrams 'x y'×3,'y x'×2
    (5, "Visit https://ex.io/p?q=1 now"),
    (6, "mail bob.smith+tag@sub.example.co.uk ok"),
    (7, "call +1 (555) 123-4567 today"),
    (8, "no pii here at all"),
]


def _spark_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rep = repetition_features(F.col("text"))
    pii = pii_counts(F.col("text"))
    out = df.select(
        "doc_id",
        *[c.alias(n) for n, c in rep.items()],
        *[c.alias(n) for n, c in pii.items()],
        redact_pii(F.col("text")).alias("redacted"),
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_repetition_semantics(spark):
    rows = _spark_rows(spark)
    assert rows[0]["dup_word_ratio"] == 0.0
    assert rows[1]["dup_word_ratio"] == 0.75
    assert rows[1]["dup_bigram_ratio"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows[2]["dup_line_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[3] == {
        "doc_id": 3, "dup_line_ratio": 0.0, "dup_word_ratio": 0.0,
        "dup_bigram_ratio": 0.0, "n_urls": 0, "n_emails": 0, "n_phones": 0,
        "redacted": "",
    }
    assert rows[4]["dup_bigram_ratio"] == 0.6  # 5 bigrams, 2 distinct


def test_pii_redaction_semantics(spark):
    rows = _spark_rows(spark)
    assert rows[5]["n_urls"] == 1 and rows[5]["redacted"] == "Visit <URL> now"
    assert rows[6]["n_emails"] == 1 and rows[6]["redacted"] == "mail <EMAIL> ok"
    assert rows[7]["n_phones"] == 1 and rows[7]["redacted"] == "call <PHONE> today"
    assert rows[8]["redacted"] == "no pii here at all"


def test_duckdb_parity(spark):
    got = _spark_rows(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in [(i, t.replace("\n", "' || chr(10) || '")) for i, t in DOCS])
        + ") AS t(doc_id, text)"
    )
    rep = duckdb_repetition_sql("text")
    pii = duckdb_pii_sql("text")
    cols = ", ".join(
        [f"{e} AS {n}" for n, e in rep.items()]
        + [f"{e} AS {n}" for n, e in pii.items()]
    )
    want = {
        int(r[0]): dict(zip(["doc_id"] + list(rep) + list(pii), r))
        for r in con.sql(f"SELECT doc_id, {cols} FROM d").fetchall()
    }
    for i in range(len(DOCS)):
        for k, v in want[i].items():
            g = got[i][k]
            if isinstance(v, float):
                assert g == pytest.approx(v, abs=1e-9), (i, k)
            else:
                assert g == v, (i, k, g, v)
