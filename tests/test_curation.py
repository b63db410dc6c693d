"""Corpus curation chain (operators/curation.py): reason precedence, dedup
winner, funnel completeness."""

from pyspark.sql import functions as F

from suggest_spark.operators.curation import (
    CurationConfig,
    curate_documents,
    curation_funnel,
)

CFG = CurationConfig(
    langs=("en",),
    min_words=4,
    max_words=12,
    min_alpha_ratio=0.5,
    max_digit_ratio=0.3,
    min_stopword_ratio=0.1,
)

EN_OK = "the quick brown fox jumps over the lazy dog"  # passes everything
DOCS = [
    (1, EN_OK),                                        # kept (dedup winner)
    (2, EN_OK),                                        # duplicate of 1
    (3, "der hund und die katze sind nicht hier oder da"),  # lang (de)
    (4, "the cat sat"),                                # too_short (3 words)
    (5, "the " * 12 + "end"),                          # too_long (13 words)
    (6, "!!! ??? ... --- === +++ *** the fox"),        # low_alpha
    # alpha .51 / digit .35: passes alpha, fails digit
    (7, "abcdefgh 123456789 stuvwxyz 987654321 the fox runs"),
    # 11 words, 1 en stopword: lang=en but ratio .09 < .1
    (8, "the zebra quokka xylophone marimba glockenspiel vibraphone cello oboe flute drums"),
    (9, EN_OK + " again today"),                       # kept
]


def test_reasons_and_dedup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    funnel = {r["reason"]: r["n_docs"] for r in curation_funnel(docs, CFG).collect()}
    assert funnel == {
        "kept": 2,
        "duplicate": 1,
        "lang": 1,
        "too_short": 1,
        "too_long": 1,
        "low_alpha": 1,
        "high_digit": 1,
        "low_stopword": 1,
    }
    kept = curate_documents(docs, CFG)
    assert {r["doc_id"] for r in kept.collect()} == {1, 9}  # lowest id wins the dup


def test_failing_doc_never_claims_content_key(spark):
    """A text that FAILS a filter must not shadow an identical passing text:
    here the duplicate pair is (filtered short doc, passing doc) with equal
    bytes — impossible by construction (same text → same features), so test
    the adjacent hazard instead: a failing doc's content key must not mark
    a DIFFERENT passing doc as duplicate."""
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, EN_OK)], "doc_id long, text string"
    )
    kept = curate_documents(docs, CFG)
    assert {r["doc_id"] for r in kept.collect()} == {2}


def test_no_python_udf_in_plan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = curate_documents(docs, CFG)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # whole chain stays JVM-side


def test_funnel_sums_to_input(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    total = curation_funnel(docs, CFG).agg(F.sum("n_docs")).first()[0]
    assert total == len(DOCS)


def test_repetition_stage(spark):
    """Repetition caps slot into the funnel between quality filters and
    dedup; disabled (1.0) by default."""
    cfg = CurationConfig(
        langs=("en",), min_words=4, max_words=50, min_alpha_ratio=0.3,
        max_digit_ratio=0.5, min_stopword_ratio=0.05, max_dup_word_ratio=0.4,
    )
    docs = spark.createDataFrame(
        [(1, EN_OK), (2, "the fox the fox the fox the fox")],  # dup_word .75
        "doc_id long, text string",
    )
    funnel = {r["reason"]: r["n_docs"] for r in curation_funnel(docs, cfg).collect()}
    assert funnel == {"kept": 1, "rep_word": 1}
