"""Language-model goldens from /root/reference/pkg/lm:

* n-gram count fixtures (testdata/fixtures/{1,2,3}-gm over the sam-corpus)
* stupid-backoff sentence scores (language_model_test.go:50-60, tol 1e-4)
"""

import pytest

from suggest_spark.operators.lm import (
    build_counts_py,
    build_ngram_counts,
    score_py,
    score_sentences,
)

CORPUS = [
    ["i", "am", "sam"],
    ["sam", "i", "am"],
    ["i", "do", "not", "like", "green", "eggs", "and", "ham"],
]

# exact lines from testdata/fixtures/1-gm..3-gm
GOLDEN_1GM = {
    "i": 3, "sam": 2, "</S>": 3, "eggs": 1, "like": 1, "green": 1, "and": 1,
    "ham": 1, "<S>": 3, "am": 2, "do": 1, "not": 1,
}
GOLDEN_2GM = {
    "i am": 2, "i do": 1, "sam i": 1, "sam </S>": 1, "eggs and": 1,
    "like green": 1, "green eggs": 1, "and ham": 1, "ham </S>": 1, "<S> i": 2,
    "<S> sam": 1, "am sam": 1, "am </S>": 1, "do not": 1, "not like": 1,
}
GOLDEN_SCORES = [
    (["i", "am", "sam"], -1.3862),
    (["i", "am"], -1.3862),
    (["sam", "i", "am"], -0.6931),
    (["sam", "am", "i"], -10.2852),
    (["i", "dont", "know"], -105.0514),
    (["no", "one", "word"], -203.7297),
]

TOL = 1e-4


def test_counts_py_match_fixtures():
    counts = build_counts_py(CORPUS, 3)
    assert counts[1] == GOLDEN_1GM
    assert counts[2] == GOLDEN_2GM
    assert counts[3]["i am sam"] == 1
    assert counts[3]["<S> i am"] == 1


@pytest.mark.parametrize("sentence,expected", GOLDEN_SCORES)
def test_score_py_goldens(sentence, expected):
    counts = build_counts_py(CORPUS, 3)
    assert abs(score_py(sentence, counts, 3) - expected) < TOL


def test_spark_counts_match_fixtures(spark):
    sents = spark.createDataFrame(
        [(i, " ".join(s)) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    got1 = {r["gram"]: r["cnt"] for r in counts[1].collect()}
    got2 = {r["gram"]: r["cnt"] for r in counts[2].collect()}
    assert got1 == GOLDEN_1GM
    assert got2 == GOLDEN_2GM


def test_spark_scores_match_goldens(spark):
    sents = spark.createDataFrame(
        [(i, " ".join(s)) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    queries = spark.createDataFrame(
        [(i, " ".join(s)) for i, (s, _) in enumerate(GOLDEN_SCORES)],
        "sent_id long, text string",
    )
    got = {r["sent_id"]: r["score"] for r in score_sentences(queries, counts, 3).collect()}
    for i, (sentence, expected) in enumerate(GOLDEN_SCORES):
        assert abs(got[i] - expected) < TOL, (sentence, got[i], expected)


def test_short_sentence_scores_zero(spark):
    sents = spark.createDataFrame([(0, "i am sam")], "sent_id long, text string")
    counts = build_ngram_counts(sents, 3)
    # empty sentence → wrapped length 2 < order → no grams → 0.0
    q = spark.createDataFrame([(0, "")], "sent_id long, text string")
    got = score_sentences(q, counts, 3).collect()
    assert got[0]["score"] == 0.0
    assert score_py([], build_counts_py(CORPUS, 3), 3) == 0.0
