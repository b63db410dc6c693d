"""Language-model goldens from /root/reference/pkg/lm:

* n-gram count fixtures (testdata/fixtures/{1,2,3}-gm over the sam-corpus)
* stupid-backoff sentence scores (language_model_test.go:50-60, tol 1e-4)
* full analysis-chain parity: the REAL reference corpus file (test.txt) run
  through the LMConfig chain (separator sentence retrieval + alphabet word
  tokenization, pkg/lm/sentence_retriever.go + pkg/lm/tokenizer.go) must
  reproduce the reference's own generated fixtures byte-for-byte, and
  punctuation-bearing text must match the pure-Python reference port.
"""

import os

import pytest

from suggest_spark.operators.lm import (
    LMConfig,
    build_counts_chain_py,
    build_counts_py,
    build_ngram_counts,
    score_py,
    score_sentences,
    sentences_py,
)

REF_LM_TESTDATA = "/root/reference/pkg/lm/testdata"
#: pkg/lm/testdata/config-example.json — the config that generated fixtures/
REF_LM_CONFIG = LMConfig(
    order=3, alphabet=("english", "russian", "numbers", "-."), separators="\n"
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


# ---------------------------------------------------------------------------
# reference analysis-chain parity (LMConfig path)
# ---------------------------------------------------------------------------

PUNCT_CORPUS = [
    "Sam, I am. I do not like green-eggs!",
    "Do you like Green Eggs?  No...\nI do NOT.",
    "!!!",  # sentence with zero words → skipped entirely
]
PUNCT_CFG = LMConfig(
    order=3, alphabet=("english", "numbers", "-"), separators=".?!\n"
)


def _read_ref_fixture(k: int) -> dict[str, int]:
    out = {}
    with open(f"{REF_LM_TESTDATA}/fixtures/{k}-gm") as f:
        for line in f:
            gram, cnt = line.rstrip("\n").split("\t")
            out[gram] = int(cnt)
    return out


def test_sentence_retriever_chain_py():
    # scanSentence skips leading separators; zero-word sentences dropped
    assert sentences_py("Sam, I am. I do not!", PUNCT_CFG) == [
        ["sam", "i", "am"],
        ["i", "do", "not"],
    ]
    assert sentences_py("...!?", PUNCT_CFG) == []
    # '-' is an alphabet rune → 'green-eggs' is ONE word; ',' separates words
    assert sentences_py("green-eggs, ham", PUNCT_CFG) == [["green-eggs", "ham"]]


def test_chain_counts_match_reference_generated_fixtures(spark):
    """The reference's own test.txt through our LMConfig chain must equal the
    reference's own generated Google-format fixtures exactly."""
    with open(f"{REF_LM_TESTDATA}/test.txt") as f:
        raw = f.read()
    docs = spark.createDataFrame([(0, raw)], "doc_id long, text string")
    counts = build_ngram_counts(docs, 3, config=REF_LM_CONFIG)
    for k in (1, 2, 3):
        got = {r["gram"]: r["cnt"] for r in counts[k].collect()}
        assert got == _read_ref_fixture(k), f"order {k} mismatch"


def test_chain_counts_punctuation_golden(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PUNCT_CORPUS)], "doc_id long, text string"
    )
    counts = build_ngram_counts(docs, 3, config=PUNCT_CFG)
    golden = build_counts_chain_py(PUNCT_CORPUS, PUNCT_CFG)
    for k in (1, 2, 3):
        got = {r["gram"]: r["cnt"] for r in counts[k].collect()}
        assert got == golden[k], f"order {k} mismatch"
    # the chain must actually differ from the whitespace path on this corpus
    ws_counts = build_ngram_counts(docs, 3)
    ws1 = {r["gram"]: r["cnt"] for r in ws_counts[1].collect()}
    assert ws1 != golden[1]


def test_chain_scores_punctuation_golden(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PUNCT_CORPUS)], "doc_id long, text string"
    )
    counts = build_ngram_counts(docs, 3, config=PUNCT_CFG)
    golden_counts = build_counts_chain_py(PUNCT_CORPUS, PUNCT_CFG)
    queries = [
        (0, "Sam, I am."),
        (1, "i do not like green-eggs"),
        (2, "totally unknown words here"),
        (3, ""),
    ]
    q = spark.createDataFrame(queries, "sent_id long, text string")
    got = {
        r["sent_id"]: r["score"]
        for r in score_sentences(q, counts, 3, config=PUNCT_CFG).collect()
    }
    from suggest_spark.operators.lm import lm_word_tokens_py

    for sid, text in queries:
        # ScoreSentence tokenizes the whole query (no sentence split)
        expected = score_py(lm_word_tokens_py(text, PUNCT_CFG), golden_counts, 3)
        assert abs(got[sid] - expected) < TOL, (text, got[sid], expected)


def test_short_sentence_scores_zero(spark):
    sents = spark.createDataFrame([(0, "i am sam")], "sent_id long, text string")
    counts = build_ngram_counts(sents, 3)
    # empty sentence → wrapped length 2 < order → no grams → 0.0
    q = spark.createDataFrame([(0, "")], "sent_id long, text string")
    got = score_sentences(q, counts, 3).collect()
    assert got[0]["score"] == 0.0
    assert score_py([], build_counts_py(CORPUS, 3), 3) == 0.0
