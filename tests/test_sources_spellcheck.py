"""Dictionary sources, Google n-gram format round-trip, next-word goldens,
spellchecker Predict, and the auxiliary analysis filters (P8-P10)."""

import pytest
from pyspark.sql import functions as F

from suggest_spark.config import DEFAULT_CONFIG, IndexConfig
from suggest_spark.functions.analysis import (
    alphabet_word_tokens_col,
    light_stem_col,
    sentence_split_col,
    stop_words_filter_col,
    word_tokens_col,
)
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.lm import (
    build_ngram_counts,
    next_word_scores,
    read_google_ngram_format,
    write_google_ngram_format,
)
from suggest_spark.operators.spellcheck import predict
from suggest_spark.sources.dictionary import (
    from_list,
    read_dictionary,
    read_line_dictionary,
    write_dictionary,
)

CORPUS = [
    "i am sam",
    "sam i am",
    "i do not like green eggs and ham",
]


def test_line_dictionary_ids_follow_line_order(spark, tmp_path):
    p = tmp_path / "words.dict"
    p.write_text("alpha\nbeta\ngamma\ndelta\n")
    df = read_line_dictionary(spark, str(p))
    rows = {r["doc_id"]: r["value"] for r in df.collect()}
    assert rows == {0: "alpha", 1: "beta", 2: "gamma", 3: "delta"}


def test_dictionary_parquet_roundtrip(spark, tmp_path):
    d = from_list(spark, ["x", "y"])
    path = str(tmp_path / "dict")
    write_dictionary(d, path)
    back = read_dictionary(spark, path)
    assert sorted((r["doc_id"], r["value"]) for r in back.collect()) == [(0, "x"), (1, "y")]


def test_google_ngram_format_roundtrip(spark, tmp_path):
    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    out = str(tmp_path / "gngrams")
    write_google_ngram_format(counts, out)
    back = read_google_ngram_format(spark, out, 3)
    for k in (1, 2, 3):
        want = {(r["gram"], r["cnt"]) for r in counts[k].collect()}
        got = {(r["gram"], r["cnt"]) for r in back[k].collect()}
        assert got == want, k


# ngram_model_test.go:28-88 goldens (raw model.Next — no context wrapping)
@pytest.mark.parametrize(
    "context,word,expected",
    [
        (["i", "am"], "sam", -0.6931),
        (["i", "am"], "</S>", -0.6931),
        (["i"], "am", -0.4054),
        (["i"], "do", -1.0986),
        (["green"], "eggs", 0.0),
    ],
)
def test_next_word_goldens(spark, context, word, expected):
    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    got = {
        r["word"]: r["score"]
        for r in next_word_scores(context, counts, 3, wrap_context=False).collect()
    }
    assert word in got
    assert abs(got[word] - expected) < 1e-4


def test_spellchecker_ranking_stays_in_plan(spark):
    """Scale guard (VERDICT r1 'what's wrong' #1): the candidate ranking must
    compile to a distributed partial top-k (TakeOrderedAndProject), and the
    vocabulary must never be collected — only the ≤topk survivors join back
    to it."""
    from suggest_spark.operators.spellcheck import ranked_candidates

    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    cfg = IndexConfig(ngram_size=2)
    vocab = from_list(spark, sorted({w for s in CORPUS for w in s.split()}))
    index = build_ngram_index(vocab, config=cfg)

    plan_df = ranked_candidates(
        vocab, index, counts, 3, "a", ["sam", "i"], topk=2, config=cfg
    )
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = plan_df.collect()
    assert 0 < len(rows) <= 2


def test_spellchecker_eval_harness(spark):
    """Batch eval (cmd/spellchecker/cmd/eval.go analogue): on the sam corpus
    with 2-char typed prefixes the LM-guided predictor must recover every
    next word (vocabulary is tiny and every case is in-corpus)."""
    from suggest_spark.operators.spellcheck import evaluate

    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    cfg = IndexConfig(ngram_size=2)
    vocab = from_list(spark, sorted({w for s in CORPUS for w in s.split()})).cache()
    index = build_ngram_index(vocab, config=cfg).cache()

    report = evaluate(
        vocab, index, counts, 3, [CORPUS[0].split()], topk=5, similarity=0.5, config=cfg
    )
    assert report["n_cases"] == 2  # "i am sam" → predict 'am', 'sam'
    assert report["hit_at_k"] == 1.0
    assert report["mrr"] == 1.0


def test_spellchecker_predict(spark):
    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    vocab_words = sorted(
        {w for s in CORPUS for w in s.split()}
    )
    cfg = IndexConfig(ngram_size=2)  # short vocabulary words need bigrams
    vocab = from_list(spark, vocab_words).cache()
    index = build_ngram_index(vocab, config=cfg).cache()

    out = predict(vocab, index, counts, 3, "sam i a", topk=2, similarity=0.4,
                  config=cfg)
    # context ["sam","i"], word "a" → "am" (c("sam i am")/c("sam i") = 1) wins
    assert out[0] == "am"

    # no-context query falls back to autocomplete order
    out2 = predict(vocab, index, counts, 3, "gre", topk=3, similarity=0.4,
                   config=cfg)
    assert "green" in out2

    assert predict(vocab, index, counts, 3, "", 3, 0.4, cfg) == []


def test_analysis_filters(spark):
    df = spark.createDataFrame(
        [("The cats were running; dogs ran. And fish swim!",)], "text string"
    )
    words = alphabet_word_tokens_col(F.col("text"))
    row = df.select(
        words.alias("w"),
        stop_words_filter_col(words).alias("nostop"),
        light_stem_col(words).alias("stems"),
        sentence_split_col(F.col("text")).alias("sents"),
    ).first()
    assert row["w"][:3] == ["the", "cats", "were"]
    assert "the" not in row["nostop"] and "and" not in row["nostop"]
    assert "runn" in row["stems"] or "running" not in row["stems"]
    assert row["sents"] == [
        "The cats were running; dogs ran",
        "And fish swim",
    ]


def test_build_spellchecker_from_persisted_lm(spark, tmp_path):
    """dep.BuildSpellChecker analogue: persist LM counts in Google format,
    rebuild a ready spellchecker from the files alone, and reproduce the
    in-memory predict goldens."""
    from suggest_spark.operators.lm import write_google_ngram_format
    from suggest_spark.operators.spellcheck import build_spellchecker

    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    out = str(tmp_path / "lm_out")
    write_google_ngram_format(build_ngram_counts(sents, 3), out)

    sc = build_spellchecker(
        spark, out, 3, config=IndexConfig(ngram_size=2)
    )
    assert sc.predict("sam i a", topk=2, similarity=0.4)[0] == "am"
    assert "green" in sc.predict("gre", topk=3, similarity=0.4)
    assert sc.predict("", 3, 0.4) == []
    # vocabulary derived from the 1-gm file, wrap symbols excluded
    vocab_vals = {r["value"] for r in sc.vocab.collect()}
    assert "<S>" not in vocab_vals and "</S>" not in vocab_vals
    assert "sam" in vocab_vals


def test_vocab_from_unigrams_matches_sorted_collect(spark):
    """The distributed id assignment must equal the driver-side sorted
    enumeration exactly (determinism of sortBy + zipWithIndex)."""
    from suggest_spark.operators.spellcheck import vocab_from_unigrams

    grams = ["zeta", "<S>", "alpha", "</S>", "mu", "beta", "alpha2"]
    df = spark.createDataFrame([(g, 1) for g in grams], "gram string, cnt long")
    got = sorted(
        (r["doc_id"], r["value"])
        for r in vocab_from_unigrams(df, "<S>", "</S>").collect()
    )
    want = list(enumerate(sorted(g for g in grams if g not in ("<S>", "</S>"))))
    assert got == want
