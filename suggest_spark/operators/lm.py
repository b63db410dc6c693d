"""Word n-gram language model with stupid-backoff scoring.

Reference semantics (/root/reference/pkg/lm):

* Count tables: sentences are wrapped with start/end symbols
  (language_model.go:119-132: ``<S> w1 .. wn </S>``) and every k-gram for
  k = 1..order is counted (ngram_builder.go:19-39 via CountTrie.Put);
  persisted in Google n-gram format ``gram\\tcount`` (ngram_writer.go:21-76).
* Scoring (language_model.go:84-92 ScoreWordIDs → ngram_model.go:44-65 Score
  → :162-175 calcScore): the wrapped sentence is split into FULL order-grams
  only (generator.go:9-23 — shorter sentences yield no grams and score 0);
  each gram g = (w_1..w_k) has the count chain
  ``[corpus_total, c1(w_1), c2(w_1 w_2), .., ck(g)]`` and contributes
  ``log(0.4^b · chain[i] / chain[i-1])`` for the largest i with
  chain[i] > 0 (b = order − i backoff steps), else −100
  (UnknownWordScore ngram_model.go:23-24, alpha = 0.4 :25).
  ``corpus_total`` = sum of ALL unigram counts incl. wrap symbols
  (ngram_vector CorpusCount).

Spark form: counts are DataFrames ``(gram string, cnt long)`` per order;
scoring is explode → one left join per order on the gram prefixes → a single
CASE cascade — no Python anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import _escape_for_char_class, char_class

ALPHA = 0.4  # pkg/lm/ngram_model.go:25
UNKNOWN = -100.0  # pkg/lm/ngram_model.go:23-24
START, END = "<S>", "</S>"


@dataclass(frozen=True)
class LMConfig:
    """LM build configuration, mirroring the reference's lm.Config
    (pkg/lm/config.go:14-29): a words alphabet, a separators alphabet and
    wrap symbols.  The corpus chain is then exactly
    pkg/lm/sentence_retriever.go:23-81 + pkg/lm/tokenizer.go:25-30:

    1. split the raw text into sentences on runs of separator runes
       (empty pieces are never produced — leading separators are skipped);
    2. per sentence: lowercase, then word-tokenize as MAXIMAL RUNS of
       alphabet runes (pkg/analysis/word_tokenizer.go:22-47);
    3. sentences with zero words are skipped
       (pkg/lm/ngram_builder.go:52-54);
    4. wrap each sentence with start/end symbols and count all k-grams.

    The alphabet accepts the same named groups as IndexConfig
    (pkg/alphabet/alphabet.go) plus literal strings; the reference's example
    config (pkg/lm/testdata/config-example.json) is the default here.
    """

    order: int = 3
    alphabet: tuple[str, ...] = ("english", "russian", "numbers", "-.")
    separators: str = "\n"
    start: str = START
    end: str = END

    @property
    def word_char_class(self) -> str:
        return char_class(self.alphabet)

    @property
    def separator_char_class(self) -> str:
        return _escape_for_char_class(self.separators)


def lm_word_tokens_col(text: Column, config: LMConfig) -> Column:
    """lm.Tokenizer chain on one string: lowercase → maximal alphabet-rune
    runs (pkg/lm/tokenizer.go:25-30; the Trim(text, " ") there is a no-op
    because ' ' is never an alphabet rune)."""
    return F.filter(
        F.split(F.lower(text), f"[^{config.word_char_class}]+"), lambda w: w != ""
    )


def sentence_words_col(text: Column, config: LMConfig) -> Column:
    """``array<array<string>>`` of per-sentence word lists (zero-word
    sentences dropped) — the distributed form of SentenceRetriever +
    lm.Tokenizer (pkg/lm/sentence_retriever.go:54-81 scanSentence)."""
    sents = F.split(text, f"[{config.separator_char_class}]+")
    words = F.transform(sents, lambda s: lm_word_tokens_col(s, config))
    return F.filter(words, lambda ws: F.size(ws) > 0)


def _wrapped_words(text_col, config: LMConfig | None = None):
    if config is not None:
        words = lm_word_tokens_col(text_col, config)
        return F.concat(
            F.array(F.lit(config.start)), words, F.array(F.lit(config.end))
        )
    words = F.filter(F.split(F.lower(F.trim(text_col)), r"\s+"), lambda w: w != "")
    return F.concat(F.array(F.lit(START)), words, F.array(F.lit(END)))


def build_ngram_counts(
    sentences: DataFrame,
    order: int,
    text_col: str = "text",
    config: LMConfig | None = None,
) -> dict[int, DataFrame]:
    """Count tables for k = 1..order over wrapped sentences
    (NGramBuilder semantics, ngram_builder.go:19-39).

    With ``config=None`` each input row is ONE sentence and words split on
    whitespace (the plain corpus path, identical to the reference on its
    sam-corpus fixtures).  With an :class:`LMConfig`, each input row is a
    DOCUMENT run through the full reference chain — separator sentence
    retrieval + alphabet word tokenization — before wrapping/counting.
    """
    if config is not None:
        wrapped = sentences.select(
            F.explode(sentence_words_col(F.col(text_col), config)).alias("w")
        ).select(
            F.concat(
                F.array(F.lit(config.start)), F.col("w"), F.array(F.lit(config.end))
            ).alias("ws")
        )
    else:
        wrapped = sentences.select(_wrapped_words(F.col(text_col)).alias("ws"))
    out: dict[int, DataFrame] = {}

    def _make_gram(k: int):
        # NB: transform lambdas must be unary — a second parameter would be
        # bound to the element index by Spark, not the enclosing k
        return lambda i: F.concat_ws(" ", F.slice("ws", i, k))

    for k in range(1, order + 1):
        grams = F.transform(
            F.sequence(F.lit(1), F.size("ws") - F.lit(k - 1)), _make_gram(k)
        )
        out[k] = (
            wrapped.where(F.size("ws") >= k)
            .select(F.explode(grams).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return out


def score_sentences(
    sentences: DataFrame,
    counts: dict[int, DataFrame],
    order: int,
    id_col: str = "sent_id",
    text_col: str = "text",
    config: LMConfig | None = None,
) -> DataFrame:
    """``(sent_id, score)`` stupid-backoff log score per sentence.

    The count tables are broadcast (an LM count table is tiny next to a
    corpus); the per-gram backoff is one CASE expression, summed per
    sentence by a hash aggregate.

    With an :class:`LMConfig`, tokenization matches languageModel
    .ScoreSentence's input chain — lowercase + alphabet word runs, NO
    sentence split (a score query is one sentence by definition,
    pkg/lm/language_model.go:64-92).
    """
    corpus_total = counts[1].agg(F.sum("cnt")).first()[0]

    wrapped = sentences.select(
        F.col(id_col).alias("sent_id"),
        _wrapped_words(F.col(text_col), config).alias("ws"),
    )
    grams = wrapped.where(F.size("ws") >= order).select(
        "sent_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - F.lit(order - 1)),
                lambda i: F.slice("ws", i, order),
            )
        ).alias("g"),
    )
    # prefix strings g[:k] for k = 1..order
    for k in range(1, order + 1):
        grams = grams.withColumn(f"p{k}", F.concat_ws(" ", F.slice("g", 1, k)))

    joined = grams
    for k in range(1, order + 1):
        ck = counts[k].select(F.col("gram").alias(f"p{k}"), F.col("cnt").alias(f"c{k}"))
        joined = joined.join(F.broadcast(ck), f"p{k}", "left")
    joined = joined.fillna({f"c{k}": 0 for k in range(1, order + 1)})

    # calcScore cascade: largest k with c_k > 0 wins; factor 0.4^(order-k)
    expr = F.lit(UNKNOWN)
    for k in range(1, order + 1):  # build from k=1 up so higher k overrides
        factor = ALPHA ** (order - k)
        denom = F.col(f"c{k-1}").cast("double") if k > 1 else F.lit(float(corpus_total))
        expr = F.when(
            F.col(f"c{k}") > 0,
            F.log(F.lit(factor) * F.col(f"c{k}").cast("double") / denom),
        ).otherwise(expr)

    scored = joined.withColumn("gram_score", expr)
    return (
        scored.groupBy("sent_id")
        .agg(F.sum("gram_score").alias("score"))
        .unionByName(
            # sentences shorter than the order yield no grams → score 0.0
            wrapped.where(F.size("ws") < order).select(
                "sent_id", F.lit(0.0).alias("score")
            )
        )
    )


def write_google_ngram_format(counts: dict[int, DataFrame], out_dir: str) -> None:
    """S7: Google n-gram format sink — ``<w1 w2..>\\t<count>`` in ``k-gm``
    files (reference: pkg/lm/ngram_writer.go:21-76)."""
    for k, df in counts.items():
        (
            df.select("gram", "cnt")
            .write.mode("overwrite")
            .option("sep", "\t")
            .csv(f"{out_dir}/{k}-gm")
        )


def read_google_ngram_format(spark, out_dir: str, order: int) -> dict[int, DataFrame]:
    """S8: Google n-gram format source (reference: pkg/lm/ngram_reader.go:26-98)."""
    out: dict[int, DataFrame] = {}
    for k in range(1, order + 1):
        out[k] = (
            spark.read.option("sep", "\t")
            .schema("gram string, cnt long")
            .csv(f"{out_dir}/{k}-gm")
        )
    return out


def adjust_context(context: list[str], order: int) -> list[str]:
    """languageModel.Next's context adjustment (language_model.go:100-113):
    shorter contexts are left-wrapped with <S>; longer ones keep the
    trailing order−1 words; an exactly-order context drops its last word.
    Single source of truth — :func:`next_word_scores` and the batched
    spellchecker (spellcheck.py) both call this; their per-case/batch
    equality is a tested parity invariant."""
    ctx = [w.lower() for w in context]
    if len(ctx) + 1 < order:
        ctx = [START] + ctx
    elif len(ctx) > order:
        ctx = ctx[len(ctx) - order + 1 :]
    elif len(ctx) == order:
        ctx = ctx[: order - 1]
    return ctx


def next_word_scores(
    context: list[str],
    counts: dict[int, DataFrame],
    order: int,
    wrap_context: bool = True,
) -> DataFrame:
    """L2: next-word candidates for a context (reference:
    pkg/lm/ngram_model.go:67-99 Next + scorer_next.go:15-23 ScoreNext —
    ``score = log(count(context + w) / count(context))``).

    With ``wrap_context`` the context is adjusted the way languageModel.Next
    does (language_model.go:100-113): shorter contexts are left-wrapped with
    <S>; longer ones keep the trailing order−1 words.  ``wrap_context=False``
    matches the raw nGramModel.Next entry point (the ngram_model_test.go
    goldens).  Returns ``(word, score)``.
    """
    ctx = adjust_context(context, order) if wrap_context else [w.lower() for w in context]
    k = len(ctx)
    prefix = " ".join(ctx)

    ctx_count_row = counts[k].where(F.col("gram") == prefix).first()
    if ctx_count_row is None:
        return counts[k + 1].sparkSession.createDataFrame([], "word string, score double")
    ctx_count = ctx_count_row["cnt"]

    children = counts[k + 1].where(
        F.col("gram").startswith(prefix + " ")
    )
    word = F.element_at(F.split(F.col("gram"), " "), -1)
    score = F.log(F.col("cnt").cast("double") / F.lit(float(ctx_count)))
    return children.select(word.alias("word"), score.alias("score"))


# ---------------------------------------------------------------------------
# pure-Python oracle (golden-tested against pkg/lm/language_model_test.go)
# ---------------------------------------------------------------------------


def lm_word_tokens_py(text: str, config: LMConfig) -> list[str]:
    """Pure-Python lm.Tokenizer (lowercase → alphabet-rune runs)."""
    from ..config import allowed_char_set

    allowed = allowed_char_set(config.alphabet)
    words, cur = [], []
    for ch in text.lower():
        if ch in allowed:
            cur.append(ch)
        elif cur:
            words.append("".join(cur))
            cur = []
    if cur:
        words.append("".join(cur))
    return words


def sentences_py(text: str, config: LMConfig) -> list[list[str]]:
    """Pure-Python SentenceRetriever chain: split on separator runs, word-
    tokenize, drop zero-word sentences."""
    seps = set(config.separators)
    pieces, cur = [], []
    for ch in text:
        if ch in seps:
            if cur:
                pieces.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        pieces.append("".join(cur))
    out = []
    for p in pieces:
        ws = lm_word_tokens_py(p, config)
        if ws:
            out.append(ws)
    return out


def build_counts_chain_py(
    texts: list[str], config: LMConfig
) -> dict[int, dict[str, int]]:
    """Reference-chain corpus counts: documents → sentences → words → wrap →
    k-gram counts (the pure-Python golden for build_ngram_counts(config=...))."""
    out: dict[int, dict[str, int]] = {k: {} for k in range(1, config.order + 1)}
    for text in texts:
        for s in sentences_py(text, config):
            ws = [config.start] + s + [config.end]
            for k in range(1, config.order + 1):
                for i in range(len(ws) - k + 1):
                    g = " ".join(ws[i : i + k])
                    out[k][g] = out[k].get(g, 0) + 1
    return out


def build_counts_py(sentences: list[list[str]], order: int) -> dict[int, dict[str, int]]:
    out: dict[int, dict[str, int]] = {k: {} for k in range(1, order + 1)}
    for s in sentences:
        ws = [START] + [w.lower() for w in s] + [END]
        for k in range(1, order + 1):
            for i in range(len(ws) - k + 1):
                g = " ".join(ws[i : i + k])
                out[k][g] = out[k].get(g, 0) + 1
    return out


def score_py(sentence: list[str], counts: dict[int, dict[str, int]], order: int) -> float:
    wrapped = [START] + [w.lower() for w in sentence] + [END]
    total = sum(counts[1].values())
    if len(wrapped) < order:
        return 0.0
    score = 0.0
    for i in range(len(wrapped) - order + 1):
        g = wrapped[i : i + order]
        chain = [total] + [
            counts[k].get(" ".join(g[:k]), 0) for k in range(1, order + 1)
        ]
        gram_score = UNKNOWN
        factor = 1.0
        for j in range(len(chain) - 1, 0, -1):
            if chain[j] > 0:
                gram_score = math.log(factor * float(chain[j]) / float(chain[j - 1]))
                break
            factor *= ALPHA
        score += gram_score
    return score
