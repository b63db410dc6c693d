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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.4  # pkg/lm/ngram_model.go:25
UNKNOWN = -100.0  # pkg/lm/ngram_model.go:23-24
START, END = "<S>", "</S>"


def _wrapped_words(text_col):
    words = F.filter(F.split(F.lower(F.trim(text_col)), r"\s+"), lambda w: w != "")
    return F.concat(F.array(F.lit(START)), words, F.array(F.lit(END)))


def build_ngram_counts(
    sentences: DataFrame, order: int, text_col: str = "text"
) -> dict[int, DataFrame]:
    """Count tables for k = 1..order over wrapped sentences
    (NGramBuilder semantics, ngram_builder.go:19-39)."""
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
) -> DataFrame:
    """``(sent_id, score)`` stupid-backoff log score per sentence.

    The count tables are broadcast (an LM count table is tiny next to a
    corpus); the per-gram backoff is one CASE expression, summed per
    sentence by a hash aggregate.
    """
    corpus_total = counts[1].agg(F.sum("cnt")).first()[0]

    wrapped = sentences.select(
        F.col(id_col).alias("sent_id"), _wrapped_words(F.col(text_col)).alias("ws")
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
    ctx = [w.lower() for w in context]
    if wrap_context:
        if len(ctx) + 1 < order:
            ctx = [START] + ctx
        elif len(ctx) > order:
            ctx = ctx[len(ctx) - order + 1 :]
        elif len(ctx) == order:
            ctx = ctx[: order - 1]
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
