"""Corpus curation: the canonical training-data filter chain as ONE
declarative DataFrame plan.

Not in the reference (it serves queries, it doesn't curate corpora) — this
composes the engine's text-analysis primitives (functions/text.py) into the
pipeline every large-scale pretraining corpus runs: language filter →
length/quality filters → exact deduplication, with a per-reason drop funnel
so nothing is filtered silently.

Scale shape: the feature projection is pure whole-stage-codegen column
expressions (no UDFs), the filters sit directly on the scan (predicate
pushdown where the source supports it), and the only shuffle is the exact
dedup's hash partition on 16-byte md5 digests — document bytes never
shuffle.  At 100 TB this plan is a single map stage plus one digest
shuffle; near-dup tiers (operators/dedup.py) chain AFTER it on the
surviving rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    predicted_lang,
    quality_features,
    repetition_features,
    token_counts,
)


@dataclass(frozen=True)
class CurationConfig:
    """Filter thresholds; defaults are deliberately mild — tune per corpus."""

    langs: tuple[str, ...] = ("en",)
    min_words: int = 5
    max_words: int = 100_000
    min_alpha_ratio: float = 0.5
    max_digit_ratio: float = 0.3
    min_stopword_ratio: float = 0.01
    #: Gopher-style repetition caps; 1.0 disables a stage
    max_dup_line_ratio: float = 1.0
    max_dup_word_ratio: float = 1.0
    max_dup_bigram_ratio: float = 1.0


DEFAULT_CURATION = CurationConfig()

#: funnel stages in decision order; a doc gets the FIRST reason it fails
REASONS = (
    "lang", "too_short", "too_long", "low_alpha", "high_digit",
    "low_stopword", "rep_line", "rep_word", "rep_bigram", "duplicate", "kept",
)


def _annotated(docs: DataFrame, config: CurationConfig, id_col: str, text_col: str) -> DataFrame:
    text = F.col(text_col)
    feats = quality_features(text)
    toks = token_counts(text)
    reps = repetition_features(text)
    ann = docs.select(
        F.col(id_col).alias("doc_id"),
        text.alias("text"),
        predicted_lang(text).alias("lang"),
        *[c.alias(n) for n, c in feats.items()],
        toks["re_tokens"].alias("re_tokens"),
        *[c.alias(n) for n, c in reps.items()],
        # 16-byte binary digest, not the 32-char hex string: the dedup
        # window's shuffle key is half the bytes; grouping is identical
        F.unhex(F.md5(text)).alias("content_key"),
    )
    reason = (
        F.when(~F.col("lang").isin(*config.langs), F.lit("lang"))
        .when(F.col("n_words") < config.min_words, F.lit("too_short"))
        .when(F.col("n_words") > config.max_words, F.lit("too_long"))
        .when(F.col("alpha_ratio") < config.min_alpha_ratio, F.lit("low_alpha"))
        .when(F.col("digit_ratio") > config.max_digit_ratio, F.lit("high_digit"))
        .when(F.col("stopword_ratio") < config.min_stopword_ratio, F.lit("low_stopword"))
        .when(F.col("dup_line_ratio") > config.max_dup_line_ratio, F.lit("rep_line"))
        .when(F.col("dup_word_ratio") > config.max_dup_word_ratio, F.lit("rep_word"))
        .when(F.col("dup_bigram_ratio") > config.max_dup_bigram_ratio, F.lit("rep_bigram"))
    )
    ann = ann.withColumn("_filter_reason", reason).withColumn(
        "_passing", F.col("_filter_reason").isNull()
    )
    # dedup rank among PASSING docs only (failing docs never claim a content
    # key); partitioning on (_passing, content_key) keeps one digest shuffle
    w = Window.partitionBy("_passing", "content_key").orderBy("doc_id")
    return ann.withColumn("_rn", F.row_number().over(w)).withColumn(
        "reason",
        F.coalesce(
            F.col("_filter_reason"),
            F.when(F.col("_rn") > 1, F.lit("duplicate")),
            F.lit("kept"),
        ),
    )


#: audit columns carried by curate_documents output (order preserved)
CURATED_COLUMNS = (
    "doc_id", "lang", "n_chars", "n_words", "mean_word_len", "alpha_ratio",
    "digit_ratio", "stopword_ratio", "re_tokens",
    "dup_line_ratio", "dup_word_ratio", "dup_bigram_ratio",
)


def annotated_documents(
    docs: DataFrame,
    config: CurationConfig = DEFAULT_CURATION,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every input doc with its features, ``text``, and final ``reason`` —
    the shared frame behind :func:`curate_documents` and
    :func:`curation_funnel`.  Callers needing BOTH the curated rows and the
    funnel (e.g. jobs/curation_job.py) should persist this once instead of
    paying the feature projection and digest shuffle twice."""
    return _annotated(docs, config, id_col, text_col)


def curate_documents(
    docs: DataFrame,
    config: CurationConfig = DEFAULT_CURATION,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving documents with their audit features:
    ``(doc_id, lang, n_chars, n_words, mean_word_len, alpha_ratio,
    digit_ratio, stopword_ratio, re_tokens, dup_line_ratio,
    dup_word_ratio, dup_bigram_ratio)``.  First arrival (lowest doc_id)
    wins among byte-identical texts."""
    ann = _annotated(docs, config, id_col, text_col)
    return ann.where(F.col("reason") == "kept").select(*CURATED_COLUMNS)


def curation_funnel(
    docs: DataFrame,
    config: CurationConfig = DEFAULT_CURATION,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(reason, n_docs)`` — how many documents each funnel stage dropped
    (plus ``kept``).  The audit table that makes the curation non-silent:
    log it / checkpoint it next to the curated output."""
    ann = _annotated(docs, config, id_col, text_col)
    return ann.groupBy("reason").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
