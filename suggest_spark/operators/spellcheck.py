"""Spellchecker / next-word prediction: the reference's compound operator L3
(/root/reference/pkg/spellchecker/spellchecker.go:40-92 Predict):

1. word-tokenize the query; last token = the word being typed, preceding
   tokens = the LM context;
2. autocomplete the last word against the vocabulary n-gram index, scoring
   candidates by the LM next-word score (lmCollector,
   pkg/spellchecker/collector.go:61-78; unknown → −100);
3. if fewer than topK, add fuzzy candidates (Cosine suggest) and merge
   keeping first occurrence per doc id (spellchecker.go:134-151);
4. stable-sort by next-word score descending (spellchecker.go:126-131);
5. truncate to topK+1 (the reference's off-by-one quirk, :84-86) and map to
   dictionary values.

Scale shape: every unbounded set stays a DataFrame — autocomplete matches
are ranked by LM score *inside the plan* (``orderBy().limit(topk)`` compiles
to TakeOrderedAndProject: distributed per-partition top-k, no global sort,
no single-partition window) and candidate VALUES come from joining the ≤2·topk
survivor ids back to the vocabulary table.  The only driver-side
materializations are bounded: ≤ topk ranked autocomplete rows, ≤ topk fuzzy
rows, ≤ topk LM-score lookups for the fuzzy ids.  The final merge/sort of
≤ 2·topk candidates happens driver-side exactly as the reference does
in-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.analysis import word_tokens_py
from ..functions.metrics import COSINE
from .lm import UNKNOWN, next_word_scores
from .suggest import _query_grams, suggest_topk


def _autocomplete_matches(index_df: DataFrame, word: str, config: IndexConfig) -> DataFrame:
    """All doc ids containing every gram of the (head-wrapped) word — the
    unlimited form of autocomplete (threshold = |grams|,
    pkg/suggest/autocomplete.go:40-77) WITHOUT a rank window: the match set
    stays distributed for downstream ranking."""
    spark = index_df.sparkSession
    q = spark.createDataFrame([(0, word)], "query_id long, query string")
    grams = F.broadcast(_query_grams(q, config, head_only=True).drop("query"))
    joined = grams.join(
        index_df,
        on=[grams["term"] == index_df["term"], index_df["size"] >= grams["size_a"]],
        how="inner",
    ).select("size_a", "doc_id")
    return (
        joined.groupBy("size_a", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("overlap"))
        .where(F.col("overlap") >= F.col("size_a"))
        .select("doc_id")
    )


def _lm_scored_vocab(
    vocab: DataFrame, counts: dict[int, DataFrame], order: int, context: list[str]
) -> DataFrame:
    """``(doc_id, score)`` LM next-word scores joined to vocabulary ids
    (lmCollector's scorer, pkg/spellchecker/collector.go:61-78)."""
    nw = next_word_scores(context, counts, order, wrap_context=True)
    return nw.join(vocab, nw["word"] == vocab["value"], "inner").select(
        "doc_id", "score"
    )


def ranked_candidates(
    vocab: DataFrame,
    index_df: DataFrame,
    counts: dict[int, DataFrame],
    order: int,
    word: str,
    context: list[str],
    topk: int,
    config: IndexConfig,
) -> DataFrame:
    """Top-``topk`` autocomplete candidates of ``word`` ranked by LM score
    (unknown → −100), ties ascending doc_id, with values attached —
    the whole ranking happens in the plan (TakeOrderedAndProject), never on
    the driver.  Returns ``(doc_id, score, value)``."""
    ac = _autocomplete_matches(index_df, word, config)
    if context:
        lm_df = _lm_scored_vocab(vocab, counts, order, context)
        scored = ac.join(lm_df, "doc_id", "left").withColumn(
            "score", F.coalesce(F.col("score"), F.lit(UNKNOWN))
        )
    else:
        # no context → no scorer: every candidate is UNKNOWN (the reference's
        # Next() errors and the lmCollector scores everything −100)
        scored = ac.withColumn("score", F.lit(UNKNOWN))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(topk)
    return top.join(vocab, "doc_id").select("doc_id", "score", "value")


def predict(
    vocab: DataFrame,
    index_df: DataFrame,
    counts: dict[int, DataFrame],
    order: int,
    query: str,
    topk: int,
    similarity: float,
    config: IndexConfig,
) -> list[str]:
    """Return predicted completions for the last word of ``query``.

    ``vocab`` — (doc_id, value) word dictionary; ``index_df`` — n-gram index
    over it; ``counts`` — LM count tables (build_ngram_counts).
    """
    tokens = word_tokens_py(query)
    if not tokens:
        return []
    word, context = tokens[-1], tokens[:-1]

    top = ranked_candidates(
        vocab, index_df, counts, order, word, context, topk, config
    ).collect()  # bounded: ≤ topk rows
    # the value join may reorder rows — restore (score desc, id asc)
    cand = sorted(
        [(r["doc_id"], r["score"], r["value"]) for r in top],
        key=lambda t: (-t[1], t[0]),
    )

    if len(cand) < topk:
        spark = index_df.sparkSession
        q = spark.createDataFrame([(0, word)], "query_id long, query string")
        fuzzy = suggest_topk(
            index_df, q, COSINE, similarity, topk, config, dictionary=vocab
        ).collect()  # bounded: ≤ topk rows, rank order, values attached
        fz_ids = [r["doc_id"] for r in fuzzy if r["doc_id"] not in {c[0] for c in cand}]
        fz_scores: dict[int, float] = {}
        if context and fz_ids:
            lm_df = _lm_scored_vocab(vocab, counts, order, context)
            fz_scores = {
                r["doc_id"]: r["score"]
                for r in lm_df.where(F.col("doc_id").isin(fz_ids)).collect()
            }  # bounded: ≤ topk lookups
        for r in sorted(fuzzy, key=lambda r: r["rank"]):
            if r["doc_id"] in fz_ids:
                cand.append(
                    (r["doc_id"], fz_scores.get(r["doc_id"], UNKNOWN), r["value"])
                )

    if context:
        # stable sort by LM score desc (sort.SliceStable, spellchecker.go:126-131)
        cand = sorted(cand, key=lambda t: -t[1])

    if topk < len(cand):
        cand = cand[: topk + 1]
    return [v for _, _, v in cand]


def evaluate(
    vocab: DataFrame,
    index_df: DataFrame,
    counts: dict[int, DataFrame],
    order: int,
    sentences: list[list[str]],
    topk: int = 5,
    similarity: float = 0.5,
    config: IndexConfig | None = None,
    prefix_len: int = 2,
) -> dict:
    """Batch accuracy harness for :func:`predict` — the non-interactive form
    of the reference's eval loop (cmd/spellchecker/cmd/eval.go:34-80, which
    REPLs Predict with topK=5, similarity=0.5 and reports latency; here we
    replay labeled cases and report quality).

    For every sentence and every word position i >= 1, the case is:
    context = words[:i], typed prefix = words[i][:prefix_len], truth =
    words[i].  A case is a hit@k if the truth appears in the predictions;
    MRR uses the truth's 1-based rank.  Returns a JSON-able report.
    """
    from ..config import DEFAULT_CONFIG

    cfg = config or DEFAULT_CONFIG
    n_cases = hits = 0
    rr_sum = 0.0
    for words in sentences:
        for i in range(1, len(words)):
            truth = words[i]
            prefix = truth[:prefix_len]
            query = " ".join(words[:i] + [prefix])
            preds = predict(
                vocab, index_df, counts, order, query, topk, similarity, cfg
            )
            n_cases += 1
            if truth in preds:
                hits += 1
                rr_sum += 1.0 / (preds.index(truth) + 1)
    return {
        "n_cases": n_cases,
        "hit_at_k": round(hits / n_cases, 4) if n_cases else 0.0,
        "mrr": round(rr_sum / n_cases, 4) if n_cases else 0.0,
        "topk": topk,
        "similarity": similarity,
        "prefix_len": prefix_len,
    }


class SpellChecker:
    """Bound spellchecker: vocabulary + index + LM counts, exposing the
    reference's ``Predict(query, topK, similarity)`` surface
    (pkg/spellchecker/spellchecker.go:39-92) — the object the service layer
    holds per dictionary (internal/spellchecker/api/app.go:63)."""

    def __init__(self, vocab, index_df, counts, order, config):
        self.vocab = vocab
        self.index = index_df
        self.counts = counts
        self.order = order
        self.config = config

    def predict(self, query: str, topk: int = 5, similarity: float = 0.5) -> list[str]:
        return predict(
            self.vocab, self.index, self.counts, self.order, query, topk,
            similarity, self.config,
        )


def build_spellchecker(
    spark,
    lm_output_dir: str,
    order: int,
    config: IndexConfig | None = None,
    start: str = "<S>",
    end: str = "</S>",
) -> SpellChecker:
    """The dep.BuildSpellChecker analogue
    (/root/reference/internal/spellchecker/dep/container.go:13-51): assemble
    a ready spellchecker from PERSISTED LM artifacts — the Google-format
    ``k-gm`` count files an ``lm_count_job`` run produced.

    The vocabulary is the 1-gm table minus the sentence wrap symbols,
    sorted for deterministic doc ids (the reference's ids come from its CDB
    build order; any fixed order works — scores never depend on ids, only
    tie-breaks do, and ours are documented as sorted-vocab order).  The
    default index description mirrors the reference CLI's
    (cmd/spellchecker/cmd/eval.go:16-24: trigrams, wrap ^/$, pad $).
    """
    from .indexing import build_ngram_index
    from .lm import read_google_ngram_format

    if config is None:
        config = IndexConfig(
            ngram_size=3,
            wrap=("^", "$"),
            pad="$",
            alphabet=("english", "russian", "numbers", "$^'"),
        )
    counts = {
        k: df.cache()
        for k, df in read_google_ngram_format(spark, lm_output_dir, order).items()
    }
    vocab = vocab_from_unigrams(counts[1], start, end).cache()
    index_df = build_ngram_index(vocab, config=config).cache()
    index_df.count()  # materialize, like builder.Build()
    return SpellChecker(vocab, index_df, counts, order, config)


def vocab_from_unigrams(unigrams: DataFrame, start: str, end: str) -> DataFrame:
    """``(doc_id, value)`` vocabulary from a 1-gm count table, ids =
    sorted-word order — computed DISTRIBUTED (sortBy + zipWithIndex), never
    by collecting the vocabulary to the driver: a web-scale corpus has a
    10^8-word unigram table.  This is one of the rare justified RDD uses —
    Catalyst has no deterministic ordered-id operator (row_number over a
    global ORDER BY plans a single partition; monotonically_increasing_id
    is partition-layout-dependent), while sortBy+zipWithIndex is both
    distributed and deterministic for a fixed word set."""
    spark = unigrams.sparkSession
    words = unigrams.where(~F.col("gram").isin(start, end)).select(
        F.col("gram").alias("value")
    )
    rdd = (
        words.rdd.map(lambda r: r["value"])
        .sortBy(lambda v: v)
        .zipWithIndex()
        .map(lambda t: (t[1], t[0]))
    )
    return spark.createDataFrame(rdd, "doc_id long, value string")
