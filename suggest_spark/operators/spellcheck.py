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

The heavy stages (index joins, LM scoring) are DataFrame plans; the final
merge/sort of ≤ 2·topK candidates happens driver-side exactly as the
reference does in-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.analysis import word_tokens_py
from ..functions.metrics import COSINE
from .lm import UNKNOWN, next_word_scores
from .suggest import autocomplete_firstk, suggest_topk


def _autocomplete_matches(index_df: DataFrame, word: str, config: IndexConfig) -> DataFrame:
    """All doc ids containing every gram of the (head-wrapped) word — the
    unlimited form of autocomplete (threshold = |grams|)."""
    spark = index_df.sparkSession
    q = spark.createDataFrame([(0, word)], "query_id long, query string")
    # k large enough to keep all matches; vocabulary indexes are small
    return autocomplete_firstk(index_df, q, k=1_000_000, config=config).select("doc_id")


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

    # LM next-word scores joined to vocab ids (None context → no scorer)
    lm_scores: dict[int, float] = {}
    if context:
        nw = next_word_scores(context, counts, order, wrap_context=True)
        scored = nw.join(vocab, nw["word"] == vocab["value"], "inner").select(
            "doc_id", "score"
        )
        lm_scores = {r["doc_id"]: r["score"] for r in scored.collect()}

    ac = _autocomplete_matches(index_df, word, config)
    ac_ids = [r["doc_id"] for r in ac.collect()]
    # lmCollector: score by LM (unknown −100), keep topK by (score desc, id asc)
    candidates = sorted(
        ((lm_scores.get(d, UNKNOWN), d) for d in ac_ids),
        key=lambda t: (-t[0], t[1]),
    )[:topk]
    cand_ids = [d for _, d in candidates]

    if len(cand_ids) < topk:
        spark = index_df.sparkSession
        q = spark.createDataFrame([(0, word)], "query_id long, query string")
        fuzzy = suggest_topk(index_df, q, COSINE, similarity, topk, config).collect()
        for r in fuzzy:  # merge keeping first occurrence (spellchecker.go:134-151)
            if r["doc_id"] not in cand_ids:
                cand_ids.append(r["doc_id"])

    if context:
        # stable sort by LM score desc (spellchecker.go:126-131)
        cand_ids = sorted(
            cand_ids, key=lambda d: -lm_scores.get(d, UNKNOWN)
        )

    if topk < len(cand_ids):
        cand_ids = cand_ids[: topk + 1]

    values = {r["doc_id"]: r["value"] for r in vocab.collect()}
    return [values[d] for d in cand_ids]
