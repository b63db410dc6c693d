"""Fuzzy top-k suggest and autocomplete as declarative DataFrame plans.

The reference query lifecycle (pkg/suggest/suggester.go:46-131) is:
tokenize → LengthFilter size range [MinY, MaxY] → per-size-segment
T-occurrence merge (CPMerge, pkg/merger/cp_merge.go:19-120) → score
1−Distance → bounded top-k heap (pkg/suggest/topk.go:82-147) → dictionary
lookup.  Its goroutine-per-segment scheduling, dynamic threshold raising
(suggester.go:93-105) and center-out segment order (suggester.go:112-121)
are monotone *pruning* optimizations that cannot change the result set —
batch Spark computes the exact global answer with one 5-stage plan:

    query grams (exploded, duplicates kept)
      ⋈ index ON term AND size BETWEEN min_y AND max_y     -- LengthFilter ⇒
                                                           -- partition pruning
      → groupBy(query_id, doc_id, size) count AS overlap   -- ScanCount ≡ J1-J4
      → HAVING overlap >= T(alpha, size_a, size) AND T valid  -- CountFilter
      → score = 1 − Distance(overlap, size_a, size)
      → row_number OVER (PARTITION BY query_id
                         ORDER BY score DESC, doc_id ASC) <= k

Tie-break parity: the reference heap orders equal scores by *descending*
Key for eviction, which yields output sorted by score desc then doc_id asc
(pkg/suggest/collector.go:19-26, topk.go:127-147).

Scale notes (100 TB design):
* The query batch is usually ≪ index: the planner broadcasts the exploded
  query-gram side automatically under AQE; we give an explicit hint.
* The groupBy is a partial-aggregated hash shuffle on (query_id, doc_id);
  no per-row Python anywhere in the plan.
* Segment-validity predicates (threshold==0 / > size_a / > size_b skip the
  whole segment, suggester.go:73-77) are applied as post-aggregation
  filters — identical semantics because they depend only on (size_a, size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, IndexConfig
from ..functions.metrics import Metric
from .indexing import with_terms


def _query_grams(queries: DataFrame, config: IndexConfig, head_only: bool = False) -> DataFrame:
    """(query_id, query, size_a, term) — duplicates kept (multiset semantics)."""
    q = with_terms(queries, "query", config, head_only=head_only)
    return q.select(
        "query_id",
        "query",
        F.col("size").alias("size_a"),
        F.explode("terms").alias("term"),
    )


def suggest_topk(
    index_df: DataFrame,
    queries: DataFrame,
    metric: Metric,
    alpha: float,
    k: int,
    config: IndexConfig = DEFAULT_CONFIG,
    dictionary: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k fuzzy matches for a batch of queries.

    Parameters
    ----------
    index_df : ``(doc_id, size, term)`` from :func:`build_ngram_index`.
    queries : ``(query_id, query)``.
    dictionary : optional ``(doc_id, value)`` to attach matched values
        (the lookup join of pkg/suggest/service.go:126-138).

    Returns ``(query_id, query, doc_id, score, rank[, value])`` ordered by
    (query_id, rank).
    """
    # the query STRING never enters the hot path: the join output and the
    # hash-agg key are all-int (query_id, size_a, doc_id, size) — at web
    # scale the candidate stream is 10^2-10^3 rows per (query, doc) gram
    # match, and carrying a string through it roughly doubles shuffle and
    # hash-table bytes.  The text is re-attached to the tiny top-k result.
    grams = _query_grams(queries, config).drop("query")
    if broadcast_queries:
        grams = F.broadcast(grams)

    min_b = metric.min_y(alpha, F.col("size_a"))
    max_b = metric.max_y(alpha, F.col("size_a"))

    joined = grams.join(
        index_df,
        on=[grams["term"] == index_df["term"], index_df["size"].between(min_b, max_b)],
        how="inner",
    ).select("query_id", "size_a", "doc_id", "size")

    overlap = joined.groupBy("query_id", "size_a", "doc_id", "size").agg(
        F.count(F.lit(1)).cast("int").alias("overlap")
    )

    t = metric.threshold(alpha, F.col("size_a"), F.col("size"))
    candidates = overlap.withColumn("t", t).where(
        # segment validity (suggester.go:73-77) + CountFilter
        (F.col("t") >= 1)
        & (F.col("t") <= F.col("size_a"))
        & (F.col("t") <= F.col("size"))
        & (F.col("overlap") >= F.col("t"))
    )

    scored = candidates.select(
        "query_id",
        "doc_id",
        metric.similarity(F.col("overlap"), F.col("size_a"), F.col("size")).alias("score"),
    )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(F.broadcast(queries.select("query_id", "query")), "query_id")
    )

    if dictionary is not None:
        topk = topk.join(F.broadcast(dictionary), "doc_id", "left")

    return topk.select(
        "query_id", "query", *[c for c in topk.columns if c not in ("query_id", "query")]
    ).orderBy("query_id", "rank")


def autocomplete_firstk(
    index_df: DataFrame,
    queries: DataFrame,
    k: int,
    config: IndexConfig = DEFAULT_CONFIG,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """First-k autocomplete: documents containing EVERY query gram, the k
    smallest doc ids per query (reference: pkg/suggest/autocomplete.go:40-77 —
    threshold = |query grams|, segments size >= |grams|; the firstK collector
    with score = −doc_id, pkg/suggest/collector.go:96-115, makes the global
    result exactly the k smallest matching doc ids in ascending order).

    Query grams use the head-only wrap (pkg/suggest/tokenizer.go:22-34).
    """
    # all-int hot path, query text re-attached post-top-k (see suggest_topk)
    grams = F.broadcast(_query_grams(queries, config, head_only=True).drop("query"))

    joined = grams.join(
        index_df,
        on=[grams["term"] == index_df["term"], index_df["size"] >= grams["size_a"]],
        how="inner",
    ).select("query_id", "size_a", "doc_id")

    matched = (
        joined.groupBy("query_id", "size_a", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("overlap"))
        .where(F.col("overlap") >= F.col("size_a"))
    )

    w = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    topk = matched.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    out = topk.join(F.broadcast(queries.select("query_id", "query")), "query_id").select(
        "query_id", "query", "doc_id", "rank"
    )

    if dictionary is not None:
        out = out.join(F.broadcast(dictionary), "doc_id", "left")

    return out.orderBy("query_id", "rank")
