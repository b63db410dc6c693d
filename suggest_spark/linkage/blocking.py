"""Prefix-filtered n-gram signature blocking.

Distributed generalization of the reference's CPMerge prefix idea
(/root/reference/pkg/merger/cp_merge.go:19-120: only the ``N−T+1`` shortest
posting lists can introduce a candidate; a candidate abandoned when
``overlap + remaining < T``).  In self-join form this is the classic prefix
filter: order each record's distinct grams by global rarity; any pair with
similarity >= alpha MUST share a gram within each side's first
``L − minOverlap(alpha, L) + 1`` grams, where ``minOverlap = metric.min_y``
(for every reference metric, min_y(alpha, |A|) is a valid lower bound on the
required overlap given the length filter: Jaccard ⌈αA⌉, Cosine ⌈α²A⌉,
Dice ⌈α/(2−α)·A⌉ — cf. pkg/metric/*.go:12-22).

Skew strategy (SURVEY.md §4, north-rule mandate):
* rare-first prefix ordering keeps hot shingles ("$th", "he ") OUT of
  prefixes unless a record consists almost entirely of hot grams — the
  primary, recall-safe defuse;
* AQE skew-join splitting is enabled by the session factory for the residual
  self-join skew;
* an optional hard df cap drops super-hot blocking keys entirely (recall
  trade-off is logged, never silent).

Blocking uses SET semantics (distinct grams): duplicate normalized grams add
no blocking power.  Pair SCORING (scoring.py) re-computes exact multiset
overlap, so this does not affect score parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.metrics import Metric


def gram_document_frequency(records: DataFrame) -> DataFrame:
    """Global document frequency per distinct gram.

    ``records`` must have ``rid`` and ``terms array<string>``; one shuffle
    (partial-aggregated count).  At 100 TB this table is ~|alphabet|^n rows —
    tiny relative to the corpus — and is broadcast back to the prefix join.
    """
    return (
        records.select(F.explode(F.array_distinct("terms")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def prefix_keys(
    records: DataFrame,
    metric: Metric,
    alpha: float,
    term_df: DataFrame | None = None,
    df_cap: int | None = None,
) -> DataFrame:
    """``(term, rid, size)`` blocking keys: each record's rarest
    ``set_size − min_y(alpha, set_size) + 1`` distinct grams.

    ``set_size`` is the DISTINCT gram count (blocking is set-based); scoring
    recomputes exact reference multiset semantics downstream.
    """
    if term_df is None:
        term_df = gram_document_frequency(records)

    exploded = records.select(
        "rid",
        F.size("terms").alias("msize"),  # multiset cardinality (reference "size")
        F.size(F.array_distinct("terms")).alias("set_size"),
        F.explode(F.array_distinct("terms")).alias("term"),
    )

    with_df = exploded.join(F.broadcast(term_df), "term", "inner")
    if df_cap is not None:
        with_df = with_df.where(F.col("df") <= df_cap)

    w = Window.partitionBy("rid").orderBy(F.asc("df"), F.asc("term"))
    prefix_len = F.col("set_size") - metric.min_y(alpha, F.col("set_size")) + F.lit(1)

    # The length filter downstream uses the reference's MULTISET cardinality
    # (pkg/index/indexer_writer.go:66-86 groups by len(terms) incl. duplicate
    # normalized grams); the prefix is over DISTINCT grams.
    return (
        with_df.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= prefix_len)
        .select("term", "rid", F.col("msize").alias("size"))
    )


def candidate_pairs(
    records: DataFrame,
    metric: Metric,
    alpha: float,
    df_cap: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Distinct candidate ``(rid_a, rid_b)`` pairs (rid_a < rid_b) sharing a
    prefix gram, with the length filter ``size_b BETWEEN min_y(size_a) AND
    max_y(size_a)`` applied at pair-generation time (the reference's
    LengthFilter, pkg/suggest/suggester.go:53-59, as a join predicate).

    ``max_block_size`` optionally drops blocks bigger than the cap (count and
    identity of dropped blocks are returned via the ``_dropped_blocks``
    attribute for reporting — never silent).
    """
    keys = prefix_keys(records, metric, alpha, df_cap=df_cap)

    if max_block_size is not None:
        block_sizes = keys.groupBy("term").agg(F.count(F.lit(1)).alias("block_n"))
        dropped = block_sizes.where(F.col("block_n") > max_block_size)
        keys = keys.join(F.broadcast(dropped.select("term")), "term", "left_anti")
        candidate_pairs._dropped_blocks = dropped  # type: ignore[attr-defined]

    a = keys.select(
        F.col("term"), F.col("rid").alias("rid_a"), F.col("size").alias("size_a")
    )
    b = keys.select(
        F.col("term"), F.col("rid").alias("rid_b"), F.col("size").alias("size_b")
    )

    pairs = a.join(b, "term", "inner").where(
        (F.col("rid_a") < F.col("rid_b"))
        & F.col("size_b").between(
            metric.min_y(alpha, F.col("size_a")), metric.max_y(alpha, F.col("size_a"))
        )
    )

    return pairs.select("rid_a", "rid_b").dropDuplicates(["rid_a", "rid_b"])
