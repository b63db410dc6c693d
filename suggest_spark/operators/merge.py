"""T-occurrence merge over posting lists, relational form.

The reference implements four list-merge algorithms — ScanCount
(pkg/merger/scan_count.go:7-88), CPMerge (cp_merge.go:9-120), MergeSkip
(merge_skip.go:40-151), DivideSkip (divide_skip.go:12-74) — that are proven
result-identical by shared golden tests (pkg/merger/list_merger_test.go:42-160).
They differ only in single-core CPU strategy; the distributed equivalent of
all four is one hash aggregation:

    explode lists → groupBy(doc_id).count() → HAVING count >= T

Catalyst's partial (map-side) aggregation plays the role of the per-list
counting loops, and the shuffle replaces pointer-skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def t_occurrence_merge(postings: DataFrame, threshold: int) -> DataFrame:
    """``postings`` is ``(list_id, doc_id)`` (one row per occurrence of a doc
    in a list); returns ``(doc_id, overlap)`` for docs appearing in >= T list
    entries — exactly the SimpleCollector output of the reference goldens."""
    return (
        postings.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("overlap"))
        .where(F.col("overlap") >= threshold)
    )


def intersect_all(postings: DataFrame, n_lists: int) -> DataFrame:
    """Exact k-way intersection (pkg/merger/list_intersector.go:17-81) — the
    degenerate case threshold == number of lists."""
    return t_occurrence_merge(postings, n_lists).select("doc_id")
