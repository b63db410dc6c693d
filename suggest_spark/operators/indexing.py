"""Length-segmented character n-gram inverted index as a DataFrame.

The reference groups documents by n-gram-set cardinality and keeps one
inverted index per cardinality (reference: pkg/index/indices.go:3-14,
pkg/index/indexer_writer.go:66-86).  The Spark-native equivalent is a single
relation ``(size int, term string, doc_id long)`` physically partitioned by
``size``: the per-segment loop of the reference becomes Catalyst partition
pruning on a ``size BETWEEN min_y AND max_y`` predicate (the LengthFilter),
and posting lists are just the exploded relational form grouped by term.

Duplicate normalized terms for one document are KEPT (the reference appends
the doc id once per term occurrence, indexer_writer.go:80-84), so overlap
counts downstream reproduce ScanCount semantics exactly
(pkg/merger/scan_count.go:7-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, IndexConfig
from ..functions.analysis import ngram_terms_col


def with_terms(
    df: DataFrame,
    text_col: str = "value",
    config: IndexConfig = DEFAULT_CONFIG,
    head_only: bool = False,
) -> DataFrame:
    """Add ``terms array<string>`` and ``size int`` columns for ``text_col``."""
    return df.withColumn("terms", ngram_terms_col(F.col(text_col), config, head_only)).withColumn(
        "size", F.size("terms")
    )


def build_ngram_index(
    dictionary: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "value",
    config: IndexConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """``(doc_id, size, term)`` index rows from a ``(doc_id, value)`` dictionary.

    One narrow projection + explode; the single shuffle in any consumer comes
    from its own join/agg, not from the build.
    """
    return (
        with_terms(dictionary, text_col, config)
        .select(F.col(id_col).alias("doc_id"), "size", F.explode("terms").alias("term"))
    )


def write_ngram_index(index_df: DataFrame, path: str) -> None:
    """Persist the index partitioned by ``size`` for partition pruning
    (the disk layout analogue of pkg/index/indexer_writer.go:89-145 —
    Parquet column encodings replace the varint/skip/roaring codecs of
    pkg/index/codec.go:39-51)."""
    index_df.write.mode("overwrite").partitionBy("size").parquet(path)


def read_ngram_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
