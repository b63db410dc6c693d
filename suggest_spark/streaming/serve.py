"""Streaming query serving + windowed event aggregation.

The reference serves per-query HTTP against an atomically-swapped static
index (/root/reference/internal/suggest/api/app.go:47-77,
pkg/suggest/service.go:78-91 — RWMutex index registry).  The Spark-native
equivalent is Structured Streaming:

* ``serve_suggest_stream`` — a stream of queries processed per micro-batch
  against the static index table (foreachBatch running the exact batch
  suggest plan; the index DataFrame is the "atomically-swapped" static side —
  a reindex is a new table + restart, matching the reference's POST
  /internal/reindex semantics).
* ``windowed_event_counts`` — watermarked tumbling-window aggregation for
  late-arriving event data (not in the reference — SURVEY.md §2.9 — but a
  first-class capability of this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT_CONFIG, IndexConfig
from ..functions.metrics import Metric
from ..operators.suggest import suggest_topk_auto


def serve_suggest_stream(
    query_stream: DataFrame,
    index_df: DataFrame,
    metric: Metric,
    alpha: float,
    k: int,
    sink,
    config: IndexConfig = DEFAULT_CONFIG,
    dictionary: DataFrame | None = None,
    stats=None,
) -> StreamingQuery:
    """Run the suggest plan on each micro-batch of a query stream.

    ``query_stream`` — streaming DataFrame with (query_id long, query string).
    ``sink(batch_df, batch_id)`` — foreachBatch callback receiving the ranked
    results of that micro-batch.
    ``stats`` — optional persisted ``IndexStats`` (indexing.read_index_stats):
    the same stats-driven physical-plan selection the batch and HTTP paths
    use, at zero per-batch planning cost; omitted → plain plan.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = suggest_topk_auto(
            index_df, batch_df, metric, alpha, k, config, dictionary, stats=stats
        )
        sink(out, batch_id)

    return (
        query_stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    event_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts with a watermark for late data; append-mode
    compatible (the watermark closes windows so state is bounded — the
    requirement for unbounded-corpus deployment)."""
    # watermarks require TIMESTAMP (with zone); parquet NTZ columns are cast
    # (session tz is pinned to UTC by the session factory)
    event_stream = event_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        event_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
