"""Streaming deduplication for an unbounded document ingest.

Not in the reference (it serves static indexes only) — this is the
training-data-pipeline shape: documents arrive continuously and each must be
admitted exactly once, with near-duplicates of anything already admitted
flagged at ingest time.

Two tiers, mirroring the batch operators in ``operators/dedup.py``:

* :func:`dedup_exact_stream` — drop re-arrivals of byte-identical text using
  Spark's watermark-bounded streaming dedup state
  (``dropDuplicatesWithinWatermark``).  State holds only 16-byte md5 keys
  inside the watermark horizon, never text — the same "shuffle digests, not
  bytes" rule the batch ``dedup_exact`` follows, so state size is bounded by
  arrival rate × watermark, independent of document length.
* :func:`near_dup_ingest` — per micro-batch MinHash-LSH admission against a
  persistent **bucket registry** (a parquet table ``(bucket, doc_id)`` — the
  streaming analogue of the batch band table).  Each batch: compute band
  buckets for the incoming docs, anti/left-join the registry to find
  collisions, emit every doc annotated with ``dup_of`` (the registered owner
  of the first colliding bucket, null if novel), then append the novel docs'
  buckets to the registry.  The registry join is an equi-join on the bucket
  key — identical plan shape to the batch ``minhash_lsh_pairs``, so the
  skew/AQE story carries over; the registry grows by admitted-novel docs
  only, so boilerplate floods never amplify it.

Exactly-once caveat (documented, not hidden): the registry append in
``foreachBatch`` is at-least-once under task retry.  Replayed batches
re-insert the same deterministic ``(bucket, doc_id)`` rows — duplicates in
the registry change no admission decision (the join takes ``min(doc_id)``
per bucket) — so the pipeline is idempotent in effect; a transactional table
format (Iceberg/Delta) upgrades this to exactly-once without changing the
plan (see tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import minhash_bands, shingle_words

REGISTRY_SCHEMA = "bucket string, doc_id long"


def dedup_exact_stream(
    doc_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame with byte-identical re-arrivals (within the
    watermark horizon) dropped; first arrival wins.  Dedup key is
    ``md5(text)`` so the streaming state store and the dedup shuffle carry
    16-byte digests, never document bytes."""
    doc_stream = doc_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        doc_stream.withColumn("_content_key", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_key"])
        .drop("_content_key")
    )


def _read_registry(spark: SparkSession, path: str) -> DataFrame:
    """Read the bucket registry, empty-frame on a not-yet-created path.

    Existence is probed through the Hadoop FileSystem API, NOT the local os
    module: the registry lives wherever the stream's filesystem is
    (hdfs://, s3a://, ...), and an os.path probe would silently report
    'empty' there — disabling cross-batch dedup and making
    compact_registry destroy the real registry.  (No broad try/except
    around the read either: a transient read error must FAIL the batch,
    not masquerade as an empty registry.)"""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        return spark.read.schema(REGISTRY_SCHEMA).parquet(path)
    return spark.createDataFrame([], REGISTRY_SCHEMA)


def compact_registry(spark: SparkSession, registry_path: str, n_files: int = 8) -> int:
    """Rewrite the bucket registry into ``n_files`` deduplicated parquet
    files.  Each micro-batch appends a few small files and foreachBatch
    retries can duplicate rows (harmless for admission, wasteful on disk) —
    run this periodically, off the ingest path.  The compacted frame is
    pinned with an eager ``localCheckpoint`` because source and target are
    the same directory.  Returns the registry row count after compaction."""
    reg = (
        _read_registry(spark, registry_path)
        .distinct()
        .coalesce(n_files)
        .localCheckpoint(eager=True)
    )
    reg.write.mode("overwrite").parquet(registry_path)
    return reg.count()


def near_dup_ingest(
    doc_stream: DataFrame,
    registry_path: str,
    sink,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """MinHash-LSH near-dup admission for a document stream.

    ``sink(annotated_df, batch_id)`` receives each micro-batch with an extra
    ``dup_of`` column: the ``doc_id`` of an already-admitted near-duplicate
    (lowest colliding owner), or null if the document is novel.  Novel docs'
    band buckets are appended to ``registry_path`` before the next batch.

    Intra-batch collisions resolve deterministically: docs are admitted in
    ``doc_id`` order, so of two near-dup docs in one batch the lower id is
    novel and the higher gets ``dup_of`` = lower id.  In a chain (5 collides
    only with 3, 3 collides with registered 1) the flagged doc's ``dup_of``
    may itself be a flagged doc — that matches the batch pipeline's
    transitive-closure semantics (connected components over the pair graph):
    membership in a dup cluster is what's decided; admission = null
    ``dup_of``, and only admitted docs' buckets enter the registry.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        with_sh = batch_df.withColumn(
            "_shingles", shingle_words(F.col(text_col), shingle_k)
        )
        bands = minhash_bands(
            with_sh, n_hashes, band_size, id_col=id_col, shingles_col="_shingles"
        ).persist()

        registry = _read_registry(spark, registry_path)
        owners = registry.groupBy("bucket").agg(F.min("doc_id").alias("_reg_owner"))

        # registered owner (if any) per incoming bucket, then the intra-batch
        # owner: the smallest unregistered doc id sharing the bucket
        hit = bands.join(owners, "bucket", "left")
        batch_owner = F.min(
            F.when(F.col("_reg_owner").isNull(), F.col("id"))
        ).over(Window.partitionBy("bucket"))
        resolved = hit.withColumn("_batch_owner", batch_owner)
        # a registered owner flags REGARDLESS of id order (stream ids are
        # not monotone — a later batch may carry a smaller id; only a doc
        # re-arriving under its own id stays admitted, which keeps replays
        # idempotent); an intra-batch owner flags only when strictly
        # smaller, so the batch's first arrival is the one admitted
        owner = F.coalesce(
            F.when(F.col("_reg_owner") != F.col("id"), F.col("_reg_owner")),
            F.when(F.col("_batch_owner") < F.col("id"), F.col("_batch_owner")),
        )
        dup_of = (
            resolved.withColumn("_owner", owner)
            .where(F.col("_owner").isNotNull())
            .groupBy("id")
            .agg(F.min("_owner").alias("dup_of"))
            .withColumnRenamed("id", id_col)
        )
        annotated = batch_df.join(dup_of, id_col, "left")
        sink(annotated, batch_id)

        novel_ids = annotated.where(F.col("dup_of").isNull()).select(
            F.col(id_col).alias("id")
        )
        (
            bands.join(novel_ids, "id")
            .select("bucket", F.col("id").alias("doc_id"))
            .write.mode("append")
            .parquet(registry_path)
        )
        bands.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )
