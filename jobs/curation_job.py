"""spark-submit corpus-curation job: the full training-data admission
pipeline over a parquet documents table.

    python jobs/curation_job.py --input docs_dir --output out_dir \
        [--near-dup] [--min-words N] [--langs en,de] ...

Stages (all one Spark application, each auditable):

1. ``curate_documents``  — lang / length / quality filters + exact dedup
   (operators/curation.py; one codegen plan, one digest shuffle).
2. optional ``--near-dup`` — MinHash-LSH pairs over the survivors' texts,
   transitive clusters via connected components (edge count is known from
   the pair count, so small graphs take the driver union-find path), keep
   the minimum doc_id per cluster.
3. writes ``<output>/curated`` parquet + ``<output>/funnel.json`` and
   prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from suggest_spark.linkage.clustering import connected_components
from suggest_spark.operators.curation import (
    CURATED_COLUMNS,
    CurationConfig,
    annotated_documents,
)
from suggest_spark.operators.dedup import minhash_lsh_pairs, shingle_words
from suggest_spark.plans.session import get_spark


def run_curation(
    spark,
    input_path: str,
    output_path: str,
    config: CurationConfig = CurationConfig(),
    near_dup: bool = False,
    shingle_k: int = 5,
    redact: bool = False,
) -> dict:
    docs = spark.read.parquet(input_path).select("doc_id", "text")

    # ONE annotation pass (feature projection + digest shuffle) feeds the
    # funnel, the kept rows, AND the text column — not three scans
    ann = annotated_documents(docs, config).persist()
    funnel = {
        r["reason"]: int(r["n"])
        for r in ann.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    curated = ann.where(F.col("reason") == "kept").select(
        *CURATED_COLUMNS, "text"
    ).persist()
    n_curated = curated.count()
    ann.unpersist()

    n_near_dup = 0
    if near_dup:
        with_sh = curated.withColumn(
            "shingles", shingle_words(F.col("text"), shingle_k)
        )
        pairs = minhash_lsh_pairs(
            with_sh, id_col="doc_id", shingles_col="shingles"
        ).persist()
        n_pairs = pairs.count()
        if n_pairs:
            clusters = connected_components(
                pairs.select(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                ),
                n_edges=n_pairs,
            )
            losers = clusters.where(F.col("rid") != F.col("cluster_id")).select(
                F.col("rid").alias("doc_id")
            )
            n_near_dup = losers.count()
            curated = curated.join(losers, "doc_id", "left_anti")
        pairs.unpersist()

    if redact:
        from suggest_spark.functions.text import redact_pii

        curated = curated.withColumn("text", redact_pii(F.col("text")))

    curated_path = f"{output_path}/curated"
    curated.write.mode("overwrite").parquet(curated_path)
    # the near-dup stage removes docs that were counted 'kept' by the batch
    # funnel — move them so the funnel still sums to the input and 'kept'
    # equals the written row count
    funnel["near_duplicate"] = n_near_dup
    funnel["kept"] = funnel.get("kept", 0) - n_near_dup

    # the funnel audit lands NEXT TO the curated output on whatever
    # filesystem --output names (hdfs://, s3a://, ...) — an os.makedirs/open
    # write would crash after the expensive work or misroute to a local path
    from suggest_spark.sources import fsutil

    fsutil.write_text(
        spark, f"{output_path}/funnel.json", json.dumps(funnel, indent=1)
    )
    return {
        "input": input_path,
        "curated": curated_path,
        "n_curated": n_curated - n_near_dup,
        "funnel": funnel,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir/file with (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--redact-pii", action="store_true",
                    help="replace URLs/emails/phone-like runs with typed tokens in the output text")
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-words", type=int, default=100_000)
    ap.add_argument("--min-alpha-ratio", type=float, default=0.5)
    ap.add_argument("--max-digit-ratio", type=float, default=0.3)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.01)
    ap.add_argument("--max-dup-line-ratio", type=float, default=1.0)
    ap.add_argument("--max-dup-word-ratio", type=float, default=1.0)
    ap.add_argument("--max-dup-bigram-ratio", type=float, default=1.0)
    ap.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    args = ap.parse_args()

    config = CurationConfig(
        langs=tuple(args.langs.split(",")),
        min_words=args.min_words,
        max_words=args.max_words,
        min_alpha_ratio=args.min_alpha_ratio,
        max_digit_ratio=args.max_digit_ratio,
        min_stopword_ratio=args.min_stopword_ratio,
        max_dup_line_ratio=args.max_dup_line_ratio,
        max_dup_word_ratio=args.max_dup_word_ratio,
        max_dup_bigram_ratio=args.max_dup_bigram_ratio,
    )
    spark = get_spark(app_name="corpus_curation", master=args.master)
    t0 = time.time()
    res = run_curation(
        spark, args.input, args.output, config,
        near_dup=args.near_dup, redact=args.redact_pii,
    )
    res["t_sec"] = round(time.time() - t0, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
