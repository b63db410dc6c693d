"""spark-submit entry point for the record-linkage pipeline.

Cluster usage (north rule: multi-executor, --py-files):

    zip -r suggest_spark.zip suggest_spark
    spark-submit --py-files suggest_spark.zip \\
        --master <cluster> --num-executors N \\
        jobs/linkage_job.py \\
        --pages /warehouse/pages --checkpoint-dir /warehouse/linkage_ckpt \\
        --output /warehouse/clusters --metric jaccard --alpha 0.7

Local smoke:

    python jobs/linkage_job.py --synthetic 2000 \\
        --checkpoint-dir /tmp/ckpt --output /tmp/clusters

The job is resumable: re-running with the same --checkpoint-dir skips
completed stages (per-stage manifests with lineage + per-partition metrics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from suggest_spark.functions.metrics import METRICS
from suggest_spark.linkage.pipeline import LinkageConfig, run_linkage
from suggest_spark.plans.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet path of pages(url, warc_ts, html, text, lang)")
    src.add_argument("--synthetic", type=int, help="generate N synthetic entities instead")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--output", required=True, help="output parquet of (url, cluster_id)")
    ap.add_argument("--metric", default="jaccard", choices=sorted(METRICS))
    ap.add_argument("--alpha", type=float, default=0.7)
    ap.add_argument("--df-cap", type=int, default=None)
    ap.add_argument("--max-block-size", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="linkage_job")
    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        from suggest_spark.sources.synth import make_pages

        pages = make_pages(spark, args.synthetic, seed=42)

    cfg = LinkageConfig(
        metric=METRICS[args.metric],
        alpha=args.alpha,
        df_cap=args.df_cap,
        max_block_size=args.max_block_size,
    )
    res = run_linkage(spark, pages, cfg, args.checkpoint_dir)
    res["url_clusters"].write.mode("overwrite").parquet(args.output)

    events = res["_pipeline"].events
    n_clusters = res["clusters"].select("cluster_id").distinct().count()
    print(json.dumps({"stages": events, "clusters": n_clusters}))
    spark.stop()


if __name__ == "__main__":
    main()
