"""End-to-end record linkage: pages → blocking → scoring → clustering.

The graft target (BASELINE.json north rule): a batch blocking +
pairwise-scoring + transitive-clustering pipeline over a Common-Crawl-style
``pages(url, warc_ts, html, text, lang)`` table, reproducing the reference's
similarity semantics (suggest-go's n-gram metrics) so that labeled pairs at
the same blocking key reach pairwise F1 >= 0.99.

Stages (each checkpointed with lineage + per-partition metrics):

1. ``records``    — extract + tokenize: (rid, url, text, terms, size); the
                    extracted text is byte-identical per url by construction
                    (pure column expressions, no nondeterminism).
2. ``pairs``      — prefix-filtered candidate pairs (blocking.py).
3. ``matches``    — scored pairs with sim >= alpha (scoring.py).
4. ``clusters``   — connected components over matches; records without any
                    match become singleton clusters (cluster_id = own rid).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, IndexConfig
from ..functions.analysis import ngram_terms_col
from ..functions.metrics import JACCARD, Metric
from ..sources.synth import url_id
from .blocking import candidate_pairs
from .checkpoint import CheckpointedPipeline
from .clustering import connected_components
from .scoring import score_pairs


@dataclass(frozen=True)
class LinkageConfig:
    metric: Metric = JACCARD
    alpha: float = 0.7
    index: IndexConfig = DEFAULT_CONFIG
    df_cap: int | None = None
    max_block_size: int | None = None
    #: explicit broadcast flags (no hidden size-probe jobs on any path —
    #: pass True when the corpus is known to fit executor memory; AQE still
    #: upgrades shuffle joins to broadcast at runtime either way)
    broadcast_keys: bool = False
    broadcast_records: bool = False

    def fingerprint(self) -> str:
        return json.dumps(
            {
                "metric": self.metric.name,
                "alpha": self.alpha,
                "ngram": self.index.ngram_size,
                "alphabet": list(self.index.alphabet),
                "wrap": list(self.index.wrap),
                "pad": self.index.pad,
                "df_cap": self.df_cap,
                "max_block_size": self.max_block_size,
            },
            sort_keys=True,
        )


def build_records(pages: DataFrame, config: LinkageConfig) -> DataFrame:
    """(rid, url, text, terms, size) from pages; rid = md5(url)."""
    return pages.select(
        url_id(F.col("url")).alias("rid"),
        "url",
        "text",
    ).withColumn("terms", ngram_terms_col(F.col("text"), config.index)).withColumn(
        "size", F.size("terms")
    )


def run_linkage(
    spark: SparkSession,
    pages: DataFrame,
    config: LinkageConfig,
    checkpoint_dir: str,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns stage DataFrames keyed by
    ``records / pairs / matches / clusters`` plus the pipeline events list
    under the CheckpointedPipeline instance (``_pipeline`` key)."""
    cp = CheckpointedPipeline(spark, checkpoint_dir, config.fingerprint())

    records = cp.run_stage("records", lambda: build_records(pages, config)).df

    from .blocking import encode_records

    encoded = encode_records(records, df_cap=config.df_cap).persist()
    # the corpus duplicate-excess constant, computed ONCE explicitly here
    # (one small job over the persisted encoding) so no stage runs hidden
    # driver actions at plan-construction time
    delta_max = int(
        encoded.agg(F.max("delta").alias("d")).first()["d"] or 0
    )

    pairs = cp.run_stage(
        "pairs",
        lambda: candidate_pairs(
            encoded,
            config.metric,
            config.alpha,
            max_block_size=config.max_block_size,
            broadcast_keys=config.broadcast_keys,
            delta_max=delta_max,
        ),
        inputs=["records"],
    ).df

    matches_res = cp.run_stage(
        "matches",
        lambda: score_pairs(
            pairs,
            records,
            config.metric,
            config.alpha,
            broadcast_records=config.broadcast_records,
            encoded=encoded,
        ),
        inputs=["records", "pairs"],
    )
    matches = matches_res.df

    cluster_rounds: list[tuple[int, int]] = []

    def _cluster() -> DataFrame:
        edges = matches.select(F.col("rid_a").alias("src"), F.col("rid_b").alias("dst"))
        # the matches-stage manifest already carries the edge count — small
        # match graphs take the driver union-find path with zero extra jobs
        assigned = connected_components(
            edges,
            on_round=lambda i, n: cluster_rounds.append((i, n)),
            n_edges=matches_res.manifest.get("rows"),
        )
        singletons = (
            records.select("rid")
            .join(assigned.select("rid"), "rid", "left_anti")
            .withColumn("cluster_id", F.col("rid"))
        )
        return assigned.unionByName(singletons)

    # cluster_rounds is shared by reference: _cluster fills it during fn()
    # and run_stage serializes extra_metrics into the manifest AFTER fn ran,
    # so the per-round (round, n_edges) metrics land in the lineage manifest
    clusters = cp.run_stage(
        "clusters",
        _cluster,
        inputs=["matches"],
        extra_metrics={"delta_max": delta_max, "cc_rounds": cluster_rounds},
    ).df

    # final user-facing table: url → cluster
    out = records.select("rid", "url").join(clusters, "rid").select("url", "cluster_id")

    return {
        "records": records,
        "pairs": pairs,
        "matches": matches,
        "clusters": clusters,
        "url_clusters": out,
        "cluster_rounds": cluster_rounds,
        "delta_max": delta_max,
        "_pipeline": cp,
    }


def pairwise_f1(
    matches: DataFrame,
    labeled: DataFrame,
    records: DataFrame,
) -> dict[str, float]:
    """Pairwise F1 of predicted matches vs labeled (url_a, url_b, is_match).

    Pairs are canonicalized on rid ordering to align with pipeline output.
    """
    rid_map = records.select("rid", "url")
    lab = (
        labeled.join(rid_map.withColumnRenamed("url", "url_a").withColumnRenamed("rid", "r1"), "url_a")
        .join(rid_map.withColumnRenamed("url", "url_b").withColumnRenamed("rid", "r2"), "url_b")
        .select(
            F.least("r1", "r2").alias("rid_a"),
            F.greatest("r1", "r2").alias("rid_b"),
            "is_match",
        )
    )
    pred = matches.select("rid_a", "rid_b").withColumn("pred", F.lit(1))
    joined = lab.join(pred, ["rid_a", "rid_b"], "left").fillna({"pred": 0})
    agg = joined.agg(
        F.sum(F.when((F.col("is_match") == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("is_match") == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("is_match") == 1) & (F.col("pred") == 0), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
    precision = tp / (tp + fp) if (tp + fp) else 1.0
    recall = tp / (tp + fn) if (tp + fn) else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}
