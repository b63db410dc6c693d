"""IVF recall on a CLUSTERED corpus: the structure-free sf* embeddings make
recall ≈ probe_frac the ceiling; on a mixture-of-Gaussians fixture the
trained quantizer must reach recall@5 ≥ 0.9 while probing ≤ 25% of cells
(the regime IVF is built for — VERDICT r2 next-round #5)."""

import pytest
from pyspark.sql import functions as F

from suggest_spark.operators import ann
from suggest_spark.sources.synth import make_clustered_embeddings


@pytest.fixture(scope="module")
def clustered(spark):
    df = make_clustered_embeddings(
        spark, n_vectors=2000, dim=32, n_clusters=16, noise=0.5, seed=7
    ).persist()
    df.count()
    return df


def _recall(bf_rows, ivf_rows):
    bf, got = {}, {}
    for r in bf_rows:
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in ivf_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(bf[k] & got.get(k, set())) for k in bf)
    return hits / max(sum(len(v) for v in bf.values()), 1)


def test_fixture_is_deterministic_and_clustered(spark, clustered):
    again = make_clustered_embeddings(
        spark, n_vectors=2000, dim=32, n_clusters=16, noise=0.5, seed=7
    )
    assert clustered.exceptAll(again).count() == 0
    # same-cluster cosine must dominate cross-cluster cosine by a wide margin
    a = clustered.select(
        F.col("vec_id").alias("ia"), F.col("cluster").alias("ca"),
        F.col("embedding").alias("va"),
    )
    b = clustered.select(
        F.col("vec_id").alias("ib"), F.col("cluster").alias("cb"),
        F.col("embedding").alias("vb"),
    )
    sample = (
        a.where(F.col("ia") < 50)
        .join(b.where(F.col("ib").between(50, 500)), how="cross")
        .select(
            (F.col("ca") == F.col("cb")).alias("same"),
            ann.dot(F.col("va"), F.col("vb")).alias("cos"),  # unit-norm: dot=cos
        )
        .groupBy("same")
        .agg(F.avg("cos").alias("m"))
        .collect()
    )
    means = {r["same"]: r["m"] for r in sample}
    assert means[True] > means[False] + 0.5, means


def test_ivf_recall_on_clustered_fixture(spark, clustered):
    """Trained centroids + 25% probe → recall@5 ≥ 0.9 (vs exact brute force)."""
    corpus = clustered.select("vec_id", "embedding")
    q = (
        corpus.where(F.col("vec_id") < 100)
        .withColumnRenamed("vec_id", "query_id")
    )
    n_centroids, n_probe = 16, 4  # probe_frac 0.25
    cents = ann.train_ivf_centroids(corpus, n_centroids, 32, n_iters=5, seed=7)
    bf = ann.cosine_topk(q, corpus, 5).collect()
    ivf = ann.ivf_topk(
        q, corpus, 5, n_probe=n_probe, dim=32, centroids=cents
    ).collect()
    recall = _recall(bf, ivf)
    assert recall >= 0.9, f"recall@5={recall:.3f} at probe_frac=0.25"
    # and the trained quantizer must beat the SEEDED (untrained) one
    ivf_untrained = ann.ivf_topk(
        q, corpus, 5, n_centroids=n_centroids, n_probe=n_probe, dim=32, seed=7
    ).collect()
    assert recall >= _recall(bf, ivf_untrained) - 1e-9
