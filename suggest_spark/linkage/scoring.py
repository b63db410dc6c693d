"""Pairwise candidate scoring: exact reference n-gram similarity in a
batched Arrow pandas UDF, plus Levenshtein / Jaro-Winkler tie-breakers.

Score parity: ``overlap`` is the ScanCount product Σ_t mult_a(t)·mult_b(t)
(each occurrence of a doc in each query-term posting list increments the
candidate — /root/reference/pkg/merger/scan_count.go:55-80), and
``sim = 1 − Distance(overlap, |A|, |B|)`` with the reference metric formulas
(pkg/metric/*.go) over MULTISET cardinalities — so a pair scored here gets
exactly the score the reference's suggest pipeline would assign.

Levenshtein runs JVM-side (built-in ``F.levenshtein`` — no Python);
Jaro-Winkler is vectorized per Arrow batch in the pandas UDF (no per-row
Python round trips; the north rule mandates pandas/Arrow UDFs only).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from ..functions.metrics import METRICS, Metric


def overlap_py(terms_a: list[str], terms_b: list[str]) -> int:
    """ScanCount multiset overlap: Σ_t mult_a(t) × mult_b(t)."""
    ca, cb = Counter(terms_a), Counter(terms_b)
    if len(cb) < len(ca):
        ca, cb = cb, ca
    return sum(m * cb[t] for t, m in ca.items() if t in cb)


def jaro_winkler_py(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity (public formula)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    match_window = max(l1, l2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * l1
    flags2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(l2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    k = 0
    transpositions = 0
    for i in range(l1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    jaro = (
        matches / l1 + matches / l2 + (matches - transpositions) / matches
    ) / 3.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


_SCORE_SCHEMA = StructType(
    [
        StructField("overlap", IntegerType()),
        StructField("sim", DoubleType()),
        StructField("jw", DoubleType()),
    ]
)


def _score_udf(metric_name: str):
    metric = METRICS[metric_name]

    @F.pandas_udf(_SCORE_SCHEMA)
    def _score(
        terms_a: pd.Series, terms_b: pd.Series, text_a: pd.Series, text_b: pd.Series
    ) -> pd.DataFrame:
        overlaps = []
        sims = []
        jws = []
        for ta, tb, xa, xb in zip(terms_a, terms_b, text_a, text_b):
            ta = list(ta) if ta is not None else []
            tb = list(tb) if tb is not None else []
            ov = overlap_py(ta, tb)
            sa, sb = len(ta), len(tb)
            sims.append(metric.similarity_py(ov, sa, sb) if ov and sa and sb else 0.0)
            overlaps.append(ov)
            jws.append(jaro_winkler_py(xa or "", xb or ""))
        return pd.DataFrame({"overlap": overlaps, "sim": sims, "jw": jws})

    return _score


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    metric: Metric,
    alpha: float,
) -> DataFrame:
    """Score candidate pairs and keep matches with sim >= alpha.

    ``pairs``   — (rid_a, rid_b)
    ``records`` — (rid, url, text, terms, size)

    Returns (rid_a, rid_b, overlap, size_a, size_b, sim, lev, jw).
    The two record joins shuffle on rid — the same key the pair generation
    produced, so AQE coalesces them; records side can be bucketed by rid in a
    warehouse deployment to make both joins co-located.
    """
    a = records.select(
        F.col("rid").alias("rid_a"),
        F.col("text").alias("text_a"),
        F.col("terms").alias("terms_a"),
        F.col("size").alias("size_a"),
    )
    b = records.select(
        F.col("rid").alias("rid_b"),
        F.col("text").alias("text_b"),
        F.col("terms").alias("terms_b"),
        F.col("size").alias("size_b"),
    )
    enriched = pairs.join(a, "rid_a").join(b, "rid_b")

    scored = enriched.withColumn(
        "sc", _score_udf(metric.name)("terms_a", "terms_b", "text_a", "text_b")
    ).withColumn("lev", F.levenshtein("text_a", "text_b"))

    return (
        scored.select(
            "rid_a",
            "rid_b",
            F.col("sc.overlap").alias("overlap"),
            "size_a",
            "size_b",
            F.col("sc.sim").alias("sim"),
            "lev",
            F.col("sc.jw").alias("jw"),
        )
        .where(F.col("sim") >= alpha)
    )
