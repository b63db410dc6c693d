"""Calibrate select_suggest_plan's crossover constants with MEASUREMENTS.

The selector (operators/suggest.py select_suggest_plan) picks the plain
gram-stream plan or the CPMerge prefix plan from persisted index stats.  Its
round-3 thresholds (min_postings=10^8, skew_ratio=0.25) were argued from a
single 2.4M-posting measurement; this harness times BOTH plans over a grid
of synthetic indexes (corpus scale × hot-gram skew), asserts row parity
while it's at it, and records the measured winner matrix + the implied
crossovers in ``bench_out/CALIBRATION_suggest.json``.  bench.py folds the
summary into its detail block so the numbers travel with every round.

Grid design:

* **scale axis** — n_docs × ~3 words/doc ≈ 30 postings/doc.  Local hosts
  can't reach the 10^8-posting regime (that's the 100 TB cluster's corner);
  what CAN be measured is the per-posting cost trend of each plan, which is
  what the extrapolation note in the JSON records.
* **skew axis** — ``hot_frac`` of documents share one injected token, so its
  grams hit ``hot_frac · n_docs`` docs (max_df/num_docs ≈ hot_frac).
  Queries are sampled FROM the dictionary (hot queries appear at the same
  rate users would hit them) and lightly misspelled, so the fuzzy path does
  real work.

Usage: python bench_calibrate_suggest.py  (≈5-10 min on local[32];
env SPARK_GRAFT_CAL_DOCS / _REPS / _QUERIES shrink it for smoke runs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from suggest_spark.config import DEFAULT_CONFIG
from suggest_spark.functions.metrics import JACCARD
from suggest_spark.operators.indexing import (
    build_ngram_index,
    read_index_stats,
    write_index_stats,
)
from suggest_spark.operators.suggest import suggest_topk, suggest_topk_prefix
from suggest_spark.plans.session import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DOC_SCALES = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_CAL_DOCS", "25000,100000,400000,1600000"
    ).split(",")
]
HOT_FRACS = [0.0, 0.25, 0.6]
#: above this scale only the crossover BRACKET is timed (the 0.25 midpoint
#: adds ~4 minutes per scale and rounds 3-4 showed it always loses to plain
#: below the 0.6 crossover) — the round-5 XL step exists to measure whether
#: the no-skew per-posting trend lines converge toward the min_postings
#: extrapolation, not to re-litigate the mid-skew cell
XL_DOCS = 400_000
XL_HOT_FRACS = [0.0, 0.6]
N_QUERIES = int(os.environ.get("SPARK_GRAFT_CAL_QUERIES", "200"))
REPS = int(os.environ.get("SPARK_GRAFT_CAL_REPS", "2"))
ALPHA, TOPK = 0.5, 5


def make_cal_dictionary(spark, n_docs: int, hot_frac: float, seed: int = 7):
    """(doc_id, value) of 3-word synthetic names; ``hot_frac`` of them share
    one token, whose grams become the corpus's hot grams."""
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def word():
        return "".join(rng.choice(letters, rng.randint(4, 9)))

    vocab = [word() for _ in range(4000)]
    rows = []
    for i in range(n_docs):
        words = [vocab[rng.randint(len(vocab))] for _ in range(3)]
        if rng.rand() < hot_frac:
            words[rng.randint(3)] = "zumzumzum"  # the injected hot token
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, value string")


def _misspell(rng, s: str) -> str:
    chars = list(s)
    i = rng.randint(1, max(2, len(chars) - 1))
    chars[i] = "abcdefghijklmnopqrstuvwxyz"[rng.randint(26)]
    return "".join(chars)


def _best_of(fn, reps=REPS):
    best, result = float("inf"), None
    for _ in range(reps):
        t0 = time.time()
        result = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), result


def main() -> None:
    spark = get_spark(
        app_name="calibrate_suggest", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    rng = np.random.RandomState(11)
    tmp = tempfile.mkdtemp(prefix="cal_suggest_")
    cells = []
    try:
        for n_docs in DOC_SCALES:
            for hot in HOT_FRACS if n_docs <= XL_DOCS else XL_HOT_FRACS:
                d = make_cal_dictionary(spark, n_docs, hot).persist()
                index = build_ngram_index(d, config=DEFAULT_CONFIG)
                path = f"{tmp}/idx_{n_docs}_{int(hot * 100)}"
                index.write.mode("overwrite").partitionBy("size").parquet(path)
                idx = spark.read.parquet(path)
                write_index_stats(spark, idx, f"{path}_stats")
                stats = read_index_stats(spark, f"{path}_stats")

                sample = [r["value"] for r in d.where(
                    F.col("doc_id").isin([int(x) for x in rng.randint(0, n_docs, N_QUERIES)])
                ).collect()][:N_QUERIES]
                queries = spark.createDataFrame(
                    [(i, _misspell(rng, s)) for i, s in enumerate(sample)],
                    "query_id long, query string",
                )

                t_plain, n_plain = _best_of(
                    lambda: suggest_topk(
                        idx, queries, JACCARD, ALPHA, TOPK, DEFAULT_CONFIG
                    ).count()
                )
                t_prefix, n_prefix = _best_of(
                    lambda: suggest_topk_prefix(
                        idx, queries, JACCARD, ALPHA, TOPK, DEFAULT_CONFIG,
                        term_df=stats.term_df, doc_terms=stats.doc_terms,
                        delta_max=stats.delta_max,
                    ).count()
                )
                assert n_plain == n_prefix, (n_plain, n_prefix)  # row parity
                cell = {
                    "n_docs": n_docs,
                    "hot_frac": hot,
                    "num_postings": stats.num_postings,
                    "max_df_ratio": round(stats.max_df / max(stats.num_docs, 1), 4),
                    "t_plain": t_plain,
                    "t_prefix": t_prefix,
                    "winner": "prefix" if t_prefix < t_plain else "plain",
                    "speedup_prefix_over_plain": round(t_plain / max(t_prefix, 1e-9), 3),
                    "result_rows": n_plain,
                }
                cells.append(cell)
                print(json.dumps(cell), flush=True)
                d.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # measured skew crossover: at each scale, the smallest hot_frac where the
    # prefix plan wins (None = plain won everywhere at that scale)
    crossover = {}
    for n_docs in DOC_SCALES:
        wins = sorted(
            c["max_df_ratio"] for c in cells
            if c["n_docs"] == n_docs and c["winner"] == "prefix"
        )
        crossover[str(n_docs)] = wins[0] if wins else None
    # per-posting cost trend at the largest scale (extrapolation evidence for
    # the min_postings threshold, which local scales cannot reach directly)
    big = [c for c in cells if c["n_docs"] == DOC_SCALES[-1] and c["hot_frac"] == 0.0]
    trend = {
        "plain_us_per_posting": round(1e6 * big[0]["t_plain"] / big[0]["num_postings"], 3)
        if big else None,
        "prefix_us_per_posting": round(1e6 * big[0]["t_prefix"] / big[0]["num_postings"], 3)
        if big else None,
    }
    out = {
        "grid": cells,
        "skew_crossover_max_df_ratio_by_scale": crossover,
        "largest_scale_trend": trend,
        "n_queries": N_QUERIES,
        "reps": REPS,
        "cpus": int(CPUS),
    }
    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/CALIBRATION_suggest.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"calibration": "written", **{"skew_crossover": crossover}}))
    spark.stop()


if __name__ == "__main__":
    main()
