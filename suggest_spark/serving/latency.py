"""Lone-request serving latency: measure the Spark floor honestly.

The reference's flagship bench is per-query latency off a hot mmap index
(/root/reference/pkg/suggest/ngram_index_test.go:112-139 — microseconds per
lookup).  A Spark driver cannot match that for ONE request: the floor is one
scheduled job (plan analysis + task scheduling + collect).  What the engine
CAN do is keep that floor at its minimum — :meth:`SuggestService.warm` pins
the entry's index/dictionary in executor memory and pre-compiles the
generated code per metric, so a user's first keystroke doesn't pay the
4-20x cold-start multiple — and measure the result per round instead of
hand-waving it.

This module is that measurement, shared by two consumers:

* ``bench.py`` reports ``lone_request_{cold,p50,p95}_sec`` in every round's
  BENCH detail (the round-4 verdict's done-criterion for its top item);
* ``tests/test_warm_serving.py`` runs it in a FRESH JVM (subprocess) and
  asserts the warm path beats the cold first request by a real margin —
  in-suite sessions are already codegen-warm, so only a fresh process
  measures a genuine cold start.

Under CONCURRENCY the lone-request floor is not paid per user: the request
coalescer (serving/coalesce.py) folds N concurrent requests into ~one job
per parameter group, so per-user latency stays near the lone floor while
throughput tracks the batched rate (300-400 q/s at sf0.1).
"""

from __future__ import annotations

import time


def _pct(sorted_samples: list[float], p: float) -> float:
    """Nearest-rank percentile of an ascending list (p in [0, 1])."""
    i = min(len(sorted_samples) - 1, max(0, int(round(p * (len(sorted_samples) - 1)))))
    return sorted_samples[i]


def measure_lone_requests(
    service,
    name: str,
    metric,
    queries: list[str],
    similarity: float = 0.5,
    topk: int = 5,
    warm_metrics=None,
) -> dict:
    """Measure single-request latency on entry ``name``: one COLD request
    (run this on a freshly registered entry, before any query has touched
    it), then :meth:`SuggestService.warm`, then one timed lone request per
    remaining query string.

    ``queries[0]`` is the cold probe; ``queries[1:]`` are the warm samples
    (distinct strings so no two requests are trivially identical).
    ``warm_metrics`` defaults to just ``metric`` — pass None-able list to
    warm more of the surface (bench warms only what it measures so the
    reported cold/warm split stays attributable).

    Returns ``{"cold_sec", "warm_probe_sec", "p50_sec", "p95_sec",
    "mean_sec", "n_warm"}`` — wall seconds, nearest-rank percentiles."""
    if len(queries) < 3:
        raise ValueError("need >= 3 query strings (1 cold probe + >= 2 warm samples)")
    t0 = time.time()
    service.suggest(name, queries[0], metric, similarity, topk)
    cold = time.time() - t0

    t0 = time.time()
    service.warm(name, metrics=warm_metrics if warm_metrics is not None else [metric])
    warm_probe = time.time() - t0

    samples: list[float] = []
    for q in queries[1:]:
        t0 = time.time()
        service.suggest(name, q, metric, similarity, topk)
        samples.append(time.time() - t0)
    samples.sort()
    return {
        "cold_sec": round(cold, 4),
        "warm_probe_sec": round(warm_probe, 4),
        "p50_sec": round(_pct(samples, 0.50), 4),
        "p95_sec": round(_pct(samples, 0.95), 4),
        "mean_sec": round(sum(samples) / len(samples), 4),
        "n_warm": len(samples),
    }
