"""Request coalescing for interactive serving: fold N concurrent
single-query requests into ONE Spark job.

The reference's flagship surface is millisecond autocomplete off a hot mmap
index (/root/reference/pkg/suggest/ngram_index_test.go:112-139 benches
per-query µs; internal/suggest/api/app.go:73-77 serves it).  A Spark driver
cannot match per-request microseconds — every action pays scheduler latency
— but it must not pay that latency N TIMES for N concurrent users.  The
suggest/autocomplete operators are batch-shaped already (their queries side
is a ``query_id``-keyed DataFrame), so the fix is a classic request
coalescer:

* callers (HTTP worker threads) enqueue ``(params, Event)`` and block;
* ONE dispatcher thread drains everything queued, groups by identical
  search parameters ``(kind, dict, metric, similarity, topk)``, and runs a
  single ``suggest_batch``/``autocomplete_batch`` job per group;
* while a group's job runs, new arrivals FOR THAT KEY pile up in the queue
  and form its next batch — each key's batch window is its own previous
  job's latency (groups are tracked in flight individually, so a slow
  dictionary never head-of-line blocks another group's next batch) — and
  throughput scales with concurrency at roughly constant per-batch cost
  (the measured batched rate is 300-400 q/s at sf0.1 vs ~1 q/s for serial
  per-request jobs).

No timed window is needed (and none is used): a lone request dispatches
immediately — its latency is one Spark job, same as the uncoalesced path.

Results are row-identical to the per-request path: ``suggest_batch`` runs
the same plan with the same final ordering, just keyed by ``query_id``.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


def _as_exception(e: BaseException) -> Exception:
    """Callers re-raise stored errors; a BaseException (SystemExit, ...)
    must not escape an HTTP worker thread as-is."""
    return e if isinstance(e, Exception) else RuntimeError(repr(e))


@dataclass
class _Pending:
    key: tuple
    query: str
    done: threading.Event = field(default_factory=threading.Event)
    result: object = None
    error: Exception | None = None


class RequestCoalescer:
    """Blocking ``suggest``/``autocomplete`` facade over a
    :class:`~suggest_spark.operators.service.SuggestService` that batches
    concurrent callers into single Spark jobs.

    ``max_batch`` caps one dispatch's group size (overflow stays queued for
    the next round — backpressure, not rejection).
    """

    def __init__(self, service, max_batch: int = 512, group_workers: int = 4):
        self._service = service
        self._max_batch = max_batch
        self._lock = threading.Lock()
        self._queue: list[_Pending] = []
        self._inflight: set[tuple] = set()  # keys with a dispatch running
        self._wake = threading.Event()
        # distinct parameter groups in one drain run CONCURRENTLY (Spark
        # schedules jobs from multiple threads fine) — otherwise dictionary
        # B's callers wait head-of-line behind dictionary A's whole job
        from concurrent.futures import ThreadPoolExecutor

        self._group_pool = ThreadPoolExecutor(
            max_workers=group_workers, thread_name_prefix="suggest-coalescer-group"
        )
        self._dispatcher = threading.Thread(
            target=self._run, daemon=True, name="suggest-coalescer"
        )
        self._dispatcher.start()

    # -- caller side ---------------------------------------------------------

    def suggest(self, name, query, metric, similarity, topk):
        key = ("suggest", name, metric.name, float(similarity), int(topk))
        return self._submit(key, query)

    def autocomplete(self, name, query, topk):
        key = ("autocomplete", name, int(topk))
        return self._submit(key, query)

    def dictionaries(self):  # pass-through: registry reads need no batching
        return self._service.dictionaries()

    def _submit(self, key: tuple, query: str):
        req = _Pending(key, query)
        with self._lock:
            self._queue.append(req)
        self._wake.set()
        req.done.wait()
        if req.error is not None:
            raise req.error
        return req.result

    # -- dispatcher side -----------------------------------------------------

    def _run(self):
        while True:
            pending_submit: list[tuple[tuple, list[_Pending]]] = []
            try:
                self._wake.wait()
                with self._lock:
                    # claim, PER KEY, everything queued for keys with no
                    # dispatch in flight (up to max_batch each); a key whose
                    # previous job is still running keeps its arrivals queued
                    # — its next batch window is ITS OWN job's latency, and a
                    # slow dictionary never head-of-line blocks another key's
                    # next batch (each group re-drains independently via the
                    # completion wake below)
                    claimed: dict[tuple, list[_Pending]] = {}
                    rest: list[_Pending] = []
                    for req in self._queue:
                        if req.key not in self._inflight and (
                            len(claimed.setdefault(req.key, [])) < self._max_batch
                        ):
                            claimed[req.key].append(req)
                        else:
                            rest.append(req)
                    self._queue = rest
                    self._inflight |= set(claimed)
                    # always clear: leftovers for in-flight keys are re-woken
                    # by that key's completion, new arrivals re-set the event
                    # — leaving it set would spin this loop on a queue that
                    # has nothing dispatchable yet
                    self._wake.clear()
                pending_submit = list(claimed.items())
                while pending_submit:
                    key, reqs = pending_submit[0]
                    self._group_pool.submit(self._dispatch_group, key, reqs)
                    pending_submit.pop(0)
            except BaseException as e:  # noqa: BLE001 — the ONLY dispatcher:
                # if it died, every current and future caller would block
                # forever on done.wait(); fail the not-yet-submitted groups
                # (submitted ones complete through _dispatch_group as usual)
                with self._lock:
                    for key, _ in pending_submit:
                        self._inflight.discard(key)
                for _, reqs in pending_submit:
                    for req in reqs:
                        if not req.done.is_set():
                            req.error = _as_exception(e)
                            req.done.set()

    def _dispatch_group(self, key: tuple, reqs: list[_Pending]) -> None:
        """Pool-side wrapper: run the group's job, then free the key and
        re-wake the dispatcher so arrivals queued behind this key drain."""
        try:
            self._dispatch(key, reqs)
        finally:
            with self._lock:
                self._inflight.discard(key)
            self._wake.set()

    def _dispatch(self, key: tuple, reqs: list[_Pending]) -> None:
        queries = [r.query for r in reqs]
        try:
            if key[0] == "suggest":
                _, name, metric_name, similarity, topk = key
                from ..functions.metrics import METRICS

                results = self._service.suggest_batch(
                    name, queries, METRICS[metric_name], similarity, topk
                )
            else:
                _, name, topk = key
                results = self._service.autocomplete_batch(name, queries, topk)
            if len(results) != len(reqs):  # a short list must not strand the
                # surplus callers on done.wait() forever
                raise RuntimeError(
                    f"batch returned {len(results)} results for {len(reqs)} queries"
                )
            for req, res in zip(reqs, results):
                req.result = res
                req.done.set()
        except BaseException as e:  # propagate to EVERY caller in the group
            for req in reqs:
                if not req.done.is_set():
                    req.error = _as_exception(e)
                    req.done.set()
