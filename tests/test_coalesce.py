"""Request coalescing (serving/coalesce.py): N concurrent single-query
requests fold into far fewer Spark jobs (round-3 verdict's done-criterion),
with responses row-identical to the per-request path."""

import threading
import time

from suggest_spark.serving.coalesce import RequestCoalescer


class _FakeMetric:
    name = "jaccard"


class _RecordingService:
    """suggest_batch stub: records batch sizes, simulates one Spark job's
    latency so concurrent callers pile into the next dispatch."""

    def __init__(self, job_sec=0.15):
        self.batches = []
        self.job_sec = job_sec

    def suggest_batch(self, name, queries, metric, similarity, topk):
        self.batches.append(len(queries))
        time.sleep(self.job_sec)
        return [[(1.0, f"echo:{q}")] for q in queries]

    def autocomplete_batch(self, name, queries, topk):
        self.batches.append(len(queries))
        time.sleep(self.job_sec)
        return [[f"ac:{q}"] for q in queries]


def test_concurrent_requests_coalesce_to_few_dispatches():
    svc = _RecordingService()
    co = RequestCoalescer(svc)
    n = 16
    results = [None] * n

    def call(i):
        results[i] = co.suggest("cars", f"q{i}", _FakeMetric(), 0.5, 5)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    [t.start() for t in threads]
    [t.join(30) for t in threads]

    assert all(results[i] == [(1.0, f"echo:q{i}")] for i in range(n))
    assert sum(svc.batches) == n  # every request served exactly once
    # the point: far fewer dispatches than requests — while dispatch #1 ran,
    # the rest piled into (at most a couple of) follow-up batches
    assert len(svc.batches) <= n // 2, svc.batches
    assert max(svc.batches) > 1


def test_distinct_param_groups_dispatch_separately_and_errors_propagate():
    class _Failing(_RecordingService):
        def suggest_batch(self, name, queries, metric, similarity, topk):
            if name == "boom":
                raise KeyError("unknown dictionary: 'boom'")
            return super().suggest_batch(name, queries, metric, similarity, topk)

    svc = _Failing(job_sec=0.0)
    co = RequestCoalescer(svc)
    assert co.suggest("cars", "a", _FakeMetric(), 0.5, 5) == [(1.0, "echo:a")]
    assert co.autocomplete("cars", "b", 3) == ["ac:b"]
    outcome = {}

    def bad():
        try:
            co.suggest("boom", "x", _FakeMetric(), 0.5, 5)
        except KeyError as e:
            outcome["err"] = e

    t = threading.Thread(target=bad)
    t.start()
    t.join(10)
    assert "err" in outcome  # service errors reach the blocked caller


def test_coalesced_http_routes_match_direct_path(spark):
    """Route goldens through coalesce=True equal the direct service path,
    and N concurrent GETs drive ≪N batch dispatches on a REAL service."""
    import pytest

    pytest.importorskip("flask")
    from suggest_spark.operators.service import SuggestService
    from suggest_spark.serving.http_api import create_app

    svc = SuggestService(spark)
    dictionary = spark.createDataFrame(
        [(0, "Nissan March"), (1, "Nissan Juke"), (2, "Honda Fit")],
        "doc_id long, value string",
    )
    svc.add_ram_index("cars", dictionary)

    direct = create_app(svc)
    direct.testing = True
    qs = {"metric": "Jaccard", "similarity": 0.5, "topK": 5}
    # golden BEFORE instrumenting: the per-request path is itself a batch of
    # one since round 4, so it would otherwise count against the coalescer
    want = direct.test_client().get("/suggest/cars/Nissan March/", query_string=qs)

    calls = []
    real_batch = svc.suggest_batch

    def counting_batch(name, queries, metric, similarity, topk):
        calls.append(len(queries))
        return real_batch(name, queries, metric, similarity, topk)

    svc.suggest_batch = counting_batch
    app = create_app(svc, coalesce=True)
    app.testing = True

    n = 8
    got = [None] * n

    def hit(i):
        got[i] = app.test_client().get("/suggest/cars/Nissan March/", query_string=qs)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(n)]
    [t.start() for t in threads]
    [t.join(120) for t in threads]

    for r in got:
        assert r.status_code == 200 and r.get_json() == want.get_json()
    assert sum(calls) == n and len(calls) < n, calls
    # unknown dictionary still maps to 500 through the coalescer
    assert app.test_client().get(
        "/suggest/nope/x/", query_string=qs
    ).status_code == 500


def test_dispatcher_survives_base_exceptions_and_short_results():
    """Review findings: a BaseException from the service, or a batch result
    list shorter than the request group, must error the affected callers —
    never kill the dispatcher or strand a caller on done.wait()."""

    class _Hostile(_RecordingService):
        def __init__(self):
            super().__init__(job_sec=0.0)
            self.mode = "ok"

        def suggest_batch(self, name, queries, metric, similarity, topk):
            if self.mode == "exit":
                raise SystemExit(3)
            if self.mode == "short":
                return [[(1.0, "only-one")]][: max(0, len(queries) - 1)] or []
            return super().suggest_batch(name, queries, metric, similarity, topk)

    svc = _Hostile()
    co = RequestCoalescer(svc)

    svc.mode = "exit"
    try:
        co.suggest("cars", "a", _FakeMetric(), 0.5, 5)
        raise AssertionError("expected an error")
    except Exception as e:
        assert "SystemExit" in repr(e)

    svc.mode = "short"
    try:
        co.suggest("cars", "b", _FakeMetric(), 0.5, 5)
        raise AssertionError("expected an error")
    except RuntimeError as e:
        assert "results" in str(e)

    svc.mode = "ok"  # the dispatcher is still alive and serving
    assert co.suggest("cars", "c", _FakeMetric(), 0.5, 5) == [(1.0, "echo:c")]


def test_slow_group_does_not_block_other_groups_next_batches():
    """ADVICE r4: the dispatcher must NOT barrier a whole drain on every
    group's future — while dictionary A's slow job runs, dictionary B must
    keep getting fresh dispatches (B's batch window is B's own job latency,
    not A's)."""
    slow_started = threading.Event()
    release_slow = threading.Event()

    class _TwoSpeed(_RecordingService):
        def __init__(self):
            super().__init__(job_sec=0.0)

        def suggest_batch(self, name, queries, metric, similarity, topk):
            if name == "slow":
                slow_started.set()
                assert release_slow.wait(30)
            return super().suggest_batch(name, queries, metric, similarity, topk)

    svc = _TwoSpeed()
    co = RequestCoalescer(svc)
    slow_result = {}

    def slow_call():
        slow_result["r"] = co.suggest("slow", "s", _FakeMetric(), 0.5, 5)

    t = threading.Thread(target=slow_call)
    t.start()
    assert slow_started.wait(10)
    # with the slow group's job IN FLIGHT, several sequential fast requests
    # must each complete (each one is a fresh dispatch for the fast key)
    for i in range(3):
        assert co.suggest("fast", f"q{i}", _FakeMetric(), 0.5, 5) == [
            (1.0, f"echo:q{i}")
        ]
    release_slow.set()
    t.join(10)
    assert slow_result["r"] == [(1.0, "echo:s")]
