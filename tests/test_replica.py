"""Hot serving replica (serving/replica.py): the in-driver snapshot must be
ROW-IDENTICAL to the Spark suggest/autocomplete operators — scores, order,
tie-breaks, multiset duplicate-gram semantics, value resolution — across
every metric and mixed alphas.  The replica is only allowed to exist because
it is provably the same function (round-4 verdict's top item: millisecond
lone-request serving, reference ngram_index_test.go:112-139 parity)."""

import numpy as np
import pytest

from suggest_spark.config import DEFAULT_CONFIG
from suggest_spark.functions.metrics import METRICS
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.service import SuggestService
from suggest_spark.operators.suggest import autocomplete_firstk, suggest_topk
from suggest_spark.serving.replica import HotReplica

MULTISET_VALS = [
    "kamaz kaliri",  # duplicate '$ka' after normalize (multiset overlap)
    "kamazmoliri",
    "kamaz kamaz",  # heavy duplication
    "lada kalina",
    "toyota corolla",
    "лада веста",  # Cyrillic through the same alphabet chain
    "лада калина",
]
MULTISET_QUERIES = ["kamazmoliri", "kamaz kal", "kamaz kamaz", "lada", "лада к"]


def _misspell(rng, s):
    chars = list(s)
    i = rng.randint(1, max(2, len(chars) - 1))
    op = rng.randint(3)
    if op == 0:
        chars[i] = "abcdefghijklmnopqrstuvwxyz"[rng.randint(26)]
    elif op == 1:
        del chars[i]
    else:
        chars[i], chars[i - 1] = chars[i - 1], chars[i]
    return "".join(chars)


def _spark_suggest(spark, index, d, query, metric, alpha, k):
    q = spark.createDataFrame([(0, query)], "query_id long, query string")
    return [
        (r["score"], r["value"])
        for r in suggest_topk(
            index, q, metric, alpha, k, DEFAULT_CONFIG, dictionary=d
        ).collect()
    ]


def _spark_autocomplete(spark, index, d, query, k):
    q = spark.createDataFrame([(0, query)], "query_id long, query string")
    return [
        r["value"]
        for r in autocomplete_firstk(index, q, k, DEFAULT_CONFIG, dictionary=d).collect()
    ]


@pytest.fixture(scope="module")
def multiset_setup(spark):
    d = spark.createDataFrame(list(enumerate(MULTISET_VALS)), "doc_id long, value string")
    index = build_ngram_index(d, config=DEFAULT_CONFIG).cache()
    index.count()
    replica = HotReplica.from_frames(index, d, DEFAULT_CONFIG)
    return d, index, replica


def test_replica_suggest_parity_all_metrics_multiset(spark, multiset_setup):
    d, index, replica = multiset_setup
    checked = matched = 0
    for metric in METRICS.values():
        for alpha in (0.3, 0.5, 0.8):
            for q in MULTISET_QUERIES:
                want = _spark_suggest(spark, index, d, q, metric, alpha, 4)
                got = replica.suggest(q, metric, alpha, 4)
                assert got == want, f"{metric.name} alpha={alpha} q={q!r}"
                checked += 1
                matched += bool(want)
    assert checked == len(METRICS) * 3 * len(MULTISET_QUERIES)
    assert matched > 20, "fixture must exercise non-empty results"


def test_replica_autocomplete_parity(spark, multiset_setup):
    d, index, replica = multiset_setup
    for q in ["kamaz", "lada", "лада", "toy", "zzz", ""]:
        want = _spark_autocomplete(spark, index, d, q, 3)
        assert replica.autocomplete(q, 3) == want, q


def test_replica_parity_misspelled_sweep(spark):
    """Wider randomized sweep on a synthetic dictionary: one Spark batch per
    metric vs per-query replica answers — exact score/order equality."""
    from suggest_spark.sources.synth import cars_synth

    vals = cars_synth(300)
    d = spark.createDataFrame(list(enumerate(vals)), "doc_id long, value string")
    index = build_ngram_index(d, config=DEFAULT_CONFIG).cache()
    index.count()
    replica = HotReplica.from_frames(index, d, DEFAULT_CONFIG)
    rng = np.random.RandomState(5)
    queries = [(_misspell(rng, vals[rng.randint(len(vals))])) for _ in range(40)]
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, query string"
    )
    for metric in METRICS.values():
        rows = suggest_topk(
            index, qdf, metric, 0.5, 5, DEFAULT_CONFIG, dictionary=d
        ).collect()
        want = {}
        for r in rows:
            want.setdefault(r["query_id"], []).append((r["score"], r["value"]))
        for i, q in enumerate(queries):
            assert replica.suggest(q, metric, 0.5, 5) == want.get(i, []), (
                metric.name,
                q,
            )


def test_service_replica_end_to_end_and_mutator_drop(spark, tmp_path):
    """Service integration: enable_hot_replica serves identical results to
    the Spark path; an upsert DROPS the replica (never serves a pre-mutation
    snapshot) and the Spark path serves the post-upsert truth."""
    from suggest_spark.functions.metrics import JACCARD

    svc = SuggestService(spark)
    d = spark.createDataFrame(list(enumerate(MULTISET_VALS)), "doc_id long, value string")
    svc.add_disc_index("cars", d, str(tmp_path / "idx"))

    golden_s = svc.suggest("cars", "kamaz kal", JACCARD, 0.3, 4)
    golden_a = svc.autocomplete("cars", "lada", 3)
    info = svc.enable_hot_replica("cars")
    assert info["n_postings"] > 0
    assert svc._entries["cars"].replica is not None
    assert svc.suggest("cars", "kamaz kal", JACCARD, 0.3, 4) == golden_s
    assert svc.autocomplete("cars", "lada", 3) == golden_a

    new = spark.createDataFrame([(9, "kamaz kaloric")], "doc_id long, value string")
    svc.upsert_disc_index("cars", new)
    assert svc._entries["cars"].replica is None  # mutator dropped it
    post = svc.suggest("cars", "kamaz kaloric", JACCARD, 0.5, 2)
    assert post and post[0][1] == "kamaz kaloric"
    # re-enabling snapshots the POST-upsert state
    svc.enable_hot_replica("cars")
    assert svc.suggest("cars", "kamaz kaloric", JACCARD, 0.5, 2) == post


def test_warm_value_map_path_identical(spark):
    """warm() installs a driver-side value map; the Spark batch path without
    the dictionary broadcast must return identical (score, value) pairs."""
    from suggest_spark.functions.metrics import COSINE

    svc = SuggestService(spark)
    d = spark.createDataFrame(list(enumerate(MULTISET_VALS)), "doc_id long, value string")
    svc.add_ram_index("cars", d)
    golden = [svc.suggest("cars", q, COSINE, 0.4, 4) for q in MULTISET_QUERIES]
    timings = svc.warm("cars", metrics=[COSINE])
    assert set(timings) == {"autocomplete", "suggest_cosine"}
    assert svc._entries["cars"].value_map is not None
    assert [svc.suggest("cars", q, COSINE, 0.4, 4) for q in MULTISET_QUERIES] == golden


def test_replica_refuses_oversized_index(spark):
    d = spark.createDataFrame(
        [(i, f"value number {i}") for i in range(50)], "doc_id long, value string"
    )
    index = build_ngram_index(d, config=DEFAULT_CONFIG)
    with pytest.raises(ValueError, match="max_postings"):
        HotReplica.from_frames(index, d, DEFAULT_CONFIG, max_postings=10)


def test_service_remove_releases_serving_state(spark):
    """remove(): the teardown counterpart of add_* — unregisters the entry
    and unpersists what warm() pinned, so benchmarks/shutdown don't reach
    into the registry internals."""
    from suggest_spark.functions.metrics import JACCARD

    svc = SuggestService(spark)
    d = spark.createDataFrame(list(enumerate(MULTISET_VALS)), "doc_id long, value string")
    svc.add_ram_index("cars", d)
    svc.warm("cars", metrics=[JACCARD])
    svc.enable_hot_replica("cars")
    entry = svc._entries["cars"]
    assert entry.index.is_cached and entry.dictionary.is_cached
    svc.remove("cars")
    assert svc.dictionaries() == []
    assert not entry.index.is_cached and not entry.dictionary.is_cached
    with pytest.raises(KeyError):
        svc.suggest("cars", "lada", JACCARD, 0.5, 3)
    with pytest.raises(KeyError):
        svc.remove("cars")


def test_http_routes_identical_with_replica_enabled(spark):
    """The HTTP front door must serve byte-identical JSON whether the entry
    answers via the Spark path or the hot replica (the service job enables
    replicas at boot — the route contract cannot depend on which tier
    answered)."""
    pytest.importorskip("flask")
    from suggest_spark.serving.http_api import create_app

    svc = SuggestService(spark)
    d = spark.createDataFrame(list(enumerate(MULTISET_VALS)), "doc_id long, value string")
    svc.add_ram_index("cars", d)
    app = create_app(svc)
    app.testing = True
    client = app.test_client()
    qs = {"metric": "Jaccard", "similarity": 0.4, "topK": 4}
    want_s = client.get("/suggest/cars/kamaz kal/", query_string=qs).get_json()
    want_a = client.get("/autocomplete/cars/lada/", query_string={"topK": 3}).get_json()
    assert want_s and want_a

    svc.enable_hot_replica("cars")
    got_s = client.get("/suggest/cars/kamaz kal/", query_string=qs)
    got_a = client.get("/autocomplete/cars/lada/", query_string={"topK": 3})
    assert got_s.status_code == 200 and got_s.get_json() == want_s
    assert got_a.status_code == 200 and got_a.get_json() == want_a
    # error mapping unchanged through the replica tier
    assert client.get("/suggest/nope/x/", query_string=qs).status_code == 500
    svc.remove("cars")
