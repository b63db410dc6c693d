"""End-to-end ranking goldens from the reference test suite.

* TestSuggestAuto   — /root/reference/pkg/suggest/ngram_index_test.go:15-40
* TestAutoComplete  — ngram_index_test.go:42-67
* Example (Cosine)  — example_test.go:14-72
* service_test set  — service_test.go:35-59 (Cosine α=0.7 over a cars corpus)
"""

import pytest
from pyspark.sql import functions as F

from suggest_spark.config import DEFAULT_CONFIG, ENGLISH_CONFIG
from suggest_spark.functions.metrics import COSINE, JACCARD
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.suggest import autocomplete_firstk, suggest_topk

CARS8 = [
    "Nissan March",
    "Nissan Juke",
    "Nissan Maxima",
    "Nissan Murano",
    "Nissan Note",
    "Toyota Mark II",
    "Toyota Corolla",
    "Toyota Corona",
]


@pytest.fixture(scope="module")
def cars8_index(spark):
    dictionary = spark.createDataFrame(list(enumerate(CARS8)), "doc_id long, value string")
    index = build_ngram_index(dictionary, config=DEFAULT_CONFIG).cache()
    index.count()
    return dictionary, index


def _q(spark, text):
    return spark.createDataFrame([(0, text)], "query_id long, query string")


def test_suggest_auto_golden(spark, cars8_index):
    # "Nissan ma", Jaccard, alpha=0.5, k=2 → doc keys [2, 0]
    dictionary, index = cars8_index
    rows = suggest_topk(index, _q(spark, "Nissan ma"), JACCARD, 0.5, 2, DEFAULT_CONFIG).collect()
    assert [r["doc_id"] for r in rows] == [2, 0]


def test_autocomplete_golden(spark, cars8_index):
    # "Niss", k=5 → doc keys [0, 1, 2, 3, 4]
    dictionary, index = cars8_index
    rows = autocomplete_firstk(index, _q(spark, "Niss"), 5, DEFAULT_CONFIG).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4]


def test_example_cosine_golden(spark):
    # english+'$' alphabet config; "niss ma", Cosine, alpha=0.4, k=5
    # → values [Nissan Maxima, Nissan March]
    dictionary = spark.createDataFrame(list(enumerate(CARS8)), "doc_id long, value string")
    index = build_ngram_index(dictionary, config=ENGLISH_CONFIG)
    rows = suggest_topk(
        index, _q(spark, "niss ma"), COSINE, 0.4, 5, ENGLISH_CONFIG, dictionary=dictionary
    ).collect()
    assert [r["value"] for r in rows] == ["Nissan Maxima", "Nissan March"]


SERVICE_CARS = [
    "NISSAN MARCH",
    "NISSAN JUKE",
    "NISSAN MAXIMA",
    "NISSAN MURANO",
    "NISSAN NOTE",
    "NISSAN MICRA",
    "TOYOTA MARK II",
    "TOYOTA COROLLA",
    "TOYOTA CORONA",
    "HONDA FIT",
    "HONDA CIVIC",
    "HUMMER H1",
]


@pytest.mark.parametrize(
    "query,expected",
    [
        ("Nissan March", ["NISSAN MARCH"]),
        ("Honda Fitt", ["HONDA FIT"]),
        ("Wolfsvagen", []),
        ("Tayota Corolla", ["TOYOTA COROLLA"]),
        ("Micra Nissan", ["NISSAN MICRA"]),
    ],
)
def test_service_cosine_07(spark, query, expected):
    # service_test.go:35-59 semantics: Cosine, alpha=0.7, k=5 — high-threshold
    # matching over an uppercase car corpus (corpus synthesized per
    # FIXTURES.md §2; the reference uses cars.dict which contains these rows)
    dictionary = spark.createDataFrame(
        list(enumerate(SERVICE_CARS)), "doc_id long, value string"
    )
    index = build_ngram_index(dictionary, config=DEFAULT_CONFIG)
    rows = suggest_topk(
        index, _q(spark, query), COSINE, 0.7, 5, DEFAULT_CONFIG, dictionary=dictionary
    ).collect()
    assert [r["value"] for r in rows] == expected


def test_suggest_batch_of_queries(spark, cars8_index):
    # batching many queries through one plan must equal per-query runs
    dictionary, index = cars8_index
    queries = spark.createDataFrame(
        [(0, "Nissan ma"), (1, "toyota c"), (2, "zzzz")],
        "query_id long, query string",
    )
    rows = suggest_topk(index, queries, JACCARD, 0.5, 2, DEFAULT_CONFIG).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert by_q[0] == [2, 0]
    assert 2 not in by_q or by_q.get(2) is None or len(by_q.get(2, [])) == 0


def test_scores_match_reference_formula(spark, cars8_index):
    dictionary, index = cars8_index
    rows = suggest_topk(index, _q(spark, "Nissan ma"), JACCARD, 0.5, 2, DEFAULT_CONFIG).collect()
    # |A|=9 grams for "$nissan ma$"; doc 2 "Nissan Maxima": check exact score
    from suggest_spark.functions.analysis import tokenize
    from suggest_spark.functions.metrics import JACCARD as J

    a = tokenize("Nissan ma")
    b = tokenize("Nissan Maxima")
    # overlap = sum over terms of mult_a * mult_b (ScanCount semantics)
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    inter = sum(ca[t] * cb[t] for t in ca)
    expected = J.similarity_py(inter, len(a), len(b))
    assert rows[0]["doc_id"] == 2
    assert abs(rows[0]["score"] - expected) < 1e-15


def test_prefix_path_equals_plain_path(spark, cars8_index):
    # suggest_topk_prefix (distributed CPMerge prefix filter) must return
    # EXACTLY the rows of the unfiltered plan, for every metric, on both
    # golden queries and noisy ones
    from suggest_spark.functions.metrics import DICE, OVERLAP
    from suggest_spark.operators.suggest import suggest_topk_prefix

    dictionary, index = cars8_index
    queries = spark.createDataFrame(
        [
            (0, "Nissan ma"),
            (1, "niss ma"),
            (2, "Honda f"),
            (3, "zzzz qqqq"),
            (4, ""),
            (5, "Toyota Corolla"),
        ],
        "query_id long, query string",
    )
    for metric, alpha in [(JACCARD, 0.5), (COSINE, 0.4), (DICE, 0.6), (OVERLAP, 0.8)]:
        plain = [
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in suggest_topk(index, queries, metric, alpha, 3, DEFAULT_CONFIG).collect()
        ]
        pref = [
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in suggest_topk_prefix(
                index, queries, metric, alpha, 3, DEFAULT_CONFIG
            ).collect()
        ]
        assert pref == plain, f"{metric.name} alpha={alpha}"


def test_prefix_path_multiset_duplicates(spark):
    # normalization can re-create duplicate grams after raw-gram dedup
    # ("kamaz kaliri" -> '$ka' twice: once from the wrap, once from the
    # normalized space); overlap is then the ScanCount multiset PRODUCT,
    # which the prefix path must reproduce (and its prefix bound must
    # widen by kappa*delta_max)
    from suggest_spark.operators.suggest import suggest_topk_prefix

    vals = [
        "kamaz kaliri",     # duplicate '$ka' after normalize
        "kamazmoliri",
        "kamaz kamaz",      # heavy duplication
        "lada kalina",
        "toyota corolla",
    ]
    d = spark.createDataFrame(list(enumerate(vals)), "doc_id long, value string")
    index = build_ngram_index(d, config=DEFAULT_CONFIG).cache()
    queries = spark.createDataFrame(
        [(0, "kamazmoliri"), (1, "kamaz kal"), (2, "kamaz kamaz"), (3, "lada")],
        "query_id long, query string",
    )
    for metric, alpha in [(JACCARD, 0.3), (COSINE, 0.5)]:
        plain = [
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in suggest_topk(index, queries, metric, alpha, 4, DEFAULT_CONFIG).collect()
        ]
        pref = [
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in suggest_topk_prefix(
                index, queries, metric, alpha, 4, DEFAULT_CONFIG
            ).collect()
        ]
        assert pref == plain, f"{metric.name} alpha={alpha}"
        assert plain, "fixture must produce matches"


def test_no_broadcast_queries_path_identical(spark):
    """broadcast_queries=False (the web-scale huge-batch regime where the
    query side itself shuffles) must produce byte-identical results to the
    broadcast path, and its plan must not broadcast the gram side."""
    from suggest_spark.sources.dictionary import from_list

    dictionary = from_list(
        spark,
        ["Nissan March", "Nissan Juke", "Nissan Maxima", "Toyota Corolla",
         "Toyota Corona", "Honda Fit", "Lada Kalina", "Mazda Demio"],
    )
    index = build_ngram_index(dictionary, config=DEFAULT_CONFIG).cache()
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(
            ["nissan ma", "toyta cor", "hnda fi", "lada", "mazda de"] * 4)],
        "query_id long, query string",
    )

    def rows(broadcast):
        out = suggest_topk(
            index, queries, JACCARD, 0.4, 3, DEFAULT_CONFIG,
            dictionary=dictionary, broadcast_queries=broadcast,
        )
        return [(r["query_id"], r["doc_id"], r["score"], r["rank"], r["value"])
                for r in out.collect()]

    assert rows(False) == rows(True)
    assert rows(True), "fixture must produce matches"
