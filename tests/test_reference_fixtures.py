"""Rank parity on the reference's GENUINE fixture files.

The reference ships its real benchmark dictionaries —
``pkg/suggest/testdata/cars.dict`` (5,066 car model names) and
``words.dict`` (235,887 English words) — and fixed query sets
(ngram_index_test.go:193-213 cars / :141-165 words, Cosine α=0.5 k=5).
These tests run the actual files through the engine and assert the full
(doc_id, score) ranking equals a pure-Python reimplementation of the
reference semantics (tokenize → length filter → threshold validity →
ScanCount multiset overlap → score → top-k with (score desc, id asc)
tie-break) — the same oracle family the merger/metric goldens pin down.
"""

import os

import pytest

from suggest_spark.config import DEFAULT_CONFIG
from suggest_spark.functions.analysis import tokenize
from suggest_spark.functions.metrics import COSINE
from suggest_spark.linkage.scoring import overlap_py
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.suggest import autocomplete_firstk, suggest_topk

CARS_DICT = "/root/reference/pkg/suggest/testdata/cars.dict"
WORDS_DICT = "/root/reference/pkg/suggest/testdata/words.dict"

#: ngram_index_test.go:193-213 (benchmarkRealExample)
CARS_QUERIES = [
    "Nissan Mar",
    "Hnda Fi",
    "Mersdes Benz",
    "Tayota carolla",
    "Nssan Skylike",
    "Nissan Juke",
    "Dodje iper",
    "Hummer",
    "tayota",
]
#: ngram_index_test.go:141-165 (BenchmarkSuggestWordsOnDisc)
WORDS_QUERIES = [
    "testing",
    "Acuracacy",
    "Indpendence",
    "Villictiy",
    "Velocity",
    "matehmatica",
    "acationally",
    "misleading",
    "litter",
    "arthroendoscopy",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(CARS_DICT), reason="reference fixtures not present"
)


def _load_lines(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f]


def suggest_oracle_py(doc_terms, by_size, query, metric, alpha, k):
    """Pure-Python reference-semantics top-k over a pre-tokenized corpus.

    ``doc_terms``: doc_id → term list; ``by_size``: size → [doc_id] (the
    LengthFilter's segment structure, pkg/index/indices.go:3-14).
    """
    qt = tokenize(query, DEFAULT_CONFIG)
    la = len(qt)
    if la == 0:
        return []
    bmin = max(metric.min_y_py(alpha, la), 1)
    bmax = metric.max_y_py(alpha, la)
    cands = []
    for size in range(bmin, bmax + 1):
        t = metric.threshold_py(alpha, la, size)
        if t < 1 or t > la or t > size:  # suggester.go:73-77
            continue
        for doc_id in by_size.get(size, ()):
            ov = overlap_py(qt, doc_terms[doc_id])
            if ov >= t:
                cands.append((doc_id, metric.similarity_py(ov, la, size)))
    cands.sort(key=lambda c: (-c[1], c[0]))
    return cands[:k]


def _corpus(values):
    doc_terms = {i: tokenize(v, DEFAULT_CONFIG) for i, v in enumerate(values)}
    by_size: dict[int, list[int]] = {}
    for i, ts in doc_terms.items():
        by_size.setdefault(len(ts), []).append(i)
    return doc_terms, by_size


def _rank_parity(spark, values, queries, alpha=0.5, k=5):
    doc_terms, by_size = _corpus(values)
    dictionary = spark.createDataFrame(
        list(enumerate(values)), "doc_id long, value string"
    )
    index = build_ngram_index(dictionary, config=DEFAULT_CONFIG).cache()
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, query string"
    )
    got = suggest_topk(index, qdf, COSINE, alpha, k, DEFAULT_CONFIG).collect()
    index.unpersist()
    got_by_q: dict[int, list] = {}
    for r in got:
        got_by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, query in enumerate(queries):
        want = suggest_oracle_py(doc_terms, by_size, query, COSINE, alpha, k)
        have = got_by_q.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (query, have, want)
        for (_, sa), (_, sb) in zip(have, want):
            assert abs(sa - sb) < 1e-12, (query, sa, sb)


def test_cars_dict_rank_parity(spark):
    values = _load_lines(CARS_DICT)
    assert len(values) == 5066  # the genuine file, not a subset
    _rank_parity(spark, values, CARS_QUERIES)


def test_words_dict_rank_parity(spark):
    values = _load_lines(WORDS_DICT)
    assert len(values) == 235886 or len(values) == 235887
    _rank_parity(spark, values, WORDS_QUERIES)


def test_cars_dict_autocomplete_first5(spark):
    """First-k autocomplete over the genuine cars.dict: k smallest doc ids
    whose gram multiset contains every head-wrapped query gram
    (autocomplete.go:40-77 + collector.go:96-115 semantics)."""
    values = _load_lines(CARS_DICT)
    qt = tokenize("Nissan", DEFAULT_CONFIG, head_only=True)
    want = []
    for i, v in enumerate(values):
        dt = tokenize(v, DEFAULT_CONFIG)
        if len(dt) >= len(qt) and overlap_py(qt, dt) >= len(qt):
            want.append(i)
        if len(want) == 5:
            break
    dictionary = spark.createDataFrame(
        list(enumerate(values)), "doc_id long, value string"
    )
    index = build_ngram_index(dictionary, config=DEFAULT_CONFIG)
    q = spark.createDataFrame([(0, "Nissan")], "query_id long, query string")
    rows = autocomplete_firstk(index, q, 5, DEFAULT_CONFIG).collect()
    assert [r["doc_id"] for r in rows] == want
    assert len(want) == 5
