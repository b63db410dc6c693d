"""Batch spellchecker predict/eval (round-2 verdict #2): predict_batch must
return EXACTLY the per-query predict() output for every case — including
fuzzy-fallback and no-context cases — while the whole eval runs as a bounded
number of Spark jobs, not 2-3 jobs per case."""

from pyspark.sql import functions as F  # noqa: F401 (plan debugging)

from suggest_spark.config import IndexConfig
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.lm import build_ngram_counts
from suggest_spark.operators.spellcheck import evaluate, predict, predict_batch
from suggest_spark.sources.dictionary import from_list

CORPUS = [
    "i am sam",
    "sam i am",
    "i do not like green eggs and ham",
]

CASES = [
    "sam i a",      # context + autocomplete hit, LM-ranked
    "gre",          # no context → autocomplete order
    "i do not li",  # longer context (order adjustment path)
    "sam x",        # autocomplete miss → fuzzy fallback fills
    "do n",         # short context, wrap-left path
    "",             # empty query → []
]


def _fixtures(spark):
    sents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "sent_id long, text string"
    )
    counts = build_ngram_counts(sents, 3)
    cfg = IndexConfig(ngram_size=2)
    vocab = from_list(spark, sorted({w for s in CORPUS for w in s.split()})).cache()
    index = build_ngram_index(vocab, config=cfg).cache()
    index.count()
    return vocab, index, counts, cfg


def test_predict_batch_matches_per_query_predict(spark):
    vocab, index, counts, cfg = _fixtures(spark)
    want = {
        i: predict(vocab, index, counts, 3, q, topk=3, similarity=0.4, config=cfg)
        for i, q in enumerate(CASES)
    }
    got = predict_batch(
        vocab, index, counts, 3, list(enumerate(CASES)), topk=3, similarity=0.4,
        config=cfg,
    )
    assert got == want


def test_eval_job_count_independent_of_cases(spark):
    """Eval is ONE plan regardless of case count: the Spark job count (AQE
    stage materializations included) must not grow with cases — the round-2
    per-case path ran 2-3 ACTIONS (dozens of AQE jobs) per extra case."""
    vocab, index, counts, cfg = _fixtures(spark)
    sc = spark.sparkContext

    def run(sentences, group):
        sc.setJobGroup(group, "count")
        try:
            report = evaluate(
                vocab, index, counts, 3, sentences, topk=5, similarity=0.5, config=cfg
            )
        finally:
            sc.setJobGroup(None, None)
        return report, len(sc.statusTracker().getJobIdsForGroup(group))

    small, jobs_small = run([CORPUS[0].split()], "eval-2-cases")  # 2 cases
    big, jobs_big = run(
        [CORPUS[0].split(), CORPUS[2].split()[:4]], "eval-5-cases"
    )  # 5 cases
    assert small["n_cases"] == 2 and big["n_cases"] == 5
    assert big["hit_at_k"] == 1.0  # in-corpus cases on a tiny vocab
    # 2.5× the cases, same plan: allow only constant slack (extra distinct
    # context length → one more broadcast), never linear growth
    assert jobs_big <= jobs_small + 6, (jobs_small, jobs_big)


def test_eval_report_unchanged_from_round2_golden(spark):
    """The round-2 eval golden (test_spellchecker_eval_harness) through the
    batched path: identical report."""
    vocab, index, counts, cfg = _fixtures(spark)
    report = evaluate(
        vocab, index, counts, 3, [CORPUS[0].split()], topk=5, similarity=0.5,
        config=cfg,
    )
    assert report["n_cases"] == 2
    assert report["hit_at_k"] == 1.0
    assert report["mrr"] == 1.0
