"""Skew hardening for the dedup tiers (VERDICT r1 #5) and the no-hidden-
driver-jobs guarantee for the default linkage path (VERDICT r1 #8)."""

import pytest
from pyspark.sql import functions as F

from suggest_spark.operators import dedup

N_DOCS = 120


@pytest.fixture(scope="module")
def near_copy_docs(spark):
    """documents ∪ near-copies (last word dropped) of every 7th doc —
    the same fixture shape the driver oracle uses."""
    base = [
        (i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(12))) for i in range(N_DOCS)
    ]
    near = [(i + 100000, " ".join(t.split()[:-1])) for i, t in base if i % 7 == 0]
    df = spark.createDataFrame(base + near, "doc_id long, text string")
    return df.withColumn("shingles", dedup.shingle_words(F.col("text"), 5)).cache()


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_jaccard_prefix_blocked_equals_plain(near_copy_docs):
    plain = dedup.jaccard_near_dup_pairs(near_copy_docs, 0.5)
    blocked = dedup.jaccard_near_dup_pairs(near_copy_docs, 0.5, prefix_blocked=True)
    got_p = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in plain.collect()}
    got_b = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in blocked.collect()}
    assert got_p == got_b
    assert len(got_p) > 0


def test_minhash_bucket_cap_preserves_recall(near_copy_docs):
    """A generous cap must not lose any pair vs the uncapped version; a tiny
    cap must enumerate what it dropped."""
    uncapped = _pair_set(dedup.minhash_lsh_pairs(near_copy_docs, 8, 2))
    capped = _pair_set(
        dedup.minhash_lsh_pairs(near_copy_docs, 8, 2, max_bucket_size=50)
    )
    assert capped == uncapped
    assert len(uncapped) > 0

    tiny = _pair_set(dedup.minhash_lsh_pairs(near_copy_docs, 8, 2, max_bucket_size=1))
    dropped = dedup.oversized_minhash_buckets(near_copy_docs, 1, 8, 2).collect()
    assert tiny == set()  # every pair needs a bucket of >= 2
    assert len(dropped) > 0
    assert all(r["bucket_n"] > 1 for r in dropped)


def test_hash_id_mode_matches_dense_mode(spark, near_copy_docs):
    """Unbounded-term-space path (VERDICT 100TB lens): windowless hash tids
    must yield the SAME final matches as dense rank tids (candidate sets may
    differ — exact verification makes the output identical), with no window
    stage in the id assignment and injective ids on this corpus."""
    from suggest_spark.functions.metrics import JACCARD
    from suggest_spark.linkage.blocking import (
        assert_injective_tids,
        candidate_pairs,
        encode_records,
        term_id_table,
    )
    from suggest_spark.linkage.scoring import score_pairs

    records = near_copy_docs.select(
        F.col("doc_id").alias("rid"), F.col("text"), F.col("shingles").alias("terms")
    )

    tt_hash = term_id_table(records, hash_ids=True)
    assert_injective_tids(tt_hash)
    plan = tt_hash._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no single-partition ranking stage

    def _matches(hash_ids, broadcast_terms):
        enc = encode_records(
            records, hash_ids=hash_ids, broadcast_terms=broadcast_terms
        )
        pairs = candidate_pairs(enc, JACCARD, 0.5, dedup=False, delta_max=0)
        out = score_pairs(
            pairs, records, JACCARD, 0.5, dedup_pairs=True, encoded=enc
        )
        return {
            (r["rid_a"], r["rid_b"], round(r["sim"], 9)) for r in out.collect()
        }

    dense = _matches(False, True)
    hashed = _matches(True, False)  # shuffle-join encode, the web-scale shape
    assert dense == hashed
    assert len(dense) > 0


def test_default_linkage_path_runs_no_hidden_jobs(spark, near_copy_docs):
    """Plan CONSTRUCTION of the default blocking+scoring path must trigger
    zero Spark jobs (no size-probe count(), no delta_max first()) — the
    VERDICT r1 'kill the hidden driver jobs' criterion.  Jobs are detected
    via a dedicated job group."""
    from suggest_spark.functions.metrics import JACCARD
    from suggest_spark.linkage.blocking import candidate_pairs, encode_records
    from suggest_spark.linkage.scoring import score_pairs

    records = near_copy_docs.select(
        F.col("doc_id").alias("rid"),
        F.col("text"),
        F.col("shingles").alias("terms"),
    )
    sc = spark.sparkContext
    group = "plan-construction-guard"
    sc.setJobGroup(group, "must stay empty")
    try:
        encoded = encode_records(records)
        pairs = candidate_pairs(encoded, JACCARD, 0.5, dedup=False, delta_max=0)
        matches = score_pairs(
            pairs, records, JACCARD, 0.5, dedup_pairs=True, encoded=encoded
        )
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    assert tracker.getJobIdsForGroup(group) == [], (
        "plan construction ran Spark jobs: %s" % (tracker.getJobIdsForGroup(group),)
    )
    # sanity: the constructed plan still executes and matches exist
    assert matches.count() > 0


def test_jaccard_set_semantics_with_duplicate_shingles(spark):
    """Callers may pass un-deduped shingle arrays; set-Jaccard semantics
    require dropping duplicates, and both paths must agree with the oracle
    computed on the distinct sets (regression: delta_max=0 with raw
    multisets silently lost pairs on the prefix path)."""
    import pyspark.sql.functions as F

    from suggest_spark.operators import dedup

    rows = [
        (1, ["a", "a", "a", "b", "c", "d"]),   # distinct: {a,b,c,d}
        (2, ["a", "b", "c", "d", "d", "d"]),   # distinct: {a,b,c,d} -> j=1.0
        (3, ["a", "b", "x", "y", "y"]),        # distinct: {a,b,x,y}
    ]
    docs = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    want = {(1, 2): 1.0, (1, 3): 2 / 6, (2, 3): 2 / 6}
    for blocked in (False, True):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_near_dup_pairs(
                docs, 0.3, prefix_blocked=blocked
            ).collect()
        }
        assert got.keys() == {k for k, v in want.items() if v >= 0.3}
        for k, v in got.items():
            assert abs(v - want[k]) < 1e-12, (blocked, k)
