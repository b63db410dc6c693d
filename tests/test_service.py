"""Service-layer parity: named registry, RAM/DISC drivers, hot reindex under
concurrent queries (reference pkg/suggest/service.go + service_test.go:11-80
TestConcurrencyRAM/OnDisc semantics)."""

import threading

import pytest

from suggest_spark.functions.metrics import COSINE
from suggest_spark.operators.service import SuggestService

SERVICE_CARS = [
    "NISSAN MARCH", "NISSAN JUKE", "NISSAN MAXIMA", "NISSAN MURANO",
    "NISSAN NOTE", "NISSAN MICRA", "TOYOTA MARK II", "TOYOTA COROLLA",
    "TOYOTA CORONA", "HONDA FIT", "HONDA CIVIC", "HUMMER H1",
]
#: service_test.go:35-59 — query → expected values at Cosine α=0.7
GOLDENS = [
    ("Nissan March", ["NISSAN MARCH"]),
    ("Honda Fitt", ["HONDA FIT"]),
    ("Wolfsvagen", []),
    ("Tayota Corolla", ["TOYOTA COROLLA"]),
    ("Micra Nissan", ["NISSAN MICRA"]),
]


@pytest.fixture(scope="module")
def cars_df(spark):
    return spark.createDataFrame(
        list(enumerate(SERVICE_CARS)), "doc_id long, value string"
    ).cache()


def test_ram_service_suggest_and_autocomplete(spark, cars_df):
    svc = SuggestService(spark)
    svc.add_ram_index("cars", cars_df)
    assert svc.dictionaries() == ["cars"]
    for query, want in GOLDENS:
        got = [v for _, v in svc.suggest("cars", query, COSINE, 0.7, 5)]
        assert got == want, (query, got, want)
    assert svc.autocomplete("cars", "NISSAN", 3) == [
        "NISSAN MARCH", "NISSAN JUKE", "NISSAN MAXIMA"
    ]
    with pytest.raises(KeyError):
        svc.suggest("nope", "x", COSINE, 0.7, 5)


def test_disc_service_roundtrip(spark, cars_df, tmp_path):
    svc = SuggestService(spark)
    path = str(tmp_path / "cars_index")
    svc.add_disc_index("cars", cars_df, path)
    got = [v for _, v in svc.suggest("cars", "Nissan March", COSINE, 0.7, 5)]
    assert got == ["NISSAN MARCH"]
    # a second service opens the index WITHOUT rebuilding (rebuild=False)
    svc2 = SuggestService(spark)
    svc2.add_disc_index("cars", cars_df, path, rebuild=False)
    assert [v for _, v in svc2.suggest("cars", "Micra Nissan", COSINE, 0.7, 5)] == [
        "NISSAN MICRA"
    ]


def test_concurrent_reindex_and_query(spark, cars_df):
    """testConcurrency semantics: one thread reindexes 5×, another queries
    the golden set — every query must return the golden answer throughout
    (queries hold an immutable snapshot; the swap is atomic)."""
    svc = SuggestService(spark)
    svc.add_ram_index("cars", cars_df)
    errors: list = []

    def reindexer():
        try:
            for _ in range(5):
                svc.add_ram_index("cars", cars_df)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def querier():
        try:
            for query, want in GOLDENS:
                got = [v for _, v in svc.suggest("cars", query, COSINE, 0.7, 5)]
                assert got == want, (query, got, want)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=reindexer), threading.Thread(target=querier)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_stats_lifecycle_load_invalidate_refresh(spark, tmp_path):
    """Planner-stats lifecycle on a DISC entry booted from indexer-job
    artifacts: stats load at boot (auto plan selection armed), an upsert
    INVALIDATES them (stale doc_terms must never reach the prefix verify),
    and refresh_stats recomputes + re-arms — goldens hold at every step."""
    import os

    from jobs.indexer_job import index_config_from_description, run_index_job
    from suggest_spark.functions.metrics import JACCARD

    with open(tmp_path / "cars.dict", "w") as f:
        f.write("Nissan March\nNissan Juke\nNissan Maxima\nToyota Corolla\n")
    desc = {
        "driver": "DISC", "name": "cars", "nGramSize": 3,
        "alphabet": ["english", "$"], "source": "cars.dict",
        "output": "db", "pad": "$", "wrap": ["$", "$"],
    }
    res = run_index_job(spark, desc, str(tmp_path))
    assert os.path.exists(os.path.join(res["stats"], "stats.json"))
    assert res["index_stats"]["num_docs"] == 4

    svc = SuggestService(spark)
    svc.load_disc_index("cars", str(tmp_path / "db"), index_config_from_description(desc))
    entry = svc._get("cars")
    assert entry.stats is not None and entry.stats.num_docs == 4

    def golden():
        return [v for _, v in svc.suggest("cars", "Nissan ma", JACCARD, 0.5, 2)]

    assert golden() == ["Nissan Maxima", "Nissan March"]

    # upsert: doc added → stats invalidated, plain plan serves correctly
    new = spark.createDataFrame([(10, "Nissan Micra")], "doc_id long, value string")
    svc.upsert_disc_index("cars", new)
    entry = svc._get("cars")
    assert entry.stats is None and entry.stats_path is not None
    assert golden() == ["Nissan Maxima", "Nissan March"]
    assert [v for _, v in svc.suggest("cars", "Nissan Micra", JACCARD, 0.5, 1)] == [
        "Nissan Micra"
    ]

    # refresh: stats recomputed from the CURRENT index, auto re-armed
    written = svc.refresh_stats("cars")
    assert written["num_docs"] == 5
    entry = svc._get("cars")
    assert entry.stats is not None and entry.stats.num_docs == 5
    assert golden() == ["Nissan Maxima", "Nissan March"]


def test_upsert_invalidates_stats_on_disk_for_later_boots(spark, tmp_path):
    """The staleness gate must hold ACROSS processes: stats persisted before
    an upsert describe the old snapshot, so a fresh service booting from the
    same warehouse after the upsert must come up with stats=None (plain
    plan), not re-arm pre-upsert doc_terms."""
    from jobs.indexer_job import index_config_from_description, run_index_job
    from suggest_spark.functions.metrics import JACCARD

    with open(tmp_path / "cars.dict", "w") as f:
        f.write("Nissan March\nNissan Juke\n")
    desc = {
        "driver": "DISC", "name": "cars", "nGramSize": 3,
        "alphabet": ["english", "$"], "source": "cars.dict",
        "output": "db", "pad": "$", "wrap": ["$", "$"],
    }
    run_index_job(spark, desc, str(tmp_path))
    cfg = index_config_from_description(desc)

    svc = SuggestService(spark)
    svc.load_disc_index("cars", str(tmp_path / "db"), cfg)
    assert svc._get("cars").stats is not None
    new = spark.createDataFrame([(10, "Nissan Micra")], "doc_id long, value string")
    svc.upsert_disc_index("cars", new)

    svc2 = SuggestService(spark)  # simulated restart
    svc2.load_disc_index("cars", str(tmp_path / "db"), cfg)
    assert svc2._get("cars").stats is None
    # correctness unaffected: plain plan serves the post-upsert corpus
    assert [v for _, v in svc2.suggest("cars", "Nissan Micra", JACCARD, 0.5, 1)] == [
        "Nissan Micra"
    ]


def test_trickle_upserts_keep_dictionary_lineage_bounded(spark, tmp_path):
    """Each upsert must serve a dictionary with a FLAT plan (re-read of the
    persisted table, or a localCheckpoint when nothing is persisted) — not
    the previous in-memory dictionary with another join+union chained on.
    An unbounded chain recomputes every historical upsert on cache eviction
    and eventually overflows the driver's plan budget under trickle updates."""
    from jobs.indexer_job import index_config_from_description, run_index_job
    from suggest_spark.functions.metrics import JACCARD

    with open(tmp_path / "cars.dict", "w") as f:
        f.write("Nissan March\nNissan Juke\n")
    desc = {
        "driver": "DISC", "name": "cars", "nGramSize": 3,
        "alphabet": ["english", "$"], "source": "cars.dict",
        "output": "db", "pad": "$", "wrap": ["$", "$"],
    }
    run_index_job(spark, desc, str(tmp_path))
    svc = SuggestService(spark)
    svc.load_disc_index("cars", str(tmp_path / "db"), index_config_from_description(desc))

    for i, name in enumerate(["Nissan Micra", "Nissan Note", "Nissan Murano"]):
        new = spark.createDataFrame([(100 + i, name)], "doc_id long, value string")
        svc.upsert_disc_index("cars", new)

    plan = (
        svc._get("cars")
        .dictionary._jdf.queryExecution().analyzed().toString()
    )
    # flat re-read of the versioned table: the anti-join/union upsert
    # arithmetic ran once at write time and must NOT survive into serving
    assert "Join" not in plan and "Union" not in plan
    got = [v for _, v in svc.suggest("cars", "Nissan Murano", JACCARD, 0.5, 1)]
    assert got == ["Nissan Murano"]


def test_upsert_without_dict_artifact_survives_restart(spark, tmp_path):
    """Entries registered via add_disc_index (no dictionary artifact) get a
    service-owned versioned dictionary sibling on upsert: the on-disk index
    keeps upserted docs across restarts, so serving them against the
    caller's pre-upsert dictionary frame would resolve their values to
    null.  A restart that re-opens the entry must serve the post-upsert
    values; a restart that REBUILDS must reset the sibling to the caller's
    corpus."""
    from suggest_spark.functions.metrics import JACCARD

    path = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(0, "Nissan March"), (1, "Toyota Corolla")], "doc_id long, value string"
    )
    svc = SuggestService(spark)
    svc.add_disc_index("cars", base, path)
    new = spark.createDataFrame([(7, "Mazda Demio")], "doc_id long, value string")
    svc.upsert_disc_index("cars", new)

    # restart: fresh service re-opens the path with the PRE-upsert frame
    svc2 = SuggestService(spark)
    svc2.add_disc_index("cars", base, path, rebuild=False)
    got = svc2.suggest("cars", "mazda de", JACCARD, 0.3, 3)
    assert [v for _, v in got] == ["Mazda Demio"]  # value, not null

    # restart with REBUILD: caller's corpus is the new truth everywhere —
    # a later upsert must merge into it, not into the stale sibling
    svc3 = SuggestService(spark)
    svc3.add_disc_index("cars", base, path, rebuild=True)
    assert svc3.suggest("cars", "mazda de", JACCARD, 0.3, 3) == []
    svc3.upsert_disc_index(
        "cars",
        spark.createDataFrame([(9, "Honda Fit")], "doc_id long, value string"),
    )
    vals = {
        v
        for _, v in svc3.suggest("cars", "honda fit", JACCARD, 0.1, 5)
    }
    assert "Honda Fit" in vals and "Mazda Demio" not in vals
