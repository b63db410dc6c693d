"""HTTP front-door parity: the Flask shim serves the reference API routes
(/root/reference/internal/suggest/api/app.go:73-77) over SuggestService and
returns the service-golden values (service_test.go:35-59 semantics, same
goldens as tests/test_service.py)."""

import json
import os
import signal

import pytest

pytest.importorskip("flask")

from suggest_spark.operators.service import SuggestService
from suggest_spark.serving import create_app, service_from_config

CARS = [
    "NISSAN MARCH", "NISSAN JUKE", "NISSAN MAXIMA", "NISSAN MURANO",
    "NISSAN NOTE", "NISSAN MICRA", "TOYOTA MARK II", "TOYOTA COROLLA",
    "TOYOTA CORONA", "HONDA FIT", "HONDA CIVIC", "HUMMER H1",
]
#: service_test.go:35-59 — query -> expected values at Cosine a=0.7
GOLDENS = [
    ("Nissan March", ["NISSAN MARCH"]),
    ("Honda Fitt", ["HONDA FIT"]),
    ("Wolfsvagen", []),
    ("Tayota Corolla", ["TOYOTA COROLLA"]),
    ("Micra Nissan", ["NISSAN MICRA"]),
]


@pytest.fixture(scope="module")
def client(spark):
    svc = SuggestService(spark)
    svc.add_ram_index(
        "cars",
        spark.createDataFrame(list(enumerate(CARS)), "doc_id long, value string"),
    )
    app = create_app(svc)
    app.testing = True
    return app.test_client()


def test_home_route(client):
    r = client.get("/")
    assert r.status_code == 200 and r.mimetype == "application/json"
    body = r.get_json()
    assert body["project"] == "suggest_spark" and body["version"] == "v1"


def test_dict_list(client):
    r = client.get("/dict/list/")
    assert r.status_code == 200 and r.get_json() == ["cars"]


def test_suggest_route_service_goldens(client):
    for query, want in GOLDENS:
        r = client.get(
            f"/suggest/cars/{query}/",
            query_string={"metric": "Cosine", "similarity": 0.7, "topK": 5},
        )
        assert r.status_code == 200, (query, r.data)
        items = r.get_json()
        assert [it["Value"] for it in items] == want, (query, items)
        for it in items:  # ResultItem shape, service.go:11-17
            assert set(it) == {"Score", "Value"} and isinstance(it["Score"], float)


def test_autocomplete_route(client):
    r = client.get("/autocomplete/cars/NISSAN/", query_string={"topK": 3})
    assert r.status_code == 200
    items = r.get_json()
    # autocomplete ResultItems carry Score 0 (service.go:169)
    assert [it["Value"] for it in items] == [
        "NISSAN MARCH", "NISSAN JUKE", "NISSAN MAXIMA"
    ]
    assert all(it["Score"] == 0 for it in items)
    # no trailing slash also routes (mux StrictSlash analogue)
    assert client.get("/autocomplete/cars/NISSAN", query_string={"topK": 1}).status_code == 200


def test_error_mapping(client):
    # buildSearchConfig failures -> 400 (suggest_handler.go:78-103)
    assert client.get("/suggest/cars/x/", query_string={"metric": "Nope"}).status_code == 400
    # reference parity: the metric map is case-sensitive on capitalized
    # names (suggest_handler.go:26-33) — lowercase is a 400 there too
    assert client.get(
        "/suggest/cars/x/", query_string={"metric": "jaccard"}
    ).status_code == 400
    assert client.get(
        "/suggest/cars/x/", query_string={"metric": "Cosine", "topK": "-1"}
    ).status_code == 400
    assert client.get(
        "/suggest/cars/x/", query_string={"metric": "Cosine", "similarity": "2.0"}
    ).status_code == 400
    # unknown dictionary -> 500 for reference parity (suggest_handler.go:55 TODO)
    assert client.get(
        "/suggest/nope/x/", query_string={"metric": "Cosine"}
    ).status_code == 500
    assert client.get("/autocomplete/nope/x/").status_code == 500
    # reindex without a configured job -> 500
    assert client.post("/internal/reindex/").status_code == 500


def _write_config(tmp_path, terms):
    with open(tmp_path / "cars.dict", "w") as f:
        f.write("\n".join(terms) + "\n")
    desc = [{
        "driver": "DISC", "name": "cars", "nGramSize": 3,
        "alphabet": ["english", "$"], "source": "cars.dict",
        "output": "db", "pad": "$", "wrap": ["$", "$"],
    }]
    cfg = tmp_path / "config.json"
    with open(cfg, "w") as f:
        json.dump(desc, f)
    return str(cfg)


def test_reindex_route_full_loop(spark, tmp_path):
    """configureService -> serve -> POST /internal/reindex picks up a changed
    source dictionary (app.go:47-68 reindexJob semantics)."""
    cfg = _write_config(tmp_path, ["Nissan March", "Toyota Corolla"])
    svc, reindex_job = service_from_config(spark, cfg)
    app = create_app(svc, reindex_job)
    app.testing = True
    c = app.test_client()

    r = c.get("/suggest/cars/Nissan March/",
              query_string={"metric": "Jaccard", "similarity": 0.5, "topK": 5})
    assert [it["Value"] for it in r.get_json()] == ["Nissan March"]

    # grow the source dictionary, then hot-reindex over HTTP
    _write_config(tmp_path, ["Nissan March", "Toyota Corolla", "Honda Fit"])
    r = c.post("/internal/reindex/")
    assert r.status_code == 200 and r.data == b"OK"
    r = c.get("/suggest/cars/Honda Fitt/",
              query_string={"metric": "Jaccard", "similarity": 0.5, "topK": 5})
    assert [it["Value"] for it in r.get_json()] == ["Honda Fit"]


def test_sighup_reindex_and_pidfile(spark, tmp_path):
    """service-run process plumbing: pidfile (app.go:94-109) and SIGHUP ->
    reindex (app.go:47-68), driven in-process."""
    from jobs.http_service_job import install_sighup_reindex, write_pid_file

    pid_path = tmp_path / "run" / "suggest.pid"
    write_pid_file(str(pid_path))
    assert pid_path.read_text() == str(os.getpid())

    cfg = _write_config(tmp_path, ["Nissan March"])
    svc, reindex_job = service_from_config(spark, cfg)
    _write_config(tmp_path, ["Nissan March", "Honda Fit"])
    state = install_sighup_reindex(reindex_job)  # background worker (default)
    os.kill(os.getpid(), signal.SIGHUP)  # handler runs synchronously; rebuild doesn't
    assert state["thread"] is not None and state["thread"].is_alive()
    assert state["wait_idle"](300)  # long-lived worker: wait, don't join
    got = svc.suggest("cars", "Honda Fit", __import__(
        "suggest_spark.functions.metrics", fromlist=["JACCARD"]).JACCARD, 0.5, 5)
    assert [v for _, v in got] == ["Honda Fit"]


def test_ram_description_is_served(spark, tmp_path):
    """A RAM-driver description must be REGISTERED and served, not skipped:
    the reference's indexer skips RAM dictionaries but its service builds
    them in memory via AddIndexByDescription (app.go:110-137).  Reindex
    rebuilds the in-memory entry from the (possibly changed) source."""
    with open(tmp_path / "cars.dict", "w") as f:
        f.write("Nissan March\n")
    desc = [{
        "driver": "RAM", "name": "ramcars", "nGramSize": 3,
        "alphabet": ["english", "$"], "source": "cars.dict",
        "output": "db", "pad": "$", "wrap": ["$", "$"],
    }]
    cfg = tmp_path / "config.json"
    with open(cfg, "w") as f:
        json.dump(desc, f)

    svc, reindex_job = service_from_config(spark, str(cfg))
    from suggest_spark.functions.metrics import JACCARD

    got = svc.suggest("ramcars", "Nissan March", JACCARD, 0.5, 5)
    assert [v for _, v in got] == ["Nissan March"]
    # no DISC artifacts were written for the RAM entry
    assert not os.path.exists(tmp_path / "db" / "ramcars_index")

    with open(tmp_path / "cars.dict", "w") as f:
        f.write("Nissan March\nHonda Fit\n")
    reindex_job()
    got = svc.suggest("ramcars", "Honda Fit", JACCARD, 0.5, 5)
    assert [v for _, v in got] == ["Honda Fit"]


def test_sighup_coalesces_to_one_followup_run():
    """SIGHUPs landing while a rebuild is in flight must coalesce into
    exactly ONE follow-up run — never zero (a config change mid-rebuild
    would be silently dropped) and never N (signal storms must not queue
    N rebuilds).  Matches the Go buffered-signal-channel behavior."""
    import threading
    import time

    from jobs.http_service_job import install_sighup_reindex

    runs = []
    release = threading.Event()
    started = threading.Event()

    def reindex_job():
        runs.append(time.time())
        started.set()
        release.wait(60)

    state = install_sighup_reindex(reindex_job)
    os.kill(os.getpid(), signal.SIGHUP)
    assert started.wait(30)
    # three more signals while run #1 is blocked: fold into ONE follow-up
    for _ in range(3):
        os.kill(os.getpid(), signal.SIGHUP)
    release.set()
    assert state["wait_idle"](30)
    time.sleep(0.2)  # a third run, were one wrongly queued, would start now
    assert state["wait_idle"](30)
    assert len(runs) == 2  # initial + exactly one coalesced follow-up


def test_sighup_worker_survives_base_exception():
    """Review finding: a SystemExit escaping reindex_job must not kill the
    single long-lived worker — later SIGHUPs still reindex."""
    import threading
    import time

    from jobs.http_service_job import install_sighup_reindex

    runs = []

    def reindex_job():
        runs.append(time.time())
        if len(runs) == 1:
            raise SystemExit(2)

    state = install_sighup_reindex(reindex_job)
    try:
        os.kill(os.getpid(), signal.SIGHUP)
        assert state["wait_idle"](30)
        os.kill(os.getpid(), signal.SIGHUP)
        assert state["wait_idle"](30)
        assert len(runs) == 2 and state["thread"].is_alive()
    finally:
        state["stop"]()
