"""Round-4 manifest-commit hardening (fsutil.publish_text_atomic +
versioned.set_manifest_committer): no torn manifest is ever readable, torn
files left by NON-atomic writers fall back to the previous snapshot, and the
commit primitive is injectable for object stores (conditional-put fakes)."""

import json
import threading
import time

import pytest

from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.versioned import (
    _commit,
    read_manifest,
    read_versioned_index,
    set_manifest_committer,
    write_versioned_index,
)
from suggest_spark.sources import fsutil

DICT = [(0, "Nissan March"), (1, "Toyota Corolla")]


def _write_v1(spark, base):
    d = spark.createDataFrame(DICT, "doc_id long, value string")
    return write_versioned_index(build_ngram_index(d), base)


def test_publish_text_atomic_exclusive_and_replace(spark, tmp_path):
    p = f"{tmp_path}/artifact.json"
    fsutil.publish_text_atomic(spark, p, '{"a": 1}')
    assert json.loads(fsutil.read_text(spark, p)) == {"a": 1}
    with pytest.raises(FileExistsError):
        fsutil.publish_text_atomic(spark, p, '{"a": 2}')
    fsutil.publish_text_atomic(spark, p, '{"a": 2}', overwrite=True)
    assert json.loads(fsutil.read_text(spark, p)) == {"a": 2}
    # no temp droppings left behind
    assert all(not n.startswith(".") for n in fsutil.list_names(spark, str(tmp_path)))


def test_publish_replace_never_torn_under_concurrent_reads(spark, tmp_path):
    """Racing reader of a repeatedly-replaced artifact (the stats.json shape)
    always parses a COMPLETE payload — rename gives all-or-nothing
    visibility, unlike the round-3 create-then-stream write."""
    p = f"{tmp_path}/stats.json"
    fsutil.publish_text_atomic(spark, p, json.dumps({"v": 0, "pad": "x" * 4096}))
    errors, stop = [], threading.Event()

    def reader():
        while not stop.is_set():
            try:
                payload = json.loads(fsutil.read_text(spark, p))
                assert len(payload["pad"]) == 4096
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        for v in range(1, 40):
            fsutil.publish_text_atomic(
                spark, p, json.dumps({"v": v, "pad": "x" * 4096}), overwrite=True
            )
    finally:
        stop.set()
        t.join()
    assert not errors, errors


def test_read_manifest_falls_back_on_torn_current(spark, tmp_path):
    """A torn/truncated HIGHEST manifest (non-atomic writer, pre-round-4 log)
    must not take readers down: current-resolution falls back to the previous
    manifest, whose grace-kept data still resolves; an explicitly requested
    version still raises."""
    base = str(tmp_path / "idx")
    m1 = _write_v1(spark, base)
    # simulate a torn v2: a truncated JSON prefix, non-atomically visible
    fsutil.write_text(spark, f"{base}/_manifests/v00000002.json", '{"version": 2, "par')
    assert read_manifest(spark, base) == m1
    assert read_versioned_index(spark, base).count() > 0
    with pytest.raises(ValueError):
        read_manifest(spark, base, version=2)
    # a torn SOLE manifest still raises — nothing to fall back to
    base2 = str(tmp_path / "idx2")
    fsutil.write_text(spark, f"{base2}/_manifests/v00000001.json", "{")
    with pytest.raises(ValueError):
        read_manifest(spark, base2)


def test_concurrent_reads_during_slow_nonatomic_commit(spark, tmp_path):
    """The round-3 verdict's done-criterion: interleave a SLOW manifest write
    with concurrent read_versioned_index calls and never error.  The slow
    writer is a deliberately torn-prone injected committer (streams the JSON
    in two halves with a pause) — the parse-failure fallback keeps every
    reader on the previous consistent snapshot."""
    base = str(tmp_path / "idx")
    _write_v1(spark, base)
    baseline = read_versioned_index(spark, base).count()
    assert baseline > 0

    def slow_torn_committer(s, path, text):
        fs, hpath, _ = fsutil._fs(s, path)
        stream = fs.create(hpath, False)
        try:
            stream.write(bytearray(text[: len(text) // 2].encode("utf-8")))
            stream.hflush() if hasattr(stream, "hflush") else None
            time.sleep(0.6)
            stream.write(bytearray(text[len(text) // 2 :].encode("utf-8")))
        finally:
            stream.close()

    errors, stop = [], threading.Event()

    def reader():
        while not stop.is_set():
            try:
                assert read_versioned_index(spark, base).count() == baseline
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    previous = set_manifest_committer(slow_torn_committer)
    t = threading.Thread(target=reader)
    t.start()
    try:
        d = spark.createDataFrame(DICT, "doc_id long, value string")
        write_versioned_index(build_ngram_index(d), base)  # v2, slow commit
        time.sleep(0.3)  # a few reads strictly after the commit completed
    finally:
        stop.set()
        t.join()
        set_manifest_committer(previous)
    assert not errors, errors
    assert read_manifest(spark, base)["version"] == 2


def test_injected_conditional_put_committer_lost_race(spark, tmp_path):
    """The S3A extension point: an object-store deployment injects a
    conditional-put commit.  Two replicas committing the SAME version: the
    fake's compare-and-set admits exactly one; the loser raises instead of
    silently overwriting the winner's snapshot."""
    base = str(tmp_path / "idx")
    _write_v1(spark, base)

    claimed, lock = set(), threading.Lock()

    def conditional_put(s, path, text):
        with lock:  # the catalog/DynamoDB-style atomic claim
            if path in claimed:
                raise FileExistsError(f"conditional put failed: {path}")
            claimed.add(path)
        fsutil.publish_text_atomic(s, path, text, overwrite=True)

    previous = set_manifest_committer(conditional_put)
    try:
        manifest = {"version": 2, "partitions": {}}
        outcomes = []

        def committer():
            try:
                _commit(spark, base, manifest)
                outcomes.append("ok")
            except FileExistsError:
                outcomes.append("lost")

        threads = [threading.Thread(target=committer) for _ in range(2)]
        [t.start() for t in threads]
        [t.join() for t in threads]
    finally:
        set_manifest_committer(previous)
    assert sorted(outcomes) == ["lost", "ok"]
    assert read_manifest(spark, base)["version"] == 2


def test_read_manifest_vanished_file_semantics(spark, tmp_path, monkeypatch):
    """ADVICE r4 + round-5 review: a manifest deleted by a concurrent
    gc_versions between listing and read raises an IO/FS error, not
    ValueError — the fallback must survive it for OLDER versions (the only
    ones GC can delete).  On the NEWEST manifest the same error is a
    TRANSIENT failure: falling back there would let an upsert silently
    merge against — and republish — a stale snapshot, so it must raise."""
    import suggest_spark.operators.versioned as versioned

    base = str(tmp_path / "idx")
    m1 = _write_v1(spark, base)
    d = spark.createDataFrame(DICT + [(2, "Honda Fit")], "doc_id long, value string")
    m2 = write_versioned_index(build_ngram_index(d), base)
    # v3: a TORN manifest left by a non-atomic external writer
    fsutil.publish_text_atomic(
        spark, versioned._manifest_path(base, m2["version"] + 1), '{"version": '
    )

    real_read = fsutil.read_text
    stale_listing = [m1["version"], m2["version"], m2["version"] + 1]

    # GENUINE GC race: v2's file is deleted AFTER the listing captured it.
    # newest (v3) is torn -> step down; v2 vanished (and is verifiably
    # absent on disk) -> step down again; v1 is the newest CONSISTENT
    # snapshot.
    fsutil.delete(spark, versioned._manifest_path(base, m2["version"]))
    monkeypatch.setattr(
        versioned, "list_manifest_versions", lambda s, b: stale_listing
    )
    assert read_manifest(spark, base)["version"] == m1["version"]

    # a read failure on a file that STILL EXISTS is transient, not a GC
    # race — at any depth, falling back would serve a stale snapshot
    monkeypatch.undo()
    m2b = write_versioned_index(
        build_ngram_index(
            spark.createDataFrame(DICT + [(3, "Honda Jazz")], "doc_id long, value string")
        ),
        base,
    )
    transient = versioned._manifest_path(base, m2b["version"])

    def failing_read(s, path):
        if path == transient:
            raise IOError("transient FS failure")
        return real_read(s, path)

    monkeypatch.setattr(versioned.fsutil, "read_text", failing_read)
    with pytest.raises(IOError, match="transient"):
        read_manifest(spark, base)  # newest: raise, never fall back
