"""HTTP suggest service runner — the reference's ``suggest service-run``
(/root/reference/internal/suggest/api/app.go:40-91): boot a SuggestService
from a reference-format IndexDescription config, write a pidfile, serve the
routed API, and reindex live on SIGHUP or POST /internal/reindex.

    python jobs/http_service_job.py --config config.json [--port 8080]
        [--pid-path suggest.pid] [--base-dir DIR]

Single-driver serving shim: Flask's threaded dev server is fine here because
every request is a Spark action on the shared SparkSession (the concurrency
model the reference gets from net/http + RWMutex, app.go:86-90, is provided
by SuggestService's atomic snapshot swap).  Scale-out is N replicas of this
process behind a balancer, each reindexing from the same warehouse.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from suggest_spark.plans.session import get_spark
from suggest_spark.serving import create_app, service_from_config


def write_pid_file(pid_path: str | None) -> None:
    """app.go:94-109 writePIDFile."""
    if not pid_path:
        return
    os.makedirs(os.path.dirname(os.path.abspath(pid_path)), exist_ok=True)
    with open(pid_path, "w") as f:
        f.write(str(os.getpid()))


def install_sighup_reindex(reindex_job, background: bool = True) -> dict:
    """app.go:47-68 listenToSystemSignals: SIGHUP -> live reindex.

    The rebuild runs on a daemon THREAD, not in the signal handler: Python
    delivers signals on the main thread — Flask's accept loop — so a
    synchronous multi-minute Spark rebuild there would freeze all new
    connections for its duration (the reference reindexes in a goroutine
    while net/http keeps serving).  SIGHUPs arriving while a rebuild is in
    flight COALESCE into exactly one follow-up run — the Go buffered signal
    channel leaves one signal pending, so a config change landing mid-rebuild
    is always picked up afterward, never dropped.  The service's own mutation
    lock additionally serializes overlapping mutators.

    Returns ``{"thread": last Thread or None}`` so tests/operators can join.
    """
    import threading

    state: dict = {"thread": None}
    # RLock, not Lock: CPython may deliver a second SIGHUP's handler at a
    # bytecode boundary INSIDE the first handler's critical section, on the
    # same main thread — a non-reentrant lock would self-deadlock the accept
    # loop.  Re-entry is harmless (single thread mutating flags); the RLock
    # still excludes the worker thread.
    lock = threading.RLock()  # guards running/pending
    flags = {"running": False, "pending": False}

    def _worker():
        completed = False
        try:
            while True:
                try:
                    reindex_job()
                    print("Reindex done!")
                except Exception as e:  # the Go loop logs and keeps serving
                    print(f"Fail to reload index {e}")
                with lock:
                    if flags["pending"]:  # SIGHUP(s) arrived mid-rebuild
                        flags["pending"] = False
                        continue  # one follow-up run, however many signals
                    flags["running"] = False
                    completed = True
                    return
        finally:
            # BaseException safety (SystemExit/KeyboardInterrupt escape the
            # except above): never leave running=True with no worker alive,
            # or every later SIGHUP queues into a void forever.  Guarded by
            # `completed`: after a normal exit a new SIGHUP may already have
            # started the NEXT worker — blindly resetting running here would
            # let a further signal spawn a second concurrent worker.
            if not completed:
                with lock:
                    flags["running"] = False

    def _on_hup(signum, frame):
        with lock:
            if flags["running"]:
                flags["pending"] = True
                print("Reindex already in progress, queued a follow-up")
                return
            flags["running"] = True
        if background:
            t = threading.Thread(target=_worker, daemon=True, name="sighup-reindex")
            state["thread"] = t
            t.start()
        else:  # tests: deterministic synchronous path
            _worker()

    signal.signal(signal.SIGHUP, _on_hup)
    return state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--pid-path", default=None)
    ap.add_argument("--base-dir", default=None)
    ap.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    args = ap.parse_args()

    write_pid_file(args.pid_path)
    spark = get_spark(app_name="suggest_http_service", master=args.master)
    service, reindex_job = service_from_config(spark, args.config, args.base_dir)
    install_sighup_reindex(reindex_job)
    app = create_app(service, reindex_job)
    app.run(host="0.0.0.0", port=args.port, threaded=True)


if __name__ == "__main__":
    main()
