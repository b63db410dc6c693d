"""spark-submit analogue of the reference's ``suggest indexer`` command
(/root/reference/cmd/suggest/cmd/indexer.go:35-137): read a config file in
the REFERENCE's own JSON format — a list of IndexDescription objects with
``driver/name/nGramSize/alphabet/source/output/pad/wrap`` — and, for every
DISC entry, build the dictionary table and the size-partitioned n-gram
index under the output warehouse path (RAM entries are skipped, exactly as
indexJob does).

    python jobs/indexer_job.py --config config.json [--base-dir DIR]

Output layout per description: ``<output>/<name>_dictionary`` (parquet
(doc_id, value) — the CDB analogue) and ``<output>/<name>_index`` (parquet
(size=…/term, doc_id) — the inverted-index directory analogue).  A running
SuggestService picks the rebuilt index up via ``add_disc_index(...,
rebuild=False)`` — the POST /internal/reindex analogue.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from suggest_spark.config import IndexConfig
from suggest_spark.operators.indexing import (
    build_ngram_index,
    invalidate_index_stats,
    write_index_stats,
    write_ngram_index,
)
from suggest_spark.plans.session import get_spark
from suggest_spark.sources.dictionary import read_line_dictionary, write_dictionary


def index_config_from_description(desc: dict) -> IndexConfig:
    """IndexDescription JSON → IndexConfig (pkg/suggest/config.go:25-35)."""
    return IndexConfig(
        ngram_size=int(desc.get("nGramSize", 3)),
        pad=desc.get("pad", "$"),
        wrap=tuple(desc.get("wrap", ["$", "$"])),
        alphabet=tuple(desc.get("alphabet", ["english", "russian", "numbers", "$"])),
    )


def run_index_job(spark, desc: dict, base_dir: str) -> dict | None:
    if desc.get("driver", "DISC") != "DISC":
        print(f"skip processing '{desc['name']}', there is no disc configuration")
        return None
    cfg = index_config_from_description(desc)
    source = os.path.join(base_dir, desc["source"])
    out = os.path.join(base_dir, desc.get("output", "db"))

    t0 = time.time()
    dictionary = read_line_dictionary(spark, source)
    dict_path = os.path.join(out, f"{desc['name']}_dictionary")
    write_dictionary(dictionary, dict_path)
    t_dict = time.time() - t0

    t0 = time.time()
    index_path = os.path.join(out, f"{desc['name']}_index")
    stats_path = f"{index_path}_stats"
    # a RE-run mutates the index in place: invalidate any stats from the
    # previous run BEFORE touching it
    invalidate_index_stats(spark, stats_path)
    index = build_ngram_index(dictionary, config=cfg)
    write_ngram_index(index, index_path)
    t_index = time.time() - t0

    # planner statistics next to the index: the booting service feeds them
    # to suggest_topk_auto so plan selection and the prefix path's
    # term_df/doc_terms/delta_max artifacts cost zero query-time jobs
    t0 = time.time()
    stats = write_index_stats(spark, index, stats_path)
    t_stats = time.time() - t0
    return {
        "name": desc["name"],
        "dictionary": dict_path,
        "index": index_path,
        "stats": stats_path,
        "index_stats": stats,
        "t_dictionary_sec": round(t_dict, 2),
        "t_index_sec": round(t_index, 2),
        "t_stats_sec": round(t_stats, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="reference-format IndexDescription JSON list")
    ap.add_argument("--base-dir", default=None, help="resolve source/output relative to this dir (default: config dir)")
    ap.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    args = ap.parse_args()

    with open(args.config) as f:
        descriptions = json.load(f)
    base_dir = args.base_dir or os.path.dirname(os.path.abspath(args.config))

    spark = get_spark(app_name="suggest_indexer", master=args.master)
    results = []
    for desc in descriptions:
        r = run_index_job(spark, desc, base_dir)
        if r is not None:
            results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
