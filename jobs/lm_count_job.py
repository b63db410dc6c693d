"""spark-submit analogue of the reference's ``language-model ngram-count``
command (/root/reference/cmd/language-model/cmd/ngram-count.go:17-77): read
an lm.Config JSON in the REFERENCE's own format — ``name / nGramOrder /
source / output / alphabet / separators / startSymbol / endSymbol``
(pkg/lm/config.go:14-24, e.g. pkg/lm/testdata/config-example.json) — run
the corpus through the full analysis chain (separator sentence retrieval +
alphabet word tokenization) and write Google-format ``k-gm`` count files.

    python jobs/lm_count_job.py --config config.json [--base-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from suggest_spark.operators.lm import (
    LMConfig,
    build_ngram_counts,
    write_google_ngram_format,
)
from suggest_spark.plans.session import get_spark


def lm_config_from_json(conf: dict) -> LMConfig:
    """lm.Config JSON → LMConfig.  ``separators`` is an ALPHABET DECLARATION
    in the reference, not a literal rune list — pkg/lm/config.go:31-33 runs
    it through the same alphabet.CreateAlphabet as ``alphabet``, so
    ``["numbers"]`` means the digit runes, not {n,u,m,b,e,r,s}."""
    from suggest_spark.config import allowed_char_set

    return LMConfig(
        order=int(conf.get("nGramOrder", 3)),
        alphabet=tuple(conf.get("alphabet", ["english", "russian", "numbers", "-."])),
        separators="".join(
            sorted(allowed_char_set(tuple(conf.get("separators", ["\n"]))))
        ),
        start=conf.get("startSymbol", "<S>"),
        end=conf.get("endSymbol", "</S>"),
    )


def run_count_job(spark, conf: dict, base_dir: str) -> dict:
    cfg = lm_config_from_json(conf)
    source = os.path.join(base_dir, conf["source"])
    out = os.path.join(base_dir, conf.get("output", "."), conf.get("name", "lm"))

    t0 = time.time()
    # with '\n' among the separators (the common case) a line-split read is
    # exactly the reference's scanSentence stream; without it, sentences may
    # span lines, so the file must be read whole to preserve them
    wholetext = "\n" not in cfg.separators
    docs = (
        spark.read.text(source, wholetext=wholetext).withColumnRenamed("value", "text")
    )
    counts = build_ngram_counts(docs, cfg.order, config=cfg)
    write_google_ngram_format(counts, out)
    return {
        "name": conf.get("name", "lm"),
        "output": out,
        "order": cfg.order,
        "t_sec": round(time.time() - t0, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="reference-format lm.Config JSON")
    ap.add_argument("--base-dir", default=None)
    ap.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    args = ap.parse_args()

    with open(args.config) as f:
        conf = json.load(f)
    base_dir = args.base_dir or os.path.dirname(os.path.abspath(args.config))

    spark = get_spark(app_name="lm_ngram_count", master=args.master)
    print(json.dumps(run_count_job(spark, conf, base_dir)))


if __name__ == "__main__":
    main()
