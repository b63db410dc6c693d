"""Batch spellchecker eval — the non-interactive analogue of the reference's
``spellchecker eval`` command (/root/reference/cmd/spellchecker/cmd/eval.go:34-80,
an stdin REPL over Predict with topK=5, similarity=0.5).

Builds a vocabulary + n-gram index + LM over a corpus, replays every
(context, typed-prefix → true word) case and prints ONE JSON line with
hit@k / MRR / latency:

    python jobs/spellcheck_eval.py                       # built-in sam corpus
    python jobs/spellcheck_eval.py --corpus path.txt --topk 5 --similarity 0.5
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from suggest_spark.config import IndexConfig
from suggest_spark.operators.indexing import build_ngram_index
from suggest_spark.operators.lm import build_ngram_counts
from suggest_spark.operators.spellcheck import evaluate
from suggest_spark.plans.session import get_spark
from suggest_spark.sources.dictionary import from_list

SAM_CORPUS = [
    "i am sam",
    "sam i am",
    "i do not like green eggs and ham",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="newline-delimited sentence file (default: sam corpus)")
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--similarity", type=float, default=0.5)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--prefix-len", type=int, default=2)
    ap.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    args = ap.parse_args()

    if args.corpus:
        with open(args.corpus) as f:
            lines = [ln.strip().lower() for ln in f if ln.strip()]
    else:
        lines = SAM_CORPUS
    sentences = [ln.split() for ln in lines]

    spark = get_spark(app_name="spellcheck_eval", master=args.master)
    sents_df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "sent_id long, text string"
    )
    counts = {k: df.cache() for k, df in build_ngram_counts(sents_df, args.order).items()}
    cfg = IndexConfig(ngram_size=2)  # short vocabulary words need bigrams
    vocab = from_list(spark, sorted({w for s in sentences for w in s})).cache()
    index = build_ngram_index(vocab, config=cfg).cache()

    t0 = time.time()
    report = evaluate(
        vocab,
        index,
        counts,
        args.order,
        sentences,
        topk=args.topk,
        similarity=args.similarity,
        config=cfg,
        prefix_len=args.prefix_len,
    )
    report["wall_sec"] = round(time.time() - t0, 2)
    report["vocab_size"] = vocab.count()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
