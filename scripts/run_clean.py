#!/usr/bin/env python3
"""Corpus-cleaning job CLI (spark-submit surface for engine/cleaning.py).

    spark-submit --py-files engine.zip scripts/run_clean.py \
        --input /path/documents_parquet --output /path/cleaned

Prints ONE JSON line of per-stage metrics (rows in/out per stage,
redaction count, wall seconds).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--neardup-policy", default="pairwise",
                   choices=["pairwise", "clusters"],
                   help="pairwise: drop larger member of each pair; "
                        "clusters: keep one doc per transitive cluster")
    p.add_argument("--gopher-gate", action="store_true",
                   help="also drop repeated-boilerplate docs "
                        "(Gopher dup-3gram / top-bigram thresholds)")
    p.add_argument("--model-gate", default=None,
                   choices=("lm", "lm2", "dsir"),
                   help="corpus-model quality gate (CCNet-style LM "
                        "bits/token, or DSIR importance ratio)")
    p.add_argument("--semantic-dedup", default=None, metavar="EMB_PATH",
                   help="embeddings parquet (vec_id == doc_id) — "
                        "enables the SemDeDup fourth gate over the "
                        "near-dup survivors")
    p.add_argument("--semantic-dedup-hashed", action="store_true",
                   help="SemDeDup gate WITHOUT an embeddings file: "
                        "hashed TF-IDF document embeddings built from "
                        "the corpus text itself (catches permuted/"
                        "token-multiset near-dups)")
    p.add_argument("--semantic-policy", default="clusters",
                   choices=["clusters", "pairwise"],
                   help="clusters: one survivor per semantic-dup "
                        "component (min doc_id); pairwise: drop each "
                        "pair's closer-to-centroid member (paper rule)")
    p.add_argument("--lm-corpus", default=None, metavar="REF_PATH",
                   help="clean reference corpus parquet for the "
                        "--model-gate lm/lm2 count tables (CCNet "
                        "contract); default: self-trained on the "
                        "frame being gated")
    p.add_argument("--decontaminate", default=None, metavar="EVAL_PATH",
                   help="benchmark decontamination: act on docs "
                        "sharing any 13-gram with this (doc_id, text) "
                        "evaluation parquet")
    p.add_argument("--decontaminate-mode", default="drop",
                   choices=["drop", "cut"],
                   help="drop: remove the whole contaminated document "
                        "(gate); cut: excise only the contaminated "
                        "spans byte-preservingly and keep the doc")
    p.add_argument("--substring-cut", action="store_true",
                   help="rewrite stage: cut duplicated >=20-token "
                        "substrings position-wise (global-first "
                        "occurrence kept; untouched docs keep their "
                        "original bytes)")
    p.add_argument("--substring-mode", default="tokens",
                   choices=["tokens", "bytes"],
                   help="what TOUCHED docs carry after --substring-cut: "
                        "the normalized token join (tokens) or the "
                        "original character stream with only the cut "
                        "spans spliced out (bytes)")
    p.add_argument("--sketch", default="minhash",
                   choices=["minhash", "simhash128"],
                   help="near-dup candidate generator: minhash "
                        "(arbitrary >=0.2-Jaccard overlap) or "
                        "simhash128 (near-identical docs; faster and "
                        "saturation-proof past ~10^6 docs)")
    args = p.parse_args()

    from engine.cleaning import run_cleaning_job
    from engine.session import get_spark

    spark = get_spark(app_name="cleaning-job")
    spark.sparkContext.setLogLevel("ERROR")
    metrics = run_cleaning_job(spark, args.input, args.output,
                               neardup_policy=args.neardup_policy,
                               gopher_gate=args.gopher_gate,
                               sketch=args.sketch,
                               model_gate=args.model_gate,
                               embeddings_path=args.semantic_dedup,
                               semantic_policy=args.semantic_policy,
                               semantic_hashed=args.semantic_dedup_hashed,
                               substring_cut=args.substring_cut,
                               substring_mode=args.substring_mode,
                               lm_corpus_path=args.lm_corpus,
                               decontaminate_path=args.decontaminate,
                               decontaminate_mode=args.decontaminate_mode)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
