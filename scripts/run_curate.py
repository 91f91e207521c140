#!/usr/bin/env python3
"""Training-corpus assembly CLI (spark-submit surface for
engine/curation.py) — run it on the cleaning job's output:

    spark-submit --py-files engine.zip scripts/run_curate.py \
        --input /path/cleaned --output /path/shards --budget 2048

Prints ONE JSON line of metrics (rows in/out, token total, shard
count, wall seconds).  The whole job is deterministic: re-running on
the same input reproduces byte-identical shards.
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
    p.add_argument("--budget", type=int, default=2048,
                   help="tokens per shard (sequence-packing budget)")
    args = p.parse_args()

    from engine.curation import run_curation_job
    from engine.session import get_spark

    spark = get_spark(app_name="curation-job")
    spark.sparkContext.setLogLevel("ERROR")
    metrics = run_curation_job(spark, args.input, args.output,
                               budget=args.budget)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
