"""spark-submit entrypoint for the extraction pipeline.

Deployment shape per the north rule:

    spark-submit --py-files engine.zip scripts/run_job.py \
        --input /path/transcripts --output /path/results \
        --lineage /path/lineage --query "Can you give me the book: name and price?" \
        [--n-buckets 64] [--buckets-per-commit 0] [--salt-block 256]

Build engine.zip with:  (cd /root/repo && zip -r /tmp/engine.zip engine)
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description="transcript extraction job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--query", default="")
    p.add_argument("--queries-json", default=None,
                   help='JSON object {"query_id": "NL query", ...} — '
                        'runs all queries in one pass')
    p.add_argument("--io-format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--buckets-per-commit", type=int, default=0)
    p.add_argument("--salt-block", type=int, default=256)
    p.add_argument("--similarity-threshold", type=float, default=0.6)
    p.add_argument("--matcher", default="none", choices=["none", "token"],
                   help="semantic-tier matcher: none (parity-pinned "
                        "degraded mode) or token (TokenSimilarityMatcher)")
    p.add_argument("--input-snapshot", default=None)
    p.add_argument("--roles", default=None,
                   help="comma-separated role filter, pushed to the scan")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from engine.pipeline import JobConfig, run_extraction_job

    spark = SparkSession.builder.appName("extraction-job").getOrCreate()
    queries = json.loads(args.queries_json) if args.queries_json else None
    if not args.query and not queries:
        p.error("one of --query / --queries-json is required")
    cfg = JobConfig(
        input_path=args.input, output_path=args.output,
        lineage_path=args.lineage, query=args.query, queries=queries,
        io_format=args.io_format, n_buckets=args.n_buckets,
        buckets_per_commit=args.buckets_per_commit,
        salt_block=args.salt_block,
        similarity_threshold=args.similarity_threshold,
        matcher=args.matcher,
        roles=[r.strip() for r in args.roles.split(",") if r.strip()]
        if args.roles else None,
        input_snapshot=args.input_snapshot,
    )
    metrics = run_extraction_job(spark, cfg)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
