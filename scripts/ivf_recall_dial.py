#!/usr/bin/env python3
"""Measure the IVF accuracy/cost dial: recall@1 / recall@10 and wall
time of the trained-IVF ANN at nprobe=2 vs nprobe=4 (VERDICT r3 item
5).  Ground truth is exact brute force over the planted corpus — the
same computation as the driver-checked ann_ivf_recall query, just with
the probe width swept.

Usage: python scripts/ivf_recall_dial.py [sf_dir]
Prints one JSON line per nprobe setting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from engine.analytics import _ivf_recall_df
    from engine.session import get_spark

    spark = get_spark(app_name="ivf-recall-dial")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warmup so the first timed setting doesn't absorb the
    # one-time JVM/JIT cost (same methodology as bench.py)
    _ivf_recall_df(spark, "/root/testdata/sf0.001", 2).collect()
    for nprobe in (2, 4):
        t0 = time.time()
        row = _ivf_recall_df(spark, sf_dir, nprobe).collect()[0]
        print(json.dumps({
            "sf": sf_dir, "nprobe": nprobe,
            "n_queries": row.n_queries,
            "recall_at_1": row.recall_at_1,
            "recall_at_10": row.recall_at_10,
            "wall_sec": round(time.time() - t0, 3),
        }))


if __name__ == "__main__":
    main()
