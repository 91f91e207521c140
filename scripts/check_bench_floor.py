"""Mechanical per-query regression check against the round-1 floor
(BENCH/BASELINE.md "Round-to-round regression floor").

Usage: python scripts/check_bench_floor.py <bench_output_file>
(the file's LAST line must be bench.py's JSON line).  A query is a
regression when slower than floor × TOLERANCE; TOLERANCE covers the
host's ±15% run-to-run swing plus first-run codegen compile, which
lands inside each query's single timed run.
"""

from __future__ import annotations

import json
import sys

TOLERANCE = 1.5

# round-1 driver numbers (BENCH_r01.json, sf0.1, local[32])
FLOOR = {
    "extract_pipeline": 3.641,
    "dedup_exact": 0.757,
    "dedup_minhash_lsh": 5.930,
    "dedup_ngram_jaccard": 2.450,
    "dedup_simhash": 2.512,
    "ann_cosine_topk": 0.853,
    "ann_lsh_top1": 6.772,
    "sessionize": 1.110,
    "group_winner_rank": 0.616,
    "turn_order_window": 0.509,
    "quality_score": 0.401,
    "token_count": 0.363,
}


def main() -> int:
    with open(sys.argv[1]) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    data = json.loads(lines[-1])
    timings = data["queries"]
    regressions = []
    for name, floor in FLOOR.items():
        got = timings.get(name)
        if got is None:
            regressions.append(f"{name}: MISSING from bench output")
        elif got > floor * TOLERANCE:
            regressions.append(
                f"{name}: {got:.2f}s > floor {floor:.2f}s x {TOLERANCE}")
    for r in regressions:
        print(f"BENCH REGRESSION  {r}")
    if not regressions:
        print(f"bench floor OK ({len(FLOOR)} queries within "
              f"{TOLERANCE}x of round-1)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
