"""North-rule evidence at the QUERY level: the engine's results must
not depend on the cluster size.  Every operator whose aggregation
could be float-order-sensitive is quantized to integer micro-units
before summation precisely so that ANY partitioning produces
bit-identical output — this test runs the sensitive queries at two
very different shuffle widths (3 vs 32) and asserts row-identical
results.  (Throughput scaling across parallelism levels is measured
separately by bench.py --scaling; this pins the RESULT side.)"""

import pytest

import engine.analytics  # noqa: F401  (registers the queries)
from engine.queries import _REGISTRY

SF = "/root/testdata/sf0.001"

QUERIES = [
    "lm_perplexity_filter",     # micro-bit unigram LM
    "lm2_perplexity_filter",    # exact-integer-ratio bigram LM
    "dsir_importance",          # micro-bit importance weights
    "tfidf_top_terms",          # micro-nat integer ranking
    "corpus_shuffle",           # two-level global rank
    "pack_token_budget",        # two-level prefix sum
    "dup_ngram_fraction",       # pure integer counts
    "mixture_weights",          # 1-row broadcast double math
    "dedup_exact",              # hash groupBy
    "dedup_substring",          # doubling keys + islands merge
    "dedup_substring_cut",      # keeper argmin + rebuilt-text md5
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in row)
                  for row in df.select(*cols).collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_across_shuffle_widths(spark, name):
    fn, _ = _REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _canon(fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _canon(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow == wide, name
    assert len(narrow) > 0
