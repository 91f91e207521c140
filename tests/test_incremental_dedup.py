"""Incremental MinHash dedup must decompose LOSSLESSLY: pairs found by
the incremental pass (≥1 arriving doc) plus the indexed-only pairs
must equal the full-batch pair set exactly."""

from pyspark.sql import functions as F

from engine.analytics import _hashed_shingles, _minhash_pairs
from engine.queries import _REGISTRY

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_union_indexed_equals_full_batch(spark):
    full = _pairs(_REGISTRY["dedup_minhash_lsh"][0](spark, SF))
    incr = _pairs(_REGISTRY["dedup_minhash_incremental"][0](spark, SF))
    dist = _hashed_shingles(spark, SF)
    indexed_only = _pairs(_minhash_pairs(
        dist, cand_filter=lambda a, b: (a % 2 == 0) & (b % 2 == 0)))
    assert incr | indexed_only == full
    assert incr & indexed_only == set()
    # and the incremental set genuinely involves an arriving doc
    assert all(a % 2 == 1 or b % 2 == 1 for a, b, _ in incr)
