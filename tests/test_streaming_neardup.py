"""Streaming near-dup dedup (foreachBatch + persisted band index): a
near-duplicate arriving in a LATER micro-batch must be caught against
the indexed corpus, the union of per-batch pairs must equal the batch
MinHash query over the same corpus (lossless streaming decomposition),
and a re-drain against the same checkpoint must not duplicate pairs."""

from pyspark.sql import functions as F

from engine.analytics import _hashed_shingles_df, _minhash_pairs
from engine.streaming import stream_dedup_neardup

_DOCS_1 = [
    (1, "the quick brown fox jumps over a lazy dog while the amber sun "
        "settles on the quiet valley and the winding river keeps running "
        "north past the old stone mill"),
    (2, "a curious cat wanders through the ancient library reading "
        "forgotten books about distant lands and the people who wrote "
        "them is a mystery to every scholar"),
    (3, "the committee approved a new budget of unprecedented size and "
        "is expected to publish the details tomorrow morning"),
]
# doc 6 is a near-dup of doc 1 (same body, short divergent tail);
# doc 7 is unrelated
_DOCS_2 = [
    (6, _DOCS_1[0][1] + " and the miller waves"),
    (7, "a gentle rain fell over the harbor and the fishermen decided "
        "it was wise to stay ashore until the storm passed"),
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(path)


def _drain(spark, inp, idx, pairs, cp):
    q = stream_dedup_neardup(spark, inp, idx, pairs, cp)
    q.awaitTermination(120)


def _pairs(spark, pairs_dir):
    return {(r.doc_a, r.doc_b)
            for r in spark.read.parquet(pairs_dir)
            .select("doc_a", "doc_b").collect()}


def test_streaming_neardup_catches_cross_batch_pair(spark, tmp_path):
    inp = str(tmp_path / "in")
    idx = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    cp = str(tmp_path / "cp")

    _write(spark, _DOCS_1, inp)
    _drain(spark, inp, idx, pairs, cp)
    first = _pairs(spark, pairs)
    assert first == set()  # batch 1 has no near-dups

    # the near-dup of doc 1 arrives LATER: it must be caught against
    # the persisted index, not just within its own micro-batch
    _write(spark, _DOCS_2, inp)
    _drain(spark, inp, idx, pairs, cp)
    got = _pairs(spark, pairs)
    assert (1, 6) in got

    # lossless decomposition: streaming pairs == batch pairs over the
    # full corpus
    full = spark.createDataFrame(_DOCS_1 + _DOCS_2,
                                 "doc_id long, text string")
    batch = {(r.doc_a, r.doc_b)
             for r in _minhash_pairs(_hashed_shingles_df(full)).collect()}
    assert got == batch

    # a re-drain with no new data changes nothing (checkpointed offsets)
    _drain(spark, inp, idx, pairs, cp)
    assert _pairs(spark, pairs) == got
    n_rows = spark.read.parquet(pairs).count()
    assert n_rows == len(got)  # per-batch overwrite => no dup rows


def test_streaming_neardup_index_accumulates_per_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    idx = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    cp = str(tmp_path / "cp")

    _write(spark, _DOCS_1, inp)
    _drain(spark, inp, idx, pairs, cp)
    _write(spark, _DOCS_2, inp)
    _drain(spark, inp, idx, pairs, cp)

    dist = spark.read.parquet(f"{idx}/dist")
    assert set(r.doc_id for r in dist.select("doc_id").distinct()
               .collect()) == {1, 2, 3, 6, 7}
    # the index partitions by arrival batch (exactly-once overwrites)
    assert dist.select("batch").distinct().count() >= 2
    bands = spark.read.parquet(f"{idx}/bands")
    # 8 bands per indexed doc
    per_doc = (bands.groupBy("doc_id").count().collect())
    assert all(r["count"] == 8 for r in per_doc)
