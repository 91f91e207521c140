"""Streaming corpus-cleaning job (engine/streaming.py:stream_clean):
per micro-batch gates → exact dedup vs the survivor index → near-dup
removal vs the survivor index → PII scrub, with per-batch metrics and
exactly-once re-drains."""

from pyspark.sql import functions as F

from engine.streaming import stream_clean
from tests.test_streaming_neardup import _DOCS_1, _write


def _drain(spark, inp, work, cp):
    q = stream_clean(spark, inp, work, cp)
    q.awaitTermination(120)


def test_stream_clean_full_funnel_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    cp = str(tmp_path / "cp")

    _write(spark, _DOCS_1, inp)          # docs 1-3, all gate-passing
    _drain(spark, inp, work, cp)
    first = spark.read.parquet(f"{work}/cleaned")
    assert {r.doc_id for r in first.select("doc_id").collect()} == {1, 2, 3}

    batch2 = [
        (11, _DOCS_1[0][1]),                       # exact copy of doc 1
        (12, _DOCS_1[1][1] + " and the cellar"),   # near-dup of doc 2
        (13, "a fresh report about the annual harvest and the farmers "
             "who gathered it was mailed to editor@example.com for "
             "review by the board"),               # fresh, with PII
        (14, "too short to pass"),                 # fails the C4 gate
    ]
    _write(spark, batch2, inp)
    _drain(spark, inp, work, cp)

    cleaned = spark.read.parquet(f"{work}/cleaned")
    ids = {r.doc_id for r in cleaned.select("doc_id").collect()}
    assert ids == {1, 2, 3, 13}
    kept = cleaned.filter(F.col("doc_id") == 13).first()
    assert "[EMAIL]" in kept.text and "@example.com" not in kept.text

    # per-batch metrics funnel: batch 2 saw 4 in, 3 past gates,
    # 2 past exact dedup, 1 past near-dup removal
    metrics = {r.batch_id: r for r in
               spark.read.parquet(f"{work}/metrics").collect()}
    b2 = metrics[max(metrics)]
    assert (b2.rows_in, b2.after_gates, b2.after_exact_dedup,
            b2.after_neardup_removal) == (4, 3, 2, 1)

    # index holds SURVIVORS only (a dropped near-dup never blocks
    # future docs): the dropped ids are absent
    idx_ids = {r.doc_id for r in
               spark.read.parquet(f"{work}/index/hashes").collect()}
    assert idx_ids == {1, 2, 3, 13}

    # exactly-once: a re-drain with no new data changes nothing
    _drain(spark, inp, work, cp)
    again = spark.read.parquet(f"{work}/cleaned")
    assert {r.doc_id for r in again.select("doc_id").collect()} == ids
    assert again.count() == 4
