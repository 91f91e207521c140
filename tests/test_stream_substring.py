"""Streaming substring dedup: the per-batch span output must equal
the BATCH operator over the corpus accumulated so far, restricted to
the arriving documents (the operator's documented contract), replays
must rewrite identically, and the end-to-end stream must drain file
input exactly-once."""

from pyspark.sql import functions as F

from engine.analytics import substring_dedup_spans
from engine.streaming import _substring_one_batch, stream_substring_dedup

L = 20


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path)
                  .select("doc_id", "span_start", "span_len").collect())


def _batch_spans(spark, docs_so_far, batch_ids):
    df = spark.createDataFrame(docs_so_far, "doc_id long, text string")
    return sorted(
        tuple(r) for r in substring_dedup_spans(df, L).collect()
        if r.doc_id in batch_ids)


def _mk_docs():
    block = [f"b{i}" for i in range(25)]
    other = [f"c{i}" for i in range(22)]
    b0 = [
        (1, " ".join([f"u{i}" for i in range(10)] + block)),
        (2, " ".join(f"v{i}" for i in range(30))),      # clean
    ]
    # doc 11 repeats doc 1's block at a new offset; doc 12 introduces
    # a fresh 22-token run (not yet duplicated)
    b1 = [
        (11, " ".join([f"w{i}" for i in range(3)] + block
                      + [f"x{i}" for i in range(5)])),
        (12, " ".join(other + [f"y{i}" for i in range(9)])),
    ]
    # doc 21 repeats doc 12's run AND doc 1's block back-to-back
    b2 = [
        (21, " ".join(other + block)),
    ]
    return b0, b1, b2


def test_stream_substring_matches_batch_operator_per_batch(spark, tmp_path):
    b0, b1, b2 = _mk_docs()
    work = str(tmp_path / "work")

    corpus = []
    for bid, rows in enumerate((b0, b1, b2)):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        _substring_one_batch(spark, df, bid, work, min_len=L)
        corpus += rows
        got = _rows(spark, f"{work}/spans/batch={bid}")
        want = _batch_spans(spark, corpus, {d for d, _ in rows})
        assert got == want, (bid, got, want)

    # concretely: batch 0 has no dups yet; batch 1 flags doc 11's
    # block copy (arriving side only — doc 1 is NOT retro-flagged);
    # batch 2 flags doc 21's full coverage (block + other both now
    # duplicated, merged into one span covering the whole doc)
    assert _rows(spark, f"{work}/spans/batch=0") == []
    assert _rows(spark, f"{work}/spans/batch=1") == [(11, 3, 25)]
    assert _rows(spark, f"{work}/spans/batch=2") == [(21, 0, 47)]


def test_stream_substring_replay_rewrites_identically(spark, tmp_path):
    """Crash window: batch 1's index partition already written, the
    checkpoint uncommitted — the replay must not double-count batch
    1's own windows (a window occurring once would look duplicated
    against its own indexed copy)."""
    b0, b1, _ = _mk_docs()
    work = str(tmp_path / "work")
    _substring_one_batch(
        spark, spark.createDataFrame(b0, "doc_id long, text string"),
        0, work, min_len=L)
    df1 = spark.createDataFrame(b1, "doc_id long, text string")
    _substring_one_batch(spark, df1, 1, work, min_len=L)
    spans = _rows(spark, f"{work}/spans/batch=1")
    assert spans == [(11, 3, 25)]     # doc 12's fresh run NOT flagged

    _substring_one_batch(spark, df1, 1, work, min_len=L)  # replay
    assert _rows(spark, f"{work}/spans/batch=1") == spans


def test_stream_substring_end_to_end_drain(spark, tmp_path):
    b0, b1, b2 = _mk_docs()
    inp = str(tmp_path / "in")
    for rows in (b0, b1, b2):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)
    work = str(tmp_path / "work")
    q = stream_substring_dedup(spark, inp, work,
                               str(tmp_path / "cp"), min_len=L)
    q.awaitTermination(120)

    all_spans = sorted(
        tuple(r) for r in spark.read.parquet(f"{work}/spans")
        .select("doc_id", "span_start", "span_len").collect())
    # file order is not batch order, but the UNION of arriving-side
    # spans is order-sensitive only in WHICH member of a dup family
    # arrived last; with these three batches every ordering flags at
    # least the block copy and the doc-21 coverage — assert the
    # corpus-level invariant instead: every flagged span is a real
    # duplicated span of the full corpus, and >= 2 docs got flagged
    full = {(r.doc_id, r.span_start, r.span_len)
            for r in substring_dedup_spans(
                spark.read.parquet(inp), L).collect()}
    assert set(all_spans) <= full
    assert len({d for d, _, _ in all_spans}) >= 2

    # restart with the same checkpoint: nothing new to process,
    # outputs unchanged (exactly-once)
    q2 = stream_substring_dedup(spark, inp, work,
                                str(tmp_path / "cp"), min_len=L)
    q2.awaitTermination(60)
    again = sorted(
        tuple(r) for r in spark.read.parquet(f"{work}/spans")
        .select("doc_id", "span_start", "span_len").collect())
    assert again == all_spans


def test_stream_substring_bucketed_index_mode(spark, tmp_path):
    """After compact_substring_index, the duplicated-window probe must
    read the compacted window table IN PLACE (bucketed scan, one
    arriving-side wkey exchange) and produce the same spans; a
    crash-window compaction (replaying batch already folded into the
    table) must still rewrite the batch identically."""
    from engine.index import compact_substring_index

    b0, b1, b2 = _mk_docs()
    work = str(tmp_path / "work")
    _substring_one_batch(
        spark, spark.createDataFrame(b0, "doc_id long, text string"),
        0, work, min_len=L)
    compact_substring_index(spark, f"{work}/index/windows", "t_sub",
                            str(tmp_path / "bidx"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = []
        df1 = spark.createDataFrame(b1, "doc_id long, text string")
        _substring_one_batch(spark, df1, 1, work, min_len=L,
                             bucketed_name="t_sub", plan_probe=probe)
        assert _rows(spark, f"{work}/spans/batch=1") == [(11, 3, 25)]
        plan = probe[0]
        assert "Bucketed: true" in plan, plan
        assert ("FileScan parquet spark_catalog.default"
                ".t_sub_windows") in plan

        # isolate the table-arm semi join: its corpus side must feed
        # the join exchange-free (the scan's HashPartitioning(wkey)
        # already satisfies the join's clustering)
        from engine.analytics import (_SPARK_TOKS,
                                      _substring_window_md5_expr)
        arr = (df1.select("doc_id", F.expr(_SPARK_TOKS).alias("t"))
               .filter(F.expr(f"size(t) >= {L}"))
               .select("doc_id", F.posexplode(
                   F.expr(_substring_window_md5_expr(L)))
                   .alias("pos", "wkey")))
        j = arr.join(spark.table("t_sub_windows").select("wkey"),
                     "wkey", "left_semi")
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in jplan, jplan
        scan_at = jplan.index("FileScan parquet spark_catalog.default"
                              ".t_sub_windows")
        assert "Exchange" not in jplan[scan_at:], jplan

        # batch 2 arrives with batch 1 still in the uncompacted tail:
        # doc 21's coverage needs BOTH the table (block via doc 1) and
        # the tail (other-run via doc 12) — all three layers exercised
        df2 = spark.createDataFrame(b2, "doc_id long, text string")
        _substring_one_batch(spark, df2, 2, work, min_len=L,
                             bucketed_name="t_sub")
        assert _rows(spark, f"{work}/spans/batch=2") == [(21, 0, 47)]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # crash-window compaction: fold batches 0-2 into the table, then
    # REPLAY batch 2 in bucketed mode — its own rows now arrive via
    # the table and must be excluded, or the replay would self-match
    compact_substring_index(spark, f"{work}/index/windows", "t_sub",
                            str(tmp_path / "bidx2"))
    folded = {r.batch for r in spark.table("t_sub_windows")
              .select("batch").distinct().collect()}
    assert folded == {0, 1, 2}
    df2 = spark.createDataFrame(b2, "doc_id long, text string")
    _substring_one_batch(spark, df2, 2, work, min_len=L,
                         bucketed_name="t_sub")
    assert _rows(spark, f"{work}/spans/batch=2") == [(21, 0, 47)]
