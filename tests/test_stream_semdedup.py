"""Streaming SemDeDup: arriving embedding batches are semantically
deduped against the frozen-quantizer serving index.  Pins (1) the
lossless decomposition — batch semdedup_pairs over the full corpus ==
pairs within the indexed half ∪ union of streamed per-batch pairs,
(2) partition-pruned index reads (only touched cells), (3) replay
idempotence (re-invoking a batch id rewrites identical pairs — the
r4-ADVICE discipline), and (4) a re-drain no-ops."""

from pyspark.sql import functions as F

import engine.analytics as A
from engine.index import write_ann_index
from engine.streaming import _semdedup_one_batch, stream_semdedup

SF = "/root/testdata/sf0.001"


def _halves(spark):
    """Planted corpus split by id: naturals (the indexed corpus) and
    plants (the arriving stream) — every plant's original is indexed,
    so every true pair is a cross pair the stream must catch."""
    emb, off = A._planted_embeddings(spark, SF)
    return (emb.filter(F.col("vec_id") < off),
            emb.filter(F.col("vec_id") >= off), off)


def _decided(spark, pairs_dir):
    return {(r.removed_id, r.keeper_id, r.cell)
            for r in spark.read.parquet(pairs_dir).collect()}


def _write_half(df, path):
    df.select("vec_id",
              F.expr("transform(e, x -> cast(x AS float))")
              .alias("embedding")).coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_semdedup_lossless_and_pruned(spark, tmp_path):
    naturals, plants, off = _halves(spark)
    idx = str(tmp_path / "ann")
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    cp = str(tmp_path / "cp")

    # serving index over the naturals; the quantizer (train_limit
    # lowest ids) is identical to the batch fit over the full corpus,
    # since plants sit strictly above the natural id space
    write_ann_index(naturals, idx, train_limit=A._IVF_TRAIN_LIMIT)

    # stream the plants in two batches
    plist = sorted(r.vec_id for r in plants.select("vec_id").collect())
    cut = plist[len(plist) // 2]
    _write_half(plants.filter(F.col("vec_id") <= cut), inp)
    probes = []
    q = stream_semdedup(spark, inp, idx, work, cp, plan_probe=probes)
    q.awaitTermination(120)
    _write_half(plants.filter(F.col("vec_id") > cut), inp)
    q = stream_semdedup(spark, inp, idx, work, cp, plan_probe=probes)
    q.awaitTermination(120)

    streamed = _decided(spark, f"{work}/pairs")

    full = {(r.removed_id, r.keeper_id, r.cell) for r in
            A.semdedup_pairs(
                naturals.unionByName(plants)).collect()}
    within_idx = {(r.removed_id, r.keeper_id, r.cell) for r in
                  A.semdedup_pairs(naturals).collect()}
    assert within_idx | streamed == full
    assert within_idx.isdisjoint(streamed)
    # every plant produced a decision (batch recovery is 50/50 here)
    assert len(streamed) == plants.count()

    # index reads are partition-pruned to the touched cells
    assert probes and all("PartitionFilters: [" in p and "cell#" in p
                          for p in probes)

    # a re-drain with nothing new no-ops (checkpoint-tracked)
    q = stream_semdedup(spark, inp, idx, work, cp)
    q.awaitTermination(120)
    assert _decided(spark, f"{work}/pairs") == streamed


def test_stream_semdedup_replay_is_byte_identical(spark, tmp_path):
    """Crash window: the batch wrote its members partition but the
    checkpoint did not commit.  The replayed batch must NOT see its
    own members (it would pair plants against themselves); re-invoking
    the per-batch function with the same batch_id must rewrite the
    identical pair set."""
    naturals, plants, off = _halves(spark)
    idx = str(tmp_path / "ann")
    work = str(tmp_path / "work")
    write_ann_index(naturals, idx, train_limit=A._IVF_TRAIN_LIMIT)

    batch = plants.select(
        "vec_id",
        F.expr("transform(e, x -> cast(x AS float))").alias("embedding"))
    _semdedup_one_batch(spark, batch, 0, idx, work)
    first = _decided(spark, f"{work}/pairs")

    # simulate the replay: members/batch=0 already exists on disk
    _semdedup_one_batch(spark, batch, 0, idx, work)
    assert _decided(spark, f"{work}/pairs") == first
    for rid, kid, _cell in first:
        assert abs(rid - kid) == off  # every pair is plant×original


def test_compact_semdedup_stream_applies_decision_log(spark, tmp_path):
    """Compaction folds streamed members in and drops every logged
    loser (indexed OR streamed); the resulting version is
    semantically dup-free for this corpus and still probes
    partition-pruned."""
    naturals, plants, off = _halves(spark)
    idx = str(tmp_path / "ann")
    inp = str(tmp_path / "in")
    work = str(tmp_path / "work")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "ann_v2")
    write_ann_index(naturals, idx, train_limit=A._IVF_TRAIN_LIMIT)
    _write_half(plants, inp)
    q = stream_semdedup(spark, inp, idx, work, cp)
    q.awaitTermination(120)

    from engine.index import compact_semdedup_stream
    stats = compact_semdedup_stream(spark, idx, work, out)
    assert stats["n_index"] == naturals.count()
    assert stats["n_streamed"] == plants.count()
    assert stats["n_removed"] == len(_decided(spark, f"{work}/pairs"))
    assert stats["n_out"] == (stats["n_index"] + stats["n_streamed"]
                              - stats["n_removed"])

    # exactly the logged losers are gone; everything else survives
    removed = {r for (r, _k, _c) in _decided(spark, f"{work}/pairs")}
    expect = ({r.vec_id for r in naturals.collect()}
              | {r.vec_id for r in plants.collect()}) - removed
    got = {r.vec_id for r in
           spark.read.parquet(f"{out}/members").select("vec_id")
           .collect()}
    assert got == expect

    # the new version is a fixed point: re-running semantic dedup
    # over its members (same frozen quantizer) finds nothing
    cent_rows = [(r.cell, list(r.ce)) for r in
                 spark.read.parquet(f"{out}/centroids").collect()]
    cent = spark.createDataFrame(cent_rows, "cell long, ce array<double>")
    mem = spark.read.parquet(f"{out}/members")
    scored = A._sem_score(mem.select("vec_id", "e"), cent,
                          mem.select("vec_id", "cell"))
    leftovers = A._sem_candidate_pairs(scored, scored, A._SEM_TAU,
                                       ordered=True).count()
    assert leftovers == 0

    # idempotent recovery: a crashed compaction is simply re-run
    stats2 = compact_semdedup_stream(spark, idx, work, out)
    assert stats2 == stats
    assert {r.vec_id for r in
            spark.read.parquet(f"{out}/members").select("vec_id")
            .collect()} == expect


def test_compact_refuses_in_place_overwrite(spark, tmp_path):
    import pytest

    from engine.index import compact_semdedup_stream
    idx = str(tmp_path / "ann")
    with pytest.raises(ValueError):
        compact_semdedup_stream(spark, idx, str(tmp_path / "w"), idx)


def test_second_epoch_streams_against_compacted_version(spark, tmp_path):
    """Full serving lifecycle: v1 index → stream plants → compact to
    v2 → stream a SECOND wave of near-dups against v2 with a fresh
    work dir.  Each second-wave arrival must pair with the member the
    compaction KEPT (whichever of original/plant survived), proving
    the decision log really transferred into the new version."""
    naturals, plants, off = _halves(spark)
    idx = str(tmp_path / "ann")
    work = str(tmp_path / "work")
    out = str(tmp_path / "ann_v2")
    work2 = str(tmp_path / "work2")
    write_ann_index(naturals, idx, train_limit=A._IVF_TRAIN_LIMIT)
    inp = str(tmp_path / "in")
    _write_half(plants, inp)
    q = stream_semdedup(spark, inp, idx, work, str(tmp_path / "cp"))
    q.awaitTermination(120)

    from engine.index import compact_semdedup_stream
    compact_semdedup_stream(spark, idx, work, out)
    kept = {r.vec_id for r in
            spark.read.parquet(f"{out}/members").select("vec_id")
            .collect()}

    # second wave: a fresh near-identical copy of every ORIGINAL
    # (second component +0.01 this time), ids above the plant space
    wave2 = naturals.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 2 * off).alias("vec_id"),
        F.expr("concat(slice(e, 1, 1), array(element_at(e, 2) + 0.01D),"
               " slice(e, 3, 62))").alias("e"))
    inp2 = str(tmp_path / "in2")
    _write_half(wave2, inp2)
    q = stream_semdedup(spark, inp2, out, work2, str(tmp_path / "cp2"))
    q.awaitTermination(120)

    pairs2 = _decided(spark, f"{work2}/pairs")
    assert len(pairs2) == wave2.count()
    for rid, kid, _cell in pairs2:
        member = kid if kid < 2 * off else rid
        arrival = rid if member == kid else kid
        assert arrival >= 2 * off
        # the matched member is one the compaction kept, and it is the
        # survivor of the first wave's (original, plant) pair
        assert member in kept
        assert member % 10 == 0 or (member - off) % 10 == 0
