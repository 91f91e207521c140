"""Persisted IVF serving index (engine/index.py): train once, store
members partitionBy(cell), and prove a probe reads ONLY its cells'
partitions (partition pruning) while still retrieving the planted
neighbor."""

from pyspark.sql import functions as F

from engine.analytics import _lsh_embeddings
from engine.index import ann_query_index, write_ann_index

SF = "/root/testdata/sf0.001"


def test_ann_index_partition_pruned_probe_retrieves_plant(spark, tmp_path):
    emb = _lsh_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")).select("vec_id", "e")
    path = str(tmp_path / "ivf")
    write_ann_index(emb, path)

    # query = a perturbed copy of vector 0 (the planted-near-dup
    # construction the ANN family uses): its true top-1 is vec 0
    base = emb.filter(F.col("vec_id") == 0).first().e
    qvec = [base[0] + 0.01] + list(base[1:])

    top = ann_query_index(spark, path, qvec, nprobe=2, k=10)
    rows = top.collect()
    assert rows[0].vec_id == 0 and rows[0].cosine > 0.99
    assert len(rows) == 10

    # the member scan is PARTITION-PRUNED to the probed cells: the
    # scan node carries cell partition filters and the pruned read
    # touches 2 of 16 cell partitions
    import re
    plan = top._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan

    # storage layout: 16 cell partitions on disk, probe reads 2
    import os
    cells = [d for d in os.listdir(f"{path}/members")
             if d.startswith("cell=")]
    assert len(cells) == 16


def test_ann_index_append_keeps_pruning_and_measures_drift(
        spark, tmp_path):
    """Incremental serving index: appended vectors are assigned by the
    FROZEN quantizer, probes stay partition-pruned and retrieve a
    plant that arrived via append; heavy one-cell appends trip the
    retrain advisory."""
    from engine.index import append_to_ann_index

    emb = _lsh_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")).select("vec_id", "e")
    path = str(tmp_path / "ivf_a")
    base_half = emb.filter(F.col("vec_id") % 2 == 0)
    write_ann_index(base_half, path)

    # append the other half (same distribution: low drift)
    stats = append_to_ann_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    assert stats["appended"] == emb.count() - base_half.count()
    assert not stats["retrain_advised"], stats

    # a plant that ONLY exists in the appended half is retrievable,
    # partition-pruned as before
    target = emb.filter(F.col("vec_id") == 11).first().e
    qvec = [target[0] + 0.01] + list(target[1:])
    top = ann_query_index(spark, path, qvec, nprobe=2, k=5).collect()
    assert top[0].vec_id == 11 and top[0].cosine > 0.99

    # drift: pile many copies of one vector into one cell -> skew
    # passes the bound and the append advises a retrain
    clones = (emb.filter(F.col("vec_id") == 0)
              .crossJoin(spark.range(3000).select(
                  (F.col("id") + 100000).alias("nid")))
              .select(F.col("nid").alias("vec_id"), "e"))
    stats2 = append_to_ann_index(clones, path, skew_bound=4.0)
    assert stats2["retrain_advised"], stats2

    # the occupancy SIDECAR (k rows, merged per append from the batch
    # counts only — ADVICE r5: no O(corpus) re-aggregation) agrees
    # exactly with a ground-truth aggregation of the members tree
    truth = {r.cell: r.n for r in
             spark.read.parquet(f"{path}/members")
             .groupBy("cell").agg(F.count("*").alias("n")).collect()}
    side = {r.cell: r.n for r in
            spark.read.parquet(f"{path}/cell_counts").collect()}
    assert side == truth

    # pre-sidecar index (bootstrap path): delete the sidecar, append
    # again — one full count rebuilds it and it stays exact
    import shutil
    shutil.rmtree(f"{path}/cell_counts")
    more = (emb.filter(F.col("vec_id") == 1)
            .select((F.col("vec_id") + 200000).alias("vec_id"), "e"))
    append_to_ann_index(more, path)
    truth = {r.cell: r.n for r in
             spark.read.parquet(f"{path}/members")
             .groupBy("cell").agg(F.count("*").alias("n")).collect()}
    side = {r.cell: r.n for r in
            spark.read.parquet(f"{path}/cell_counts").collect()}
    assert side == truth

    # reconciliation: a STALE sidecar (the crash window between a
    # members append and its sidecar overwrite) must self-heal on the
    # next append — the footer-count check sees the mismatch and
    # triggers the one-off recount instead of compounding the error
    stale = dict(side)
    some_cell = next(iter(stale))
    stale[some_cell] -= 5
    (spark.createDataFrame(sorted(stale.items()), "cell long, n long")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/cell_counts"))
    more2 = (emb.filter(F.col("vec_id") == 2)
             .select((F.col("vec_id") + 300000).alias("vec_id"), "e"))
    append_to_ann_index(more2, path)
    truth = {r.cell: r.n for r in
             spark.read.parquet(f"{path}/members")
             .groupBy("cell").agg(F.count("*").alias("n")).collect()}
    side = {r.cell: r.n for r in
            spark.read.parquet(f"{path}/cell_counts").collect()}
    assert side == truth


def test_ann_index_sampled_fit_and_wider_probe(spark, tmp_path):
    """train_limit flows through; widening nprobe can only add
    candidates (the top-1 stays put)."""
    emb = _lsh_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")).select("vec_id", "e")
    path = str(tmp_path / "ivf_s")
    write_ann_index(emb, path, train_limit=200)

    base = emb.filter(F.col("vec_id") == 10).first().e
    qvec = [base[0] + 0.01] + list(base[1:])
    t2 = ann_query_index(spark, path, qvec, nprobe=2, k=5).collect()
    t4 = ann_query_index(spark, path, qvec, nprobe=4, k=5).collect()
    assert t2[0].vec_id == 10 and t4[0].vec_id == 10
    # nprobe=4's candidate set contains nprobe=2's
    assert {r.vec_id for r in t2} <= {r.vec_id for r in t4} \
        or t2[0].vec_id == t4[0].vec_id


def test_ann_index_append_heals_unreadable_sidecar(spark, tmp_path):
    """ADVICE r6 item 1: a crash MID-overwrite of the cell_counts
    sidecar can leave the directory existing but holding no readable
    parquet (only _temporary debris).  The next append must degrade to
    the full-recount reconciliation and rebuild a correct sidecar —
    not crash every subsequent append."""
    import os
    import shutil

    from engine.index import append_to_ann_index

    emb = _lsh_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")).select("vec_id", "e")
    path = str(tmp_path / "ivf_torn")
    write_ann_index(emb.filter(F.col("vec_id") % 2 == 0), path)

    # simulate the torn overwrite: dir exists, no readable parquet
    shutil.rmtree(f"{path}/cell_counts")
    os.makedirs(f"{path}/cell_counts/_temporary")

    stats = append_to_ann_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    assert stats["appended"] > 0

    # the sidecar healed: per-cell counts again equal the members tree
    counts = {r.cell: r.n for r in
              spark.read.parquet(f"{path}/cell_counts").collect()}
    members = {r.cell: r.n for r in
               spark.read.parquet(f"{path}/members")
               .groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert counts == members

    # and probes still work end-to-end
    target = emb.filter(F.col("vec_id") == 11).first().e
    top = ann_query_index(spark, path,
                          [target[0] + 0.01] + list(target[1:]),
                          nprobe=2, k=5).collect()
    assert top[0].vec_id == 11
