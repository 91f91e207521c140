"""Retrieval evidence for the ANN/LSH family (VERDICT r2 item 1).

``ann_lsh_top1`` being hash-green proves determinism; these tests
prove the banded LSH actually RETRIEVES: the corpus carries planted
near-duplicates (``engine.analytics._planted_embeddings`` — every
10th vector perturbed by +0.01 in its first component), the natural
corpus is near-random (max top-1 cosine ≈ 0.51), so a plant whose
top-1 is its source was genuinely recalled through the band buckets.
"""

import pytest

from engine.queries import _REGISTRY
import engine.analytics  # noqa: F401  (registers the queries)

SF = "/root/testdata/sf0.001"
# plant-id offset = max(vec_id) + 1 (500 vectors, ids 0..499 — ADVICE
# r3: offsets derived from the corpus, not fixed constants)
OFF = 500


@pytest.fixture(scope="module")
def lsh_top1(spark):
    fn, _ = _REGISTRY["ann_lsh_top1"]
    return {r["vec_id"]: (r["neighbor_id"], r["cosine"])
            for r in fn(spark, SF).collect()}


def test_planted_pairs_are_each_others_top1(lsh_top1, spark):
    plants = [v for v in lsh_top1 if v >= OFF]
    assert len(plants) == 50  # 500 base vectors / 10
    for p in plants:
        src = p - OFF
        nb, cos = lsh_top1[p]
        assert nb == src, f"plant {p} retrieved {nb}, not its source"
        assert cos > 0.99
        # and symmetrically: the source's nearest is its plant
        assert lsh_top1[src][0] == p


def test_natural_corpus_stays_dissimilar(lsh_top1):
    naturals = {v: c for v, (n, c) in lsh_top1.items()
                if v < OFF and n < OFF}
    assert naturals, "no natural-only matches surfaced"
    assert max(naturals.values()) < 0.95


def test_recall_report_is_perfect_on_plants(spark):
    fn, _ = _REGISTRY["ann_recall_report"]
    row = fn(spark, SF).collect()[0]
    assert row["n_queries"] == 50
    assert row["n_hit"] == 50
    assert row["recall_at_1"] == 1.0


def test_ivf_kmeans_trains_and_recalls_plants(spark):
    """The trained-IVF path (deterministic k-means, nprobe=2) must
    co-locate every plant with its source (recall@1 = 1.0) while
    recall@10 stays honestly partial on the near-random corpus (a
    2-of-16-cell probe cannot see most of a random query's top-10)."""
    fn, _ = _REGISTRY["ann_ivf_recall"]
    row = fn(spark, SF).collect()[0]
    assert row["n_queries"] == 50
    assert row["recall_at_1"] == 1.0
    assert 0.1 < row["recall_at_10"] < 1.0


def test_ivf_kmeans_beats_untrained_seeding(spark):
    """Trained centroids must spread the corpus across cells better
    than the r2 stand-in (16 arbitrary vectors as centroids): no cell
    may hold more than half the corpus after 3 Lloyd iterations."""
    from engine.analytics import _ivf_fit, _lsh_embeddings
    emb = _lsh_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")).select("vec_id", "e")
    _, assign = _ivf_fit(emb)
    sizes = [r["n"] for r in
             assign.groupBy("cell").count()
             .selectExpr("count AS n").collect()]
    assert sum(sizes) == 500
    assert len(sizes) >= 8          # most cells survive training
    assert max(sizes) < 250         # no degenerate mega-cell


def test_ivf_sampled_fit_still_recalls_plants(spark):
    """The 10^9-vector path: fit the k-means on a bounded
    deterministic sample (train_limit), assign/search the FULL corpus.
    Plants must still co-locate with their sources."""
    from pyspark.sql import functions as F

    from engine.analytics import (_ivf_assign, _ivf_fit,
                                  _planted_embeddings)

    emb, off = _planted_embeddings(spark, SF)
    assert off == OFF
    cent, _ = _ivf_fit(emb, train_limit=200)
    assign = _ivf_assign(emb, cent)
    a = assign.alias("a")
    b = (assign.withColumn("vec_id", F.col("vec_id") + off)
         .withColumnRenamed("cell", "plant_cell").alias("b"))
    pairs = a.join(b, "vec_id")  # rows where a plant exists
    split = pairs.filter(F.col("cell") != F.col("plant_cell")).count()
    total = pairs.count()
    assert total == 50
    assert split == 0, "sampled-fit cells separated a planted pair"
