"""Duplicate-cluster formation (connected components over the near-dup
pair graph) and the cluster-based removal policy: transitivity is the
point — A~B~C is ONE cluster with ONE survivor even when A~C was never
detected as a pair."""

from pyspark.sql import functions as F

from engine.analytics import _connected_components
from engine.cleaning import run_cleaning_job


def _labels(spark, pair_rows):
    pairs = spark.createDataFrame(pair_rows, "doc_a long, doc_b long")
    out = _connected_components(pairs).collect()
    return {r.doc_id: r.cluster_id for r in out}


def test_connected_components_chain_star_and_islands(spark):
    got = _labels(spark, [
        (1, 3), (3, 5), (5, 7),      # chain, diameter 3
        (10, 12), (10, 14),          # star
        (20, 21),                    # island pair
    ])
    assert got == {1: 1, 3: 1, 5: 1, 7: 1,
                   10: 10, 12: 10, 14: 10,
                   20: 20, 21: 20}


def test_connected_components_largest_id_in_middle(spark):
    """The case pairwise larger-id removal gets wrong: edges (1,9) and
    (2,9) form ONE cluster {1, 2, 9}, but dropping only doc_b's keeps
    both 1 and 2.  The component labeling must still merge them."""
    got = _labels(spark, [(1, 9), (2, 9)])
    assert got == {1: 1, 2: 1, 9: 1}


def test_connected_components_chain_converges_logarithmically(spark):
    """Pointer jumping (VERDICT r4 item 2): a pure chain of depth 16 —
    the worst case for one-hop propagation (16 rounds) — must converge
    in <= 4 rounds (the min label travels ~2^(r+1) hops by round r) and
    still label every node with the chain head."""
    from engine.analytics import _connected_components as cc

    # label distance covered by round r is ~2^(r+1)-2 (propagate one
    # hop, then jump doubles); +1 round for the fixpoint detection
    for depth, budget in ((8, 4), (30, 6)):
        rows = [(i, i + 1) for i in range(depth)]
        pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
        stats = {}
        # driver_max_edges=0 forces the DISTRIBUTED loop — this test
        # pins the pointer-jumping round budget, which the r8 driver
        # union-find fast path would otherwise bypass on small graphs
        got = {r.doc_id: r.cluster_id
               for r in cc(pairs, stats=stats,
                           driver_max_edges=0).collect()}
        assert got == {i: 0 for i in range(depth + 1)}
        assert stats["iters"] <= budget, (depth, stats)


def test_connected_components_raises_when_budget_exhausted(spark):
    """ADVICE r4: exhausting max_iters must fail loudly, never return
    split clusters."""
    import pytest

    from engine.analytics import _connected_components as cc

    pairs = spark.createDataFrame([(i, i + 1) for i in range(8)],
                                  "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        # forced distributed: the r8 driver fast path solves small
        # graphs exactly and never exhausts a round budget
        cc(pairs, max_iters=1, driver_max_edges=0)


def test_connected_components_label_flows_against_edge_direction(spark):
    """Min id reachable only via a higher-id hub: (5, 9), (3, 9), (1, 5)
    — label 1 must propagate 1→5→9→3 across three iterations."""
    got = _labels(spark, [(5, 9), (3, 9), (1, 5)])
    assert got == {1: 1, 3: 1, 5: 1, 9: 1}


_FILLERS = [
    "the committee approved a new budget of unprecedented size and "
    "is expected to publish the details tomorrow morning",
    "a gentle rain fell over the harbor and the fishermen decided it "
    "was wise to stay ashore until the storm passed",
    "the museum opened a wing dedicated to the history of navigation "
    "and it drew visitors from every province",
    "a long drought forced the village to dig deeper wells and the "
    "council voted to ration water until the spring",
]

_A = ("the quick brown fox jumps over a lazy dog while the amber sun "
      "settles on the quiet valley and the winding river keeps running "
      "north past the old stone mill")
_C = ("a curious cat wanders through the ancient library reading "
      "forgotten books about distant lands and the people who wrote "
      "them is a mystery to every scholar of the eastern archives")


def _write_chain_corpus(spark, path):
    """doc 1 = A, doc 2 = C (unrelated to A), doc 3 = B = A + C — so the
    near-dup pairs are (1,3) and (2,3) with NO (1,2) pair, and the
    MIDDLE of the chain holds the LARGEST id."""
    rows = [(1, _A), (2, _C), (3, _A + " " + _C)]
    rows += [(10 + i, t) for i, t in enumerate(_FILLERS)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(path)


def test_cleaning_job_cluster_policy_collapses_chain(spark, tmp_path):
    inp = str(tmp_path / "docs")
    _write_chain_corpus(spark, inp)

    # pairwise policy: drops only the doc_b members (doc 3), keeping
    # BOTH 1 and 2 from the {1,2,3} cluster
    m_pair = run_cleaning_job(spark, inp, str(tmp_path / "out_pair"),
                              neardup_policy="pairwise")
    pair_ids = {r.doc_id for r in
                spark.read.parquet(str(tmp_path / "out_pair"))
                .select("doc_id").collect()}
    assert pair_ids == {1, 2, 10, 11, 12, 13}

    # cluster policy: the A~B~C chain collapses to ONE survivor (min id)
    m_clu = run_cleaning_job(spark, inp, str(tmp_path / "out_clu"),
                             neardup_policy="clusters")
    clu_ids = {r.doc_id for r in
               spark.read.parquet(str(tmp_path / "out_clu"))
               .select("doc_id").collect()}
    assert clu_ids == {1, 10, 11, 12, 13}
    assert m_clu["after_neardup_removal"] == m_pair["after_neardup_removal"] - 1
    assert m_clu["rows_in"] == m_pair["rows_in"] == 7


def test_connected_components_driver_path_equals_distributed(spark):
    """r8 size-adaptive fast path: the driver union-find must label
    exactly like the pointer-jumping loop (same min-id fixpoint) on a
    graph mixing chains, stars, islands and reversed edges."""
    from engine.analytics import _connected_components as cc

    rows = ([(i, i + 1) for i in range(12)]              # chain 0..12
            + [(50, 40), (50, 41), (50, 42)]             # star, reversed
            + [(100, 101)]                                # island
            + [(7, 200), (200, 201)])                     # chain graft
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    stats_d = {}
    fast = {(r.doc_id, r.cluster_id)
            for r in cc(pairs, stats=stats_d).collect()}
    dist = {(r.doc_id, r.cluster_id)
            for r in cc(pairs, driver_max_edges=0).collect()}
    assert fast == dist and fast
    assert stats_d.get("driver_path") is True
