"""The r8 packed-long argmax in _ivf_assign must be EXACTLY the
struct-argmax it replaced: max over (round(cos, 6) DESC, cell ASC),
ties to the smallest cell — the oracle's ROW_NUMBER order.  The
encoding packs (c_int + 10^6)·2^42 + (2^42 − 1 − cell) into one long
so the aggregate stays on HashAggregate (a struct buffer forces
SortAggregate, which sorts the n×k candidate rows per map task).
"""
import pytest
from pyspark.sql import functions as F

import engine.analytics as A


def _struct_assign(emb, cent):
    """The pre-r8 reference form, kept here as the equivalence bar."""
    pick = F.max(F.struct(F.round(F.expr(A._COS_E_CE), 6).alias("c"),
                          (-F.col("cell")).alias("nc")))
    return (emb.crossJoin(F.broadcast(cent))
            .groupBy("vec_id").agg(pick.alias("m"))
            .select("vec_id", (-F.col("m.nc")).alias("cell")))


@pytest.fixture(scope="module")
def emb(spark):
    return (A._lsh_embeddings(
        A._t(spark, "/root/testdata/sf0.001", "embeddings"))
        .select("vec_id", "e"))


def test_packed_equals_struct_full_corpus(spark, emb):
    cent, _ = A._ivf_fit(emb)
    new = {r.vec_id: r.cell for r in A._ivf_assign(emb, cent).collect()}
    old = {r.vec_id: r.cell for r in _struct_assign(emb, cent).collect()}
    assert new == old and len(new) > 0


def test_packed_tie_breaks_to_smaller_cell(spark, emb):
    cent, _ = A._ivf_fit(emb)
    # duplicate centroid vector under two cell ids: every vector ties
    # on cosine, so BOTH forms must resolve to the smaller cell — and
    # the larger id exercises the high end of the encoding's cell field
    big = A._IVF_ENC_BASE - 2
    dup = (cent.limit(1).select(F.lit(big).alias("cell"), "ce")
           .unionByName(cent.limit(1).select(F.lit(7).alias("cell"),
                                             "ce")))
    new = {r.vec_id: r.cell for r in A._ivf_assign(emb, dup).collect()}
    old = {r.vec_id: r.cell for r in _struct_assign(emb, dup).collect()}
    assert new == old and set(new.values()) == {7}


def test_packed_plan_is_hash_aggregate(spark, emb):
    cent, _ = A._ivf_fit(emb)
    plan = A._ivf_assign(emb, cent)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_seed_bound_asserted(spark, emb):
    # vec_ids >= 2^42 must refuse the fit loudly, not mis-assign
    bad = emb.withColumn(
        "vec_id", F.col("vec_id") + F.lit(A._IVF_ENC_BASE))
    with pytest.raises(AssertionError, match="2\\^42"):
        A._ivf_fit(bad)
