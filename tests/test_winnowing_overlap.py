"""The winnowing cross-document overlap join (VERDICT r2 item 6) must
RETRIEVE: each planted pair shares a unique 65-char run, so by the
winnowing guarantee (shared run ≥ w+k-1 chars ⇒ ≥1 shared
fingerprint) the groupBy(fp) self-join has to surface every pair."""

from pyspark.sql import functions as F

from engine.queries import _REGISTRY
import engine.analytics  # noqa: F401

SF = "/root/testdata/sf0.001"


def test_winnowing_overlap_surfaces_all_planted_pairs(spark):
    fn, _ = _REGISTRY["winnowing_overlap"]
    df = fn(spark, SF)
    # plant ids sit at +off / +2·off above the natural space, off =
    # max(doc_id)+1 (ADVICE r3: offsets derived, not fixed constants)
    off = spark.read.parquet(f"{SF}/documents.parquet") \
        .agg(F.max("doc_id")).first()[0] + 1
    plants = (df.filter((F.col("doc_a") >= off)
                        & (F.col("doc_b") - F.col("doc_a") == off))
              .collect())
    assert len(plants) == 50  # 500 docs / 10
    # the 65-char shared run guarantees ≥ ceil((65-13-7)/8) ≈ 6 shared
    # window minima; the query's own floor is 3
    assert min(r["n_shared"] for r in plants) >= 3
    # plants must NOT overlap the natural corpus (their runs are
    # md5-unique): any (natural, plant) pair is a bug
    cross = df.filter((F.col("doc_a") < off)
                      & (F.col("doc_b") >= off)).count()
    assert cross == 0
