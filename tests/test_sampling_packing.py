"""Stratified sampling + token-budget packing (r5 training-data ops):
determinism, rate conformance, and the packing plan's scale shape —
the prefix sum must never run a corpus-wide single-partition window
(that is the oracle's shape, not the engine's)."""

from pyspark.sql import functions as F

import engine.analytics  # noqa: F401  (registers the queries)
from engine.queries import _REGISTRY

SF = "/root/testdata/sf0.001"


def test_sample_stratified_deterministic_and_rate_bounded(spark):
    fn, _ = _REGISTRY["sample_stratified"]
    a = {r.doc_id for r in fn(spark, SF).collect()}
    b = {r.doc_id for r in fn(spark, SF).collect()}
    assert a == b and len(a) > 0  # a predicate, not a sample state

    # kept fraction per stratum tracks the target rate (60-bit uniform
    # at sf0.001 stratum sizes: loose tolerance, exact determinism)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tot = {r.source: r["count"] for r in
           docs.groupBy("source").count().collect()}
    kept = fn(spark, SF).groupBy("source").agg(
        F.count("*").alias("k"), F.first("rate").alias("rate")).collect()
    for r in kept:
        assert r.k <= tot[r.source]
        assert abs(r.k / tot[r.source] - r.rate) < 0.45  # tiny strata


def test_pack_token_budget_shards_and_plan_shape(spark):
    fn, _ = _REGISTRY["pack_token_budget"]
    out = fn(spark, SF)
    rows = sorted((r.doc_id, r.ntok, r.shard_id) for r in out.collect())

    # semantics: shard boundaries follow the running sum in id order
    cum = 0
    for doc_id, ntok, shard in rows:
        assert shard == cum // 2048, (doc_id, cum, shard)
        cum += ntok
    assert rows[-1][2] > 0  # corpus spans multiple shards

    # scale shape: the only single-partition exchange feeds the BLOCK
    # aggregate/window, never the document rows — the plan must not
    # sort the corpus globally.  Count SinglePartition exchanges and
    # assert each sits above a HashAggregate (the tiny block table),
    # not directly above the parquet scan.
    plan = out._jdf.queryExecution().executedPlan().toString()
    # a global sort of the corpus would appear as a rangepartitioning
    # exchange on doc_id — it must NOT exist
    assert "Exchange rangepartitioning" not in plan, plan
    # SinglePartition exchanges exist only on the BLOCK side (the
    # tiny offset window; AQE may stage the agg as two) — every one
    # must sit above the blk HashAggregate, never above the raw scan
    import re
    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.end():]
        agg_at = tail.find("HashAggregate(keys=[blk")
        scan_at = tail.find("FileScan parquet")
        assert 0 <= agg_at < scan_at, plan
    # the corpus-side window is partitioned by blk (parallel)
    assert re.search(r"\[blk#\d+L?\], \[doc_id#", plan), plan
