"""End-to-end training-corpus ASSEMBLY job — the downstream half of
the data pipeline.  run_cleaning_job (engine/cleaning.py) produces a
clean corpus; this job turns it into a training-ready dataset:

    mixture weights  (equalize token mass per source — Pile-style cap)
      → stratified sample (the weights become a DETERMINISTIC keep
        predicate: md5-uniform(doc_id) < rate(source))
      → deterministic global shuffle order (rank of md5(doc_id),
        computed with the two-level block scheme)
      → token-budget shard packing over the SHUFFLED order
      → shards written partitionBy(shard_id) + one-pass metrics

Every stage is a pure function of the corpus: re-running the job on
the same input reproduces byte-identical shards (no RNG state, no
timestamps), which is what makes a 100-TB training set auditable —
"which shard is doc X in" is a formula, not a log.

Scale shape: the mixture table is |sources| rows (broadcast); the
sample is a projection-filter; the shuffle rank and the running token
sum share ONE two-level prefix-sum pass (per-block aggregates → a
window over the tiny block table → within-block windows) — the only
single-partition work touches the 256-row block table, never the
corpus (same discipline as q_corpus_shuffle / q_pack_token_budget,
plan-asserted in tests/test_curation_job.py).

A STREAMING variant of this job is deliberately omitted: shard
packing and training order are global properties of the corpus (the
auditability contract above), and a per-arrival assignment would make
them properties of ingestion timing instead — the right streaming
boundary is upstream (stream_clean), with assembly re-run as a batch
job over the compacted corpus."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.analytics import _SPARK_DOC_U, _SPARK_TOKS


def mixture_rates(docs: DataFrame) -> DataFrame:
    """(source, weight) keep rates equalizing token mass across
    sources — delegates to engine/analytics.mixture_weight_table (ONE
    policy definition shared with the q_mixture_weights driver query)
    and keeps the UNROUNDED rate for sampling."""
    from engine.analytics import mixture_weight_table

    return mixture_weight_table(docs).select("source", "weight")


def stratified_sample(docs: DataFrame, rates: DataFrame) -> DataFrame:
    """Keep a document iff its deterministic 60-bit-md5 uniform falls
    under its source's rate — the sample is a predicate, so it is
    reproducible across engines, restarts, and partition layouts."""
    return (docs.join(F.broadcast(rates), "source")
            .filter(F.expr(_SPARK_DOC_U) < F.col("weight"))
            .drop("weight"))


def shuffled_shards(docs: DataFrame, budget: int) -> DataFrame:
    """Assign every document a deterministic global shuffle position
    (rank of md5(doc_id)) and a shard_id packing ~``budget`` tokens
    per shard in that order — ONE two-level prefix-sum pass serves
    both numbers: per-block (first hex byte of the key) counts and
    token sums, a running-offset window over the ≤256-row block
    table, then within-block windows (each instance sees one block's
    rows).  Widen the block prefix at larger corpora
    (q_corpus_shuffle's contract)."""
    keyed = (docs.withColumn(
        "k", F.md5(F.col("doc_id").cast("string").cast("binary")))
        .withColumn("blk", F.substring("k", 1, 2))
        .withColumn("ntok",
                    F.expr(f"size({_SPARK_TOKS})").cast("long")))
    blk = keyed.groupBy("blk").agg(F.count("*").alias("n"),
                                   F.sum("ntok").alias("btok"))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding,
                                              -1)
    offsets = blk.select(
        "blk",
        F.coalesce(F.sum("n").over(w_blk), F.lit(0)).alias("pos_off"),
        F.coalesce(F.sum("btok").over(w_blk), F.lit(0)).alias("tok_off"))
    w_in = Window.partitionBy("blk").orderBy("k", "doc_id")
    w_run = w_in.rowsBetween(Window.unboundedPreceding, -1)
    return (keyed.join(F.broadcast(offsets), "blk")
            .withColumn("pos", (F.col("pos_off")
                                + F.row_number().over(w_in))
                        .cast("long"))
            .withColumn("shard_id",
                        F.floor((F.col("tok_off")
                                 + F.coalesce(F.sum("ntok").over(w_run),
                                              F.lit(0)))
                                / budget).cast("long"))
            .drop("k", "blk", "pos_off", "tok_off"))


def run_curation_job(spark: SparkSession, input_path: str,
                     output_path: str, budget: int = 2048) -> dict:
    """documents parquet in → sharded training corpus out (parquet
    partitioned by shard_id, each row carrying its global shuffle
    ``pos`` and token count), one metrics dict back.

    One-pass metrics (the cleaning job's discipline): the shard write
    is the only action that executes the lineage — rows/token totals
    ride it as an ``observe``; rows_in is a zero-column footer count;
    n_shards comes from the written partition directories (driver
    metadata, no data read)."""
    import os

    from pyspark.sql import Observation

    t0 = time.time()
    docs = spark.read.parquet(input_path)
    sampled = stratified_sample(docs, mixture_rates(docs))
    sharded = shuffled_shards(sampled, budget)
    obs = Observation()
    out = sharded.observe(
        obs, F.count(F.lit(1)).alias("rows_out"),
        F.sum("ntok").alias("tokens_out"))
    out.write.mode("overwrite").partitionBy("shard_id") \
        .parquet(output_path)
    m = obs.get
    n_shards = sum(1 for d in os.listdir(output_path)
                   if d.startswith("shard_id="))
    return {"rows_in": docs.count(),
            "rows_out": int(m["rows_out"]),
            "tokens_out": int(m["tokens_out"] or 0),
            "n_shards": n_shards,
            "budget": budget,
            "wall_sec": round(time.time() - t0, 3)}
