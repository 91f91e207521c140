"""End-to-end training-corpus assembly job (engine/curation.py):
mixture-capped stratified sample → deterministic shuffle order →
token-budget shards.  Pins the sample predicate against a driver-side
recomputation, the packing against the md5-order running sum, shard
budget discipline, byte-identical re-runs, and the two-level plan
shape (no corpus-wide sort)."""

import hashlib
import re
from collections import Counter

from engine.curation import run_curation_job

SF = "/root/testdata/sf0.001"


def _tokens(text):
    return [t for t in text.lower().split(" ") if t]


def _md5_60_u(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[17:32],
               16) / 2**60


def _expected(spark):
    """Driver-side recomputation of the whole job."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = Counter()
    for d in docs:
        per[d.source] += len(_tokens(d.text))
    share = sum(per.values()) / len(per)
    rates = {s: min(1.0, share / t) for s, t in per.items()}
    kept = [d for d in docs if _md5_60_u(d.doc_id) < rates[d.source]]
    order = sorted(kept, key=lambda d: (hashlib.md5(
        str(d.doc_id).encode()).hexdigest(), d.doc_id))
    return order


def test_curation_job_semantics_and_determinism(spark, tmp_path):
    out1 = str(tmp_path / "shards1")
    m = run_curation_job(spark, f"{SF}/documents.parquet", out1,
                         budget=2048)
    rows = {r.doc_id: r for r in spark.read.parquet(out1).collect()}

    order = _expected(spark)
    assert m["rows_in"] == 500
    assert m["rows_out"] == len(order) == len(rows)
    assert 0 < m["rows_out"] < m["rows_in"]

    # shuffle positions and shard assignment match the driver-side
    # running sum over md5 order
    run = 0
    for pos, d in enumerate(order, start=1):
        r = rows[d.doc_id]
        nt = len(_tokens(d.text))
        assert r.pos == pos
        assert r.ntok == nt
        assert r.shard_id == run // 2048, d.doc_id
        run += nt
    assert m["tokens_out"] == run
    assert m["n_shards"] == rows[order[-1].doc_id].shard_id + 1

    # budget discipline: a shard exceeds the budget only by (part of)
    # its final document
    by_shard = {}
    for d in order:
        by_shard.setdefault(rows[d.doc_id].shard_id, []).append(
            len(_tokens(d.text)))
    for toks in by_shard.values():
        assert sum(toks) - toks[-1] < 2048

    # byte-identical re-run (auditable corpus: the mapping is a
    # formula, not a log)
    out2 = str(tmp_path / "shards2")
    m2 = run_curation_job(spark, f"{SF}/documents.parquet", out2,
                          budget=2048)
    rows2 = {(r.doc_id, r.pos, r.shard_id)
             for r in spark.read.parquet(out2).collect()}
    assert rows2 == {(r.doc_id, r.pos, r.shard_id)
                     for r in rows.values()}
    assert {k: v for k, v in m2.items() if k != "wall_sec"} \
        == {k: v for k, v in m.items() if k != "wall_sec"}


def test_curation_job_plan_shape(spark, tmp_path):
    """No corpus-wide sort: every SinglePartition exchange feeds the
    tiny block aggregate, and the corpus-side windows partition by
    block."""
    from engine.curation import (mixture_rates, shuffled_shards,
                                 stratified_sample)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = shuffled_shards(stratified_sample(docs, mixture_rates(docs)),
                          2048)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan, plan
    for mch in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[mch.end():]
        # the next aggregate below the exchange consumes an already-
        # aggregated tiny table (block counts or the 1-row mixture
        # total), never the raw corpus scan
        agg_at = tail.find("HashAggregate(keys=[")
        scan_at = tail.find("FileScan parquet")
        assert 0 <= agg_at < scan_at, plan
    assert re.search(r"\[blk#\d+\], \[k#", plan), plan


def test_full_pipeline_clean_then_curate(spark, tmp_path):
    """The two jobs chain: run_cleaning_job's output parquet is
    run_curation_job's input — the complete raw-corpus → training-
    shards pipeline, funnels reconciling end to end."""
    from engine.cleaning import run_cleaning_job

    cleaned = str(tmp_path / "cleaned")
    shards = str(tmp_path / "shards")
    mc = run_cleaning_job(spark, f"{SF}/documents.parquet", cleaned,
                          model_gate="dsir")
    mq = run_curation_job(spark, cleaned, shards, budget=2048)

    assert mq["rows_in"] == mc["rows_out"] > 0
    assert 0 < mq["rows_out"] <= mq["rows_in"]
    assert mq["n_shards"] >= 1
    out = spark.read.parquet(shards)
    assert out.count() == mq["rows_out"]
    # every surviving row still carries the cleaned corpus columns
    for c in ("doc_id", "text", "source", "pos", "ntok", "shard_id"):
        assert c in out.columns


def test_mixture_rates_zero_token_source(spark):
    """A source whose documents have no tokens must get weight 1.0 on
    both engines (DuckDB x/0 = inf -> LEAST 1.0; Spark x/0 would be
    NULL and silently drop the stratum — pinned explicitly)."""
    from engine.curation import mixture_rates

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "srcA"),
         (2, "", "srcB")],
        "doc_id long, text string, source string")
    w = {r.source: r.weight for r in mixture_rates(docs).collect()}
    assert w["srcB"] == 1.0
    assert 0 < w["srcA"] <= 1.0
