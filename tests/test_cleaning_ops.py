"""PII scrub + fused cleaning pass (round-3 training-data hygiene ops)."""

from pyspark.sql import functions as F

from engine.queries import _REGISTRY
import engine.analytics  # noqa: F401

SF = "/root/testdata/sf0.001"


def test_pii_scrub_finds_every_plant(spark):
    fn, _ = _REGISTRY["pii_scrub"]
    df = fn(spark, SF)
    planted = df.filter(F.col("doc_id") % 5 == 0)
    assert planted.count() == 100
    row = planted.agg(F.min("n_emails").alias("e"),
                      F.min("n_phones").alias("p")).first()
    assert row["e"] >= 1 and row["p"] >= 1
    # scrubbed text must differ from raw wherever something was found
    raw_md5 = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("m"))
    joined = df.join(raw_md5, "doc_id")
    changed = joined.filter((F.col("n_emails") + F.col("n_phones") > 0)
                            & (F.col("scrubbed_md5") == F.col("m"))).count()
    assert changed == 0


def test_cleaning_pass_is_single_scan_single_shuffle(spark):
    """The fused gate ∘ gate ∘ dedup composition must cost what dedup
    alone costs: one parquet scan, one exchange (the dedup groupBy)."""
    fn, _ = _REGISTRY["cleaning_pass"]
    df = fn(spark, SF)
    n = df.count()
    assert 0 < n <= 500
    plan = (df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    # survivors obey the gates: recompute independently
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = "filter(split(lower(text), ' '), x -> length(x) > 0)"
    ntok = docs.select(F.expr(f"size({toks})").alias("n"),
                       F.md5(F.col("text").cast("binary")).alias("h"))
    kept_hashes = {r["content_hash"] for r in df.collect()}
    small = {r["h"] for r in ntok.filter(F.col("n") < 10).collect()}
    assert not (kept_hashes & small), "length gate leaked a short doc"
