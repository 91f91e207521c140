"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcript-extraction pipeline over
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (plus the training-data pipeline operators)
for the DuckDB side-by-side correctness check.  Implementations live
in engine/queries.py and engine/analytics.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import engine.queries as _queries
import engine.analytics as _analytics  # noqa: F401  (registers queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize transcripts from the sf0.001 documents table
    (deterministic HTML per doc, covering all three strategies plus
    prose), run the Arrow-batched extraction kernel, restore turn
    order, and return the per-turn results."""
    from pyspark.sql import Window

    from engine.extract import extract_turns
    from engine.synth import html_family_exprs

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    fams = html_family_exprs(
        "concat('Doc ', doc_id, '-', i)",
        "1000 + (doc_id * 3 + i) % 9000", n_items=3)
    html = F.expr(f"""
      CASE doc_id % 4
        WHEN 0 THEN {fams['general']}
        WHEN 1 THEN {fams['table']}
        WHEN 2 THEN {fams['json']}
        ELSE text
      END""")

    transcripts = docs.select(
        F.concat(F.lit("conv_"), (F.col("doc_id") % 50).cast("string")).alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        html.alias("text"))

    extracted = extract_turns(transcripts, "Can you give me the book: name and price?")
    order = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (extracted
            .withColumn("turn_seq", F.row_number().over(order))
            .select("conv_id", "turn_idx", "turn_seq", "entity", "strategy",
                    "status", "n_results", "message", "results"))


# The driver's correctness pass has a finite per-round budget (r4's
# file truncated at 50 rows while 58 queries were registered — the 8
# missing were exactly the LAST-registered; VERDICT r4 "process
# defect").  Queries that have never received a driver-produced green
# row therefore register FIRST, so any truncation can only hit
# long-green entries.  Keep newly-added queries at the top of this
# list each round; demote them once a CORRECTNESS_r{N}.json row lands.
_PRIORITY_FIRST = [
    # r8 rotation (VERDICT r7 item 4): no new queries this round (an
    # optimization round adds none), so the head is exactly the 30
    # queries the driver's 50-row budget did NOT cover in r7 — every
    # r7-covered query demotes below them, giving each registered
    # query a fresh driver row at least every other round:
    "ann_cosine_topk",
    "ann_lsh_top1",
    "ann_recall_report",
    "boilerplate_strip",
    "cleaning_pass",
    "decontaminate_ngram",
    "dedup_clusters",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash128",
    "dedup_span_exact",
    "dedup_substring",
    "doc_fingerprint",
    "embedding_extract_family",
    "extract_json_family",
    "fingerprint_winnowing",
    "gopher_repetition",
    "lang_id_heuristic",
    "multimodal_features",
    "pdf_extract",
    "pii_scrub",
    "quality_score",
    "quality_signals",
    "semantic_extract_family",
    "simhash128_hamming_candidates",
    "simhash_hamming_candidates",
    "token_count",
    "url_domain_stats",
    "winnowing_overlap",
]


def _reordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY_FIRST if k in mapping}
    head.update((k, v) for k, v in mapping.items() if k not in head)
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.8 plus
    the training-data pipeline operators.  Ordered so queries without a
    prior driver-green correctness row come first (see _PRIORITY_FIRST)."""
    return _reordered(_queries.queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (same column names)."""
    return _reordered(_queries.oracle_sql())
