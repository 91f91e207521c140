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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.8 plus
    the training-data pipeline operators."""
    return _queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (same column names)."""
    return _queries.oracle_sql()
