"""Static schemas for the transcript pipeline (SURVEY.md §1.3).

The reference's output attribute set is dynamic (driven by the query);
Spark requires a static top-level schema, so per-record attr→value
pairs live in a ``map<string,string>`` (``valueContainsNull=True`` —
the reference emits ``None`` for replay misses,
``general_parser.py:204``) inside a fixed envelope.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, MapType, StringType, StructField,
    StructType, TimestampType,
)

# Input: Iceberg/parquet table of multi-turn transcripts
# (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), True),
    StructField("text", StringType(), True),
    StructField("tool", StringType(), True),
    StructField("ts", TimestampType(), True),
])

# One output row per input turn.
RESULTS_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), True),
    StructField("entity", StringType(), True),
    StructField("results", ArrayType(MapType(StringType(), StringType(), True)), True),
    StructField("n_results", IntegerType(), False),
    StructField("message", StringType(), True),
    StructField("strategy", StringType(), False),
    StructField("status", StringType(), False),
    StructField("error", StringType(), True),
    StructField("text_nbytes", LongType(), False),
])

# Per-(bucket, query) lineage row (north rule: partition id, input
# snapshot, rows in/out, parse-failure counts) enabling exact resume.
# ``query_id`` is NULL in single-query mode; in multi-query mode each
# query commits its buckets independently, so one query's buckets can
# be complete while another's resume (VERDICT r3 item 7).
LINEAGE_SCHEMA = StructType([
    StructField("bucket", IntegerType(), False),
    StructField("input_snapshot", StringType(), True),
    StructField("rows_in", LongType(), False),
    StructField("rows_out", LongType(), False),
    StructField("parse_failures", LongType(), False),
    StructField("wall_ms", LongType(), False),
    StructField("run_id", StringType(), True),
    StructField("query_id", StringType(), True),
])
