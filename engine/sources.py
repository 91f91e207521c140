"""Sources: file-based page ingestion (SURVEY.md §2.1 S2).

The reference's ``/parse-from-file`` endpoint reads one HTML file per
request (``app.py:132-230``); the distributed analogue ingests a
directory/glob of page files as a DataFrame shaped like the transcript
table, so the same extraction kernel runs unchanged:

* ``wholetext`` text source — one row per file, ``input_file_name()``
  as the conversation id;
* the 16 MB request ceiling (``settings.py:20``) becomes a size guard
  column instead of an HTTP 413.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_CONTENT_LENGTH = 16 * 1024 * 1024  # ref settings.py:20


def read_html_files(spark: SparkSession, path: str,
                    max_bytes: int = MAX_CONTENT_LENGTH) -> DataFrame:
    """One transcript-shaped row per HTML file under ``path``.

    Files over ``max_bytes`` are kept but flagged (``oversize=true``)
    so the job can filter or account for them — the reference rejects
    them at the HTTP layer (``app.py:92-96``)."""
    raw = (spark.read.text(path, wholetext=True)
           .select(F.input_file_name().alias("conv_id"),
                   F.lit(0).alias("turn_idx"),
                   F.lit("assistant").alias("role"),
                   F.col("value").alias("text"),
                   F.lit("browser").alias("tool"),
                   F.lit(None).cast("timestamp").alias("ts")))
    return raw.withColumn("oversize",
                          F.octet_length("text") > F.lit(max_bytes))
