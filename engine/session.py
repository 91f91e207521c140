"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]`` in one JVM; the confs below are the
ones that matter identically on a 1000-executor cluster:

* AQE on (runtime coalescing + skew-join splitting complements the
  explicit conv_id salting in engine/pipeline.py);
* Arrow exchange on, with a bounded records-per-batch.  NOTE: the
  bound is rows, not bytes — for corpora where single turns approach
  the reference's 16 MB request ceiling (settings.py:20), lower
  SPARK_GRAFT_ARROW_BATCH and/or pre-filter with the ``oversize``
  flag (engine/sources.py); Spark offers no per-batch byte cap here;
* shuffle partitions sized to the parallelism at hand (the pipeline
  repartitions explicitly where it matters).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def get_spark(app_name: str = "extraction-engine",
              master: Optional[str] = None,
              shuffle_partitions: Optional[int] = None,
              arrow_batch_rows: Optional[int] = None,
              extra_conf: Optional[dict] = None) -> SparkSession:
    if arrow_batch_rows is None:
        arrow_batch_rows = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH",
                                              "1024"))
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*"))
        except (IndexError, ValueError):
            n = 32
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
