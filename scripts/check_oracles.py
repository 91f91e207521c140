"""Local mimic of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """pandas → sorted list of row tuples with canonical values."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(str(x) for x in vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # queries may leave persisted frames behind by design
        # (iterative loops); drop them so a 58-query session doesn't
        # degrade into LRU-eviction noise (ADVICE r4 item 5)
        spark.catalog.clearCache()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        # storage guard (VERDICT r8 item 1): no registered query may
        # leave cached blocks behind — an unowned persist in a query
        # builder leaks into any long-lived session (the ADVICE r4
        # LRU-lottery failure).  Checked BEFORE the loop-head
        # clearCache so a leak cannot hide behind it.
        # localCheckpoint() blocks are exempt: the iterative operators'
        # RESULT reads them (a lineage cut, not a cache), and the
        # ContextCleaner reclaims them when the result frame is GC'd.
        # semdedup family: ONE deliberately-persisted member frame
        # per invocation — every leak-free alternative measured
        # slower (see semdedup_pairs); bounded, documented, cleared
        # by the loop-head clearCache.
        _allowed_leaks = {"semdedup", "semdedup_clusters"}
        pm = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = pm.toList().iterator()
        leaked = []
        while it.hasNext():
            kv = it.next()
            if not kv._2().isLocallyCheckpointed():
                leaked.append(kv._1())
        if leaked and name in _allowed_leaks:
            leaked = leaked[1:]  # one whitelisted frame
        if leaked:
            failures.append((name, f"CACHE LEAK: {len(leaked)} "
                                   "non-checkpoint persisted RDD(s) "
                                   "after query"))
            print(f"FAIL {name}: cache leak ({len(leaked)} "
                  "non-checkpoint persisted RDDs)")
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if not problems:
            a, b = canon(sdf), canon(odf)
            if a != b:
                diff = [x for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {problems}")
        else:
            print(f"ok   {name}: {len(sdf)} rows")

    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
