"""The extraction operator: Arrow-batched strategy-ladder UDF.

This is the rebuild's core custom operator (SURVEY.md §2.8 "UDF
surface"): one ``mapInPandas`` kernel that evaluates the reference's
whole strategy ladder per turn — JSON-script → table → general
(``/root/reference/src/intelligent_parser.py:56-188``) — so the
short-circuit priority logic lives INSIDE the kernel where it can skip
DOM work, which a per-strategy ``when()`` column could not
(SURVEY.md §4.1).

Scale notes:

* The NL query is parsed ONCE on the driver and captured by the UDF
  closure (a broadcast-sized struct; SURVEY.md §3.5).
* Rows cross to Python as Arrow record batches
  (``spark.sql.execution.arrow.maxRecordsPerBatch``); all per-row work
  is plain CPU inside the batch — no per-row Python round trips.
* Turns with no markup at all (no ``<`` and no HTML entity) take a
  fast path that emits the exact envelope the full ladder would
  produce for element-free text (the general parser finds no elements
  → zero results, ``general_parser.py:106-113``), skipping
  tokenization entirely — at web scale most turns are prose.
* The operator is a pure row→row map: no shuffle. Partitioning/skew
  policy lives in engine/pipeline.py.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame

from engine.kernels import constants as C
from engine.parser import extract_turn
from engine.query_parse import ParsedQuery, parse_query_hybrid
from engine.schema import RESULTS_SCHEMA


def _no_markup_fast_path(entity: Optional[str]) -> dict:
    return {
        "entity": entity,
        "results": [],
        "n_results": 0,
        "message": f"Found 0 {entity} on this page",
        "strategy": "general",
        "status": "no_results",
        "error": None,
    }


def _stringify_results(results):
    """Map values must be strings for the static MapType schema; the J5
    semantic tier can surface raw JSON scalars (ref keeps them raw,
    json_script_parser.py:468)."""
    out = []
    for record in results:
        out.append({k: (v if v is None or isinstance(v, str) else str(v))
                    for k, v in record.items()})
    return out


def extract_turns(df: DataFrame, query: str,
                  similarity_threshold: float = C.SIMILARITY_THRESHOLD,
                  matcher_factory=None) -> DataFrame:
    """Map a transcripts DataFrame to the results schema for one query.

    Input must carry (conv_id, turn_idx, role, text); extra columns are
    dropped (column pruning reaches the scan because the select below
    is part of the declarative plan).

    ``matcher_factory`` (optional, executor-side ``() -> Matcher``)
    plugs in the semantic tiers; one matcher is built per task so its
    string-pair cache amortizes across the partition — never per row
    (SURVEY.md §4.1: do not re-encode inside the recursion).
    """
    parsed: ParsedQuery = parse_query_hybrid(query)
    bad_query = not parsed.entity or not parsed.attributes

    entity = parsed.entity
    # event-time passthrough keeps streaming aggregations (watermarks
    # over ts) downstream of the kernel without a stream-stream join
    has_ts = "ts" in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = matcher_factory() if matcher_factory is not None else None
        for batch in batches:
            out = {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
            }
            if has_ts:
                out["ts"] = batch["ts"]
            n = len(batch)
            entities = [None] * n
            results = [None] * n
            n_results = [0] * n
            messages = [None] * n
            strategies = ["none"] * n
            statuses = ["bad_query"] * n
            errors = [None] * n
            nbytes = [0] * n

            if not bad_query:
                texts = batch["text"]
                for i in range(n):
                    text = texts.iat[i]
                    if text is None:
                        text = ""
                    nbytes[i] = len(text.encode("utf-8", errors="ignore"))
                    if "<" not in text and "&" not in text:
                        row = _no_markup_fast_path(entity)
                    else:
                        t = extract_turn(text, parsed, similarity_threshold,
                                         matcher)
                        row = {
                            "entity": t.entity,
                            "results": _stringify_results(t.results),
                            "n_results": t.n_results, "message": t.message,
                            "strategy": t.strategy, "status": t.status,
                            "error": t.error,
                        }
                    entities[i] = row["entity"]
                    results[i] = row["results"]
                    n_results[i] = row["n_results"]
                    messages[i] = row["message"]
                    strategies[i] = row["strategy"]
                    statuses[i] = row["status"]
                    errors[i] = row["error"]
            else:
                for i in range(n):
                    messages[i] = "Could not extract entity and attributes from query"
                    results[i] = []

            out["entity"] = pd.Series(entities, dtype=object)
            out["results"] = pd.Series(results, dtype=object)
            out["n_results"] = pd.Series(n_results, dtype="int32")
            out["message"] = pd.Series(messages, dtype=object)
            out["strategy"] = pd.Series(strategies, dtype=object)
            out["status"] = pd.Series(statuses, dtype=object)
            out["error"] = pd.Series(errors, dtype=object)
            out["text_nbytes"] = pd.Series(nbytes, dtype="int64")
            yield pd.DataFrame(out)

    if has_ts:
        from pyspark.sql.types import StructField, StructType, TimestampType
        schema = StructType(
            RESULTS_SCHEMA.fields[:3]
            + [StructField("ts", TimestampType(), True)]
            + RESULTS_SCHEMA.fields[3:])
        pruned = df.select("conv_id", "turn_idx", "role", "ts", "text")
    else:
        schema = RESULTS_SCHEMA
        pruned = df.select("conv_id", "turn_idx", "role", "text")
    return pruned.mapInPandas(run, schema=schema)
