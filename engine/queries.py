"""Driver-contract query registry: Spark implementation + DuckDB oracle
per operator (SURVEY.md §2.8, FIXTURES.md §4).

Three groups:

1. **Relational semantics of the reference** — every "Oracle? yes"
   operator from SURVEY.md §2 re-expressed over the TPC-H-ish testdata
   tables, so the driver can verify the exact aggregation/window/
   string semantics the extraction pipeline relies on.
2. **Kernel-through-the-driver** — ``extract_*`` queries build HTML
   from ``documents`` rows with closed-form content, run the REAL
   Arrow-batched extraction kernel, and the oracle reconstructs the
   expected records directly in SQL: a full correctness check of the
   UDF itself.
3. **Training-data pipeline operators** — dedup (exact, MinHash+LSH
   word-3-gram shingles, SimHash), ANN cosine top-k over embeddings,
   language-ID, quality scoring, token counting, fingerprinting.

Determinism rules for cross-engine hash equality: no raw doubles
(always ``round``), no timestamps in outputs, explicit ORDER-free
semantics (the driver compares order-insensitively), identical
tokenization (split on single space + drop empties) on both sides.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> Dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> Dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# group 1 — relational semantics of the reference
# ---------------------------------------------------------------------------

@register("dedup_signature", """
SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
""")
def q_dedup_signature(spark, sf_dir):
    """J7 — dedup by full attr-value signature → SELECT DISTINCT
    (ref json_script_parser.py:565-585)."""
    return (_t(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_linestatus", "l_quantity")
            .dropDuplicates())


@register("group_winner_rank", """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn = 1
""")
def q_group_winner_rank(spark, sf_dir):
    """G5/M2 — winning-group argmax per page → window rank = 1
    (ref general_parser.py:164-182)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (_t(spark, sf_dir, "orders")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_totalprice"))


@register("best_record_maxby", """
SELECT user_id, event_id AS best_event FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
""")
def q_best_record_maxby(spark, sf_dir):
    """G10 — best likely-container record (most attrs, then confidence)
    → max_by with a deterministic composite key
    (ref general_parser.py:255-265)."""
    return (_t(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.expr("max_by(event_id, struct(value, event_id))")
                 .alias("best_event")))


@register("sufficiency_gate", """
SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) >= CEIL(5 * 2.0 / 3)
""")
def q_sufficiency_gate(spark, sf_dir):
    """J8 — the ≥2/3-of-attributes acceptance gate → HAVING count
    filter (ref intelligent_parser.py:81)."""
    return (_t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.countDistinct("o_orderpriority").alias("n_priorities"))
            .filter(F.col("n_priorities") >= F.ceil(F.lit(5 * 2.0 / 3))))


@register("confidence_mean_missing_zero", """
SELECT user_id,
       ROUND(AVG(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4)
         AS mean_confidence
FROM events GROUP BY user_id
""")
def q_confidence_mean(spark, sf_dir):
    """G11 — mean confidence counting missing attrs as 0
    (ref general_parser.py:855-868)."""
    return (_t(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.round(F.avg(F.when(F.col("event_type") == "click",
                                      F.col("value")).otherwise(0)), 4)
                 .alias("mean_confidence")))


@register("turn_order_window", """
SELECT user_id, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_seq
FROM events
""")
def q_turn_order_window(spark, sf_dir):
    """North rule — stable turn-order restoration via
    ROW_NUMBER() OVER (conv, turn) (engine/pipeline.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (_t(spark, sf_dir, "events")
            .select("user_id", "event_id",
                    F.row_number().over(w).cast("long").alias("turn_seq")))


@register("text_clean", """
SELECT doc_id,
       trim(regexp_replace(replace(replace(replace(lower(text), chr(160), ' '),
            '–', '-'), '—', '-'), '\\s+', ' ', 'g')) AS cleaned
FROM documents
""")
def q_text_clean(spark, sf_dir):
    """T5/Q1/G12 — whitespace collapse + nbsp/dash normalization
    (ref table_parser.py:226-239)."""
    cleaned = F.trim(F.regexp_replace(
        F.replace(F.replace(F.replace(F.lower(F.col("text")),
                                      F.lit("\xa0"), F.lit(" ")),
                            F.lit("–"), F.lit("-")),
                  F.lit("—"), F.lit("-")),
        r"\s+", " "))
    return _t(spark, sf_dir, "documents").select("doc_id", cleaned.alias("cleaned"))


@register("union_multi_table", """
SELECT l_orderkey, l_linenumber, 'returned' AS bucket_tag
FROM lineitem WHERE l_returnflag = 'R'
UNION ALL
SELECT l_orderkey, l_linenumber, 'accepted' AS bucket_tag
FROM lineitem WHERE l_returnflag = 'A'
""")
def q_union_multi_table(spark, sf_dir):
    """T6/J — multi-table/multi-script result concat → UNION ALL
    (ref table_parser.py:59-83)."""
    li = _t(spark, sf_dir, "lineitem")
    a = (li.filter(F.col("l_returnflag") == "R")
         .select("l_orderkey", "l_linenumber", F.lit("returned").alias("bucket_tag")))
    b = (li.filter(F.col("l_returnflag") == "A")
         .select("l_orderkey", "l_linenumber", F.lit("accepted").alias("bucket_tag")))
    return a.unionAll(b)


@register("nav_suppress", """
SELECT event_id,
       CASE WHEN event_type IN ('view', 'click') THEN NULL
            ELSE event_type END AS kept_type
FROM events
""")
def q_nav_suppress(spark, sf_dir):
    """G9(b) — navigation-keyword null-out as a column rewrite
    (ref general_parser.py:241-248)."""
    return (_t(spark, sf_dir, "events")
            .select("event_id",
                    F.when(F.col("event_type").isin("view", "click"), None)
                     .otherwise(F.col("event_type")).alias("kept_type")))


@register("topk_limit", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def q_topk_limit(spark, sf_dir):
    """Top-k pruning (ref ml_html_parser/parser.py:294-303,
    MAX_RESULTS_PER_QUERY settings.py:50)."""
    return (_t(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .select("o_orderkey", "o_totalprice").limit(10))


@register("fuzzy_theta_join", """
WITH attrs AS (SELECT DISTINCT lower(split_part(p_name, ' ', 2)) AS attr
               FROM part
               WHERE length(split_part(p_name, ' ', 2)) > 0),
headers AS (SELECT DISTINCT lower(p_name) AS header FROM part)
SELECT attr, header, score FROM (
  SELECT a.attr, h.header,
         CAST(CASE WHEN a.attr = h.header THEN 1.0
              WHEN position(a.attr IN h.header) > 0
                OR position(h.header IN a.attr) > 0 THEN 0.8
              ELSE 0.0 END AS DOUBLE) AS score,
         ROW_NUMBER() OVER (PARTITION BY a.attr ORDER BY
           CASE WHEN a.attr = h.header THEN 1.0
                WHEN position(a.attr IN h.header) > 0
                  OR position(h.header IN a.attr) > 0 THEN 0.8
                ELSE 0.0 END DESC, h.header) AS rn
  FROM attrs a CROSS JOIN headers h)
WHERE rn = 1 AND score >= 0.6
""")
def q_fuzzy_theta_join(spark, sf_dir):
    """T3 — attribute→header matching is a fuzzy theta-join: exact
    match 1.0, substring containment 0.8, argmax per attribute with a
    ≥ threshold gate (ref table_parser.py:135-173).  The small side is
    broadcast (as header lists are in the kernel)."""
    part = _t(spark, sf_dir, "part")
    # guard single-token names: Spark element_at yields NULL where
    # DuckDB split_part yields '' (and '' substring-matches everything)
    attrs = (part.select(F.lower(F.expr("try_element_at(split(p_name, ' '), 2)"))
                         .alias("attr"))
             .filter(F.col("attr").isNotNull() & (F.length("attr") > 0))
             .distinct())
    headers = part.select(F.lower("p_name").alias("header")).distinct()
    joined = attrs.crossJoin(F.broadcast(headers))
    score = (F.when(F.col("attr") == F.col("header"), 1.0)
              .when(F.expr("position(attr IN header) > 0")
                    | F.expr("position(header IN attr) > 0"), 0.8)
              .otherwise(0.0))
    scored = joined.select("attr", "header", score.alias("score"))
    w = Window.partitionBy("attr").orderBy(F.col("score").desc(), F.col("header"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("score") >= 0.6))
            .select("attr", "header", "score"))


_SINGULARIZE_CASE = """
CASE
  WHEN {w} IN ('children','people','men','women','feet','teeth','mice','geese')
    THEN CASE {w} WHEN 'children' THEN 'child' WHEN 'people' THEN 'person'
                  WHEN 'men' THEN 'man' WHEN 'women' THEN 'woman'
                  WHEN 'feet' THEN 'foot' WHEN 'teeth' THEN 'tooth'
                  WHEN 'mice' THEN 'mouse' ELSE 'goose' END
  WHEN {w} LIKE '%ies' AND length({w}) > 3
    THEN substr({w}, 1, length({w}) - 3) || 'y'
  WHEN {w} LIKE '%ves' AND length({w}) > 3
    THEN substr({w}, 1, length({w}) - 3) || 'f'
  WHEN {w} LIKE '%ses' AND length({w}) > 3
    THEN substr({w}, 1, length({w}) - 2)
  WHEN {w} LIKE '%es' AND length({w}) > 2 THEN
    CASE WHEN {w} LIKE '%ches' OR {w} LIKE '%shes' OR {w} LIKE '%xes'
              OR {w} LIKE '%zes'
         THEN substr({w}, 1, length({w}) - 2)
         ELSE substr({w}, 1, length({w}) - 1) END
  WHEN {w} LIKE '%s' AND length({w}) > 1 THEN substr({w}, 1, length({w}) - 1)
  ELSE {w}
END
"""


@register("singularize_sql", f"""
SELECT p_partkey, first_tok,
       {_SINGULARIZE_CASE.format(w='first_tok')} AS singular
FROM (SELECT p_partkey, lower(split_part(p_name, ' ', 1)) AS first_tok FROM part)
""")
def q_singularize_sql(spark, sf_dir):
    """Q8 — singularization as a CASE chain (ref utils/noun.py:1-49),
    applied to the first token of part names."""
    base = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower(F.element_at(F.split("p_name", " "), 1)).alias("first_tok"))
    return base.withColumn(
        "singular", F.expr(_SINGULARIZE_CASE.format(w="first_tok")))


@register("stopword_strip_first_token", """
SELECT p_partkey,
       COALESCE(list_filter(string_split(lower(p_name), ' '),
                x -> x NOT IN ('the','a','an','of','and','with')
                     AND length(x) > 2)[1], '') AS entity_token
FROM part
""")
def q_stopword_strip(spark, sf_dir):
    """Q2/Q5 — stopword strip + first-meaningful-token entity fallback
    (ref rule_base_query_parser.py:100-139) via array higher-order fns."""
    expr = ("coalesce(filter(split(lower(p_name), ' '), "
            "x -> x NOT IN ('the','a','an','of','and','with') "
            "AND length(x) > 2)[0], '')")
    return (_t(spark, sf_dir, "part")
            .select("p_partkey", F.expr(expr).alias("entity_token")))


@register("entity_the_pattern", """
SELECT doc_id, regexp_extract(lower(text), 'the ([a-z0-9]+)', 1) AS the_entity
FROM documents
""")
def q_entity_the_pattern(spark, sf_dir):
    """Q3 — "the X" entity pattern via regexp_extract
    (ref rule_base_query_parser.py:119-123)."""
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.regexp_extract(F.lower("text"), "the ([a-z0-9]+)", 1)
                     .alias("the_entity")))


_POS_QUERIES = [
    ("q01", "Can you give me the book: name and price?"),
    ("q02", "Extract job title, location, salary, and company name from the listings"),
    ("q03", "Get the product name, price, and description"),
    ("q04", "Show me all the movie titles and ratings"),
    ("q05", "List book author, title, price and rating"),
    ("q06", "Find all companies with their revenue and employees"),
    ("q07", "Get customer information including names and addresses"),
    ("q08", "Extract vehicle details like model and year"),
    ("q09", "Get detailed product info with price"),
    ("q10", "Show available apartments with rent and size"),
    ("q11", "Find cheapest flights with airline and duration"),
]

# hand-derived from the reference ladder (rule_base_query_parser.py:
# 100-197 with nltk installed): entity + which tier resolved it
_POS_EXPECTED = {
    "q01": ("book", "the-pattern"),
    "q02": ("job", "pos-tagging"),
    "q03": ("product", "the-pattern"),
    "q04": ("movie", "the-pattern"),
    "q05": ("book", "pos-tagging"),
    "q06": ("company", "pos-tagging"),
    "q07": ("customer", "pos-tagging"),
    "q08": ("vehicle", "pos-tagging"),
    "q09": ("product", "pos-tagging"),
    "q10": ("apartment", "pos-tagging"),
    "q11": ("flight", "pos-tagging"),
}

_POS_ORACLE = ("SELECT qid,\n"
               + "  CASE qid "
               + " ".join(f"WHEN '{k}' THEN '{e}'"
                          for k, (e, _) in sorted(_POS_EXPECTED.items()))
               + " END AS entity,\n  CASE qid "
               + " ".join(f"WHEN '{k}' THEN '{a}'"
                          for k, (_, a) in sorted(_POS_EXPECTED.items()))
               + " END AS approach\n"
               + "FROM (SELECT unnest(["
               + ", ".join(f"'{k}'" for k, _ in _POS_QUERIES)
               + "]) AS qid)")


@register("pos_entity", _POS_ORACLE)
def q_pos_entity(spark, sf_dir):
    """Q4 — the POS-tagging entity tier (engine/postag.py), run through
    the REAL parser on executors over a fixed query set; the oracle is
    hand-derived from the reference ladder, so this pins the rebuilt
    tagger against independent expectations rather than a snapshot."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    df = spark.createDataFrame(_POS_QUERIES, ["qid", "query"])
    schema = StructType([StructField("qid", StringType()),
                         StructField("entity", StringType()),
                         StructField("approach", StringType())])

    def run(batches):
        from engine.query_parse import parse_query
        for batch in batches:
            parsed = [parse_query(q) for q in batch["query"]]
            yield pd.DataFrame({
                "qid": batch["qid"],
                "entity": [p.entity for p in parsed],
                "approach": [p.entity_approach for p in parsed]})

    return df.mapInPandas(run, schema=schema)


@register("count_message", """
SELECT o_custkey,
       'Found ' || COUNT(*) || CASE WHEN COUNT(*) > 1 THEN ' orders '
                                    ELSE ' order ' END || 'on this page'
         AS message
FROM orders GROUP BY o_custkey
""")
def q_count_message(spark, sf_dir):
    """O2 — "Found N <entity> on this page" with pluralization
    (ref intelligent_parser.py:190-197)."""
    return (_t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.concat(F.lit("Found "), F.count("*"),
                          F.when(F.count("*") > 1, F.lit(" orders "))
                           .otherwise(F.lit(" order ")),
                          F.lit("on this page")).alias("message")))
