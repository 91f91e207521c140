"""Deterministic synthetic transcript generator (FIXTURES.md §1/§3).

Generates the pipeline's input table — (conv_id, turn_idx, role, text,
tool, ts) — entirely with JVM-side expressions (``spark.range`` +
string/array builtins, no RNG, no Python UDF), so test/bench data
materializes at shuffle speed and scales to any row count.

Families (deterministic per (conv, turn)):

* ``general``  — repeated ``div.item`` cards with ``p.name``/``p.price``
  children (exercises G2 repeated-structure discovery, G5 scoring,
  G6 path-chain replay, G7 exact match);
* ``table``    — a ``<table>`` with a ``thead`` (T1-T6);
* ``json``     — an ``application/ld+json`` script with a ``book`` array
  (J1-J8 regex extraction path);
* ``prose``    — no markup (parse-failure / zero-result accounting and
  the no-markup fast path).

Every content value is derivable from (conv_id, turn_idx, item index)
by closed-form arithmetic, so tests can assert full ground truth
without goldens.  One designated skew conversation (``conv_00000000``)
carries ``skew_factor``× the normal turn count (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CANONICAL_QUERY = "Can you give me the book: name and price?"


def html_family_exprs(name_expr: str, price_expr: str, n_items: int = 3,
                      extra_expr: str = "''") -> dict:
    """Spark-SQL expression strings for the three markup families, all
    derived from ONE template so every generator (synth, bench, entry,
    analytics extract_* checks) stays in lockstep with the value
    formulas its oracle reconstructs.

    ``name_expr``/``price_expr`` are SQL snippets that may reference
    the lambda variable ``i`` (item index 0..n_items-1);
    ``extra_expr`` is appended inside <body> (e.g. prose filler).
    """
    item = (f"concat('<div class=\"item\"><p class=\"name\">', {name_expr}, "
            f"'</p><p class=\"price\">£', {price_expr}, '</p></div>')")
    row = (f"concat('<tr><td>', {name_expr}, '</td><td>£', {price_expr}, "
           f"'</td></tr>')")
    jitem = (f"concat('{{\"name\": \"', {name_expr}, "
             f"'\", \"price\": \"£', {price_expr}, '\"}}')")
    seq = f"sequence(0, {n_items - 1})"
    return {
        "general": (
            f"concat('<html><body><div class=\"grid\">', "
            f"concat_ws('', transform({seq}, i -> {item})), "
            f"'</div><p>', {extra_expr}, '</p></body></html>')"),
        "table": (
            f"concat('<html><body><table><thead><tr><th>name</th>"
            f"<th>price</th></tr></thead><tbody>', "
            f"concat_ws('', transform({seq}, i -> {row})), "
            f"'</tbody></table><p>', {extra_expr}, '</p></body></html>')"),
        "json": (
            f"concat('<html><head><script type=\"application/ld+json\">', "
            f"'{{\"book\": [', concat_ws(', ', transform({seq}, i -> {jitem})), "
            f"']}}</script></head><body><p>', "
            f"coalesce(nullif({extra_expr}, ''), 'x'), '</p></body></html>')"),
    }

_ITEM_GENERAL = (
    "concat('<div class=\"item\"><p class=\"name\">Book ', cn, '-', turn_idx, "
    "'-', i, '</p><p class=\"price\">£', 1000 + (cn * 7 + turn_idx * 3 + i) % 9000, "
    "'</p></div>')"
)

_ROW_TABLE = (
    "concat('<tr><td>Book ', cn, '-', turn_idx, '-', i, '</td><td>£', "
    "1000 + (cn * 7 + turn_idx * 3 + i) % 9000, '</td></tr>')"
)

_ITEM_JSON = (
    "concat('{\"name\": \"Book ', cn, '-', turn_idx, '-', i, "
    "'\", \"price\": \"£', 1000 + (cn * 7 + turn_idx * 3 + i) % 9000, '\"}')"
)

_TEXT_EXPR = f"""
CASE
  WHEN role = 'user' THEN '{CANONICAL_QUERY}'
  WHEN family = 0 THEN concat(
    '<html><body><div class="listing">',
    concat_ws('', transform(sequence(0, 2), i -> {_ITEM_GENERAL})),
    '</div></body></html>')
  WHEN family = 1 THEN concat(
    '<html><body><table><thead><tr><th>name</th><th>price</th></tr></thead><tbody>',
    concat_ws('', transform(sequence(0, 2), i -> {_ROW_TABLE})),
    '</tbody></table></body></html>')
  WHEN family = 2 THEN concat(
    '<html><head><script type="application/ld+json">{{"book": [',
    concat_ws(', ', transform(sequence(0, 2), i -> {_ITEM_JSON})),
    ']}}</script></head><body><p>listing</p></body></html>')
  ELSE concat('plain prose turn with no markup, conversation ', cn,
              ' turn ', turn_idx, '.')
END
"""


def synth_transcripts(spark: SparkSession,
                      n_conversations: int = 100,
                      turns_per_conv: int = 12,
                      skew_factor: int = 1,
                      shuffled: bool = True,
                      partitions: int = 32) -> DataFrame:
    """Build the transcripts DataFrame.

    ``skew_factor`` > 1 gives conversation 0 that multiple of the
    normal turn count — the skew fixture for salting tests.
    """
    skew_turns = turns_per_conv * skew_factor
    normal_turns = (n_conversations - 1) * turns_per_conv
    total = skew_turns + normal_turns

    df = spark.range(0, total, 1, partitions)
    df = df.withColumn(
        "cn",
        F.when(F.col("id") < skew_turns, F.lit(0))
         .otherwise(((F.col("id") - skew_turns) / turns_per_conv).cast("long") + 1),
    ).withColumn(
        "turn_idx",
        F.when(F.col("id") < skew_turns, F.col("id").cast("int"))
         .otherwise(((F.col("id") - skew_turns) % turns_per_conv).cast("int")),
    )
    df = df.withColumn("conv_id", F.format_string("conv_%08d", F.col("cn")))
    df = df.withColumn(
        "role",
        F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                     (F.col("turn_idx") % 3) + 1),
    )
    # family is deterministic per (conv, turn); only non-user turns carry HTML
    df = df.withColumn("family", ((F.col("cn") * 13 + F.col("turn_idx") * 5) % 4).cast("int"))
    df = df.withColumn("text", F.expr(_TEXT_EXPR))
    df = df.withColumn(
        "tool",
        F.when((F.col("role") != "user") & (F.col("family") < 3), F.lit("browser"))
         .otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn(
        "ts",
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,turn_idx,0)"),
    )
    out = df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    if shuffled:
        # write rows out of order so the ordering window does real work
        out = out.repartition(partitions, F.expr("pmod(hash(conv_id, turn_idx), 1024)"))
    return out


def expected_records(spark: SparkSession,
                     n_conversations: int = 100,
                     turns_per_conv: int = 12,
                     skew_factor: int = 1) -> DataFrame:
    """Ground-truth (conv_id, turn_idx, name, price) rows the extraction
    kernel must produce for every markup-bearing synthetic turn."""
    base = synth_transcripts(spark, n_conversations, turns_per_conv,
                             skew_factor, shuffled=False)
    base = base.withColumn("cn", F.regexp_extract("conv_id", r"(\d+)", 1).cast("long"))
    base = base.withColumn("family", ((F.col("cn") * 13 + F.col("turn_idx") * 5) % 4).cast("int"))
    content = base.filter((F.col("role") != "user") & (F.col("family") < 3))
    items = content.select(
        "conv_id", "turn_idx", "cn",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
    )
    return items.select(
        "conv_id", "turn_idx",
        F.concat(F.lit("Book "), F.col("cn"), F.lit("-"), F.col("turn_idx"),
                 F.lit("-"), F.col("i")).alias("name"),
        F.concat(F.lit("£"),
                 (F.lit(1000) + (F.col("cn") * 7 + F.col("turn_idx") * 3 + F.col("i")) % 9000)
                 .cast("long")).alias("price"),
    )
