"""Spark extraction operator tests: ground-truth equality, fast-path
equivalence, ordering."""

from pyspark.sql import functions as F

from engine.extract import extract_turns
from engine.synth import CANONICAL_QUERY, expected_records, synth_transcripts


def _exploded(res):
    return (res.select("conv_id", "turn_idx", F.explode("results").alias("r"))
               .select("conv_id", "turn_idx",
                       F.col("r")["name"].alias("name"),
                       F.col("r")["price"].alias("price")))


def test_extraction_matches_ground_truth(spark):
    df = synth_transcripts(spark, n_conversations=20, turns_per_conv=6)
    res = extract_turns(df, CANONICAL_QUERY)
    got = _exploded(res)
    exp = expected_records(spark, 20, 6)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_one_output_row_per_turn(spark):
    df = synth_transcripts(spark, n_conversations=10, turns_per_conv=6)
    res = extract_turns(df, CANONICAL_QUERY)
    assert res.count() == df.count()
    assert res.select("conv_id", "turn_idx").distinct().count() == df.count()


def test_strategies_cover_all_families(spark):
    df = synth_transcripts(spark, n_conversations=30, turns_per_conv=9)
    res = extract_turns(df, CANONICAL_QUERY)
    strategies = {r.strategy for r in res.select("strategy").distinct().collect()}
    assert {"json_script", "table", "general"} <= strategies


def test_fast_path_equals_full_parse_on_prose(spark):
    """A markup-free turn must produce the exact envelope the full
    ladder yields for element-free text."""
    from engine.parser import extract_turn
    from engine.query_parse import parse_query_hybrid

    parsed = parse_query_hybrid(CANONICAL_QUERY)
    full = extract_turn("just prose, nothing else.", parsed)
    assert full.strategy == "general" and full.status == "no_results"
    assert full.message == "Found 0 book on this page"

    rows = (extract_turns(
        spark.createDataFrame(
            [("c", 0, "assistant", "just prose, nothing else.")],
            "conv_id string, turn_idx int, role string, text string"),
        CANONICAL_QUERY).collect())
    assert rows[0].strategy == "general"
    assert rows[0].status == "no_results"
    assert rows[0].message == "Found 0 book on this page"
    assert rows[0].results == []


def test_entityless_query_crash_quirk_envelope(spark):
    """Entity-less queries hit the reference's bare-None unpack crash
    (rule_base_query_parser.py:118,139) and surface as the generic
    parsing-error envelope (intelligent_parser.py:182-188) — carried
    verbatim, stamped JVM-side without shipping the corpus through
    Python."""
    df = synth_transcripts(spark, n_conversations=5, turns_per_conv=3)
    res = extract_turns(df, "the")
    rows = res.select("status", "message").distinct().collect()
    assert [(r.status, r.message) for r in rows] == [
        ("parse_error",
         "Parsing error: cannot unpack non-iterable NoneType object")]


def test_bad_query_envelope(spark):
    """Entity found but zero attributes → the reference's CLEAN
    cannot-extract branch (intelligent_parser.py:140-144)."""
    df = synth_transcripts(spark, n_conversations=5, turns_per_conv=3)
    res = extract_turns(df, "get the book")
    rows = res.select("status", "message").distinct().collect()
    assert [(r.status, r.message) for r in rows] == [
        ("bad_query", "Could not extract entity and attributes from query")]


def test_null_text_handled(spark):
    df = spark.createDataFrame(
        [("c", 0, "assistant", None)],
        "conv_id string, turn_idx int, role string, text string")
    row = extract_turns(df, CANONICAL_QUERY).collect()[0]
    assert row.status == "no_results" and row.text_nbytes == 0


def test_ordering_window_restores_turn_order(spark):
    from pyspark.sql import Window

    df = synth_transcripts(spark, n_conversations=8, turns_per_conv=6,
                           shuffled=True)
    res = extract_turns(df, CANONICAL_QUERY)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = res.withColumn("turn_seq", F.row_number().over(w))
    bad = seq.filter(F.col("turn_seq") != F.col("turn_idx") + 1).count()
    assert bad == 0
