"""JVM prose fast path must be output-equivalent to the kernel path."""

from pyspark.sql import functions as F

from engine.extract import extract_turns
from engine.synth import CANONICAL_QUERY, synth_transcripts


def _canon(df):
    return (df.select("conv_id", "turn_idx", "role", "entity", "results",
                      "n_results", "message", "strategy", "status",
                      "text_nbytes")
            .orderBy("conv_id", "turn_idx").collect())


def test_jvm_fast_path_equivalent(spark):
    df = synth_transcripts(spark, n_conversations=15, turns_per_conv=8)
    fast = _canon(extract_turns(df, CANONICAL_QUERY, jvm_prose_fast_path=True))
    slow = _canon(extract_turns(df, CANONICAL_QUERY, jvm_prose_fast_path=False))
    assert fast == slow


def test_fast_path_handles_null_text(spark):
    df = spark.createDataFrame(
        [("c", 0, "assistant", None), ("c", 1, "user", "plain prose")],
        "conv_id string, turn_idx int, role string, text string")
    rows = {r.turn_idx: r for r in
            extract_turns(df, CANONICAL_QUERY).collect()}
    assert rows[0].status == "no_results" and rows[0].text_nbytes == 0
    assert rows[1].status == "no_results" and rows[1].text_nbytes == 11


def test_fast_path_row_count_preserved(spark):
    df = synth_transcripts(spark, n_conversations=10, turns_per_conv=6)
    out = extract_turns(df, CANONICAL_QUERY)
    assert out.count() == df.count()
    assert out.filter(F.col("strategy") == "general").count() > 0
