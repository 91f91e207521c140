"""Matcher-enabled extraction through the real Spark operator (the
per-task matcher factory path)."""

from engine.extract import extract_turns
from engine.matcher import TokenSimilarityMatcher


def test_matcher_factory_through_spark(spark):
    # header has no substring relation to the attr 'price usd', but a
    # 2/3 word-Jaccard similarity — only the semantic tier matches it
    html = ("<table><thead><tr><th>Book Title</th><th>USD price total</th>"
            "</tr></thead><tbody><tr><td>T1</td><td>$9</td></tr></tbody>"
            "</table>")
    df = spark.createDataFrame(
        [("c", 0, "assistant", html)],
        "conv_id string, turn_idx int, role string, text string")

    query = "Get the book title and price usd"
    plain = extract_turns(df, query).collect()[0]
    assert "price usd" not in (plain.results[0] or {})

    sem = extract_turns(df, query,
                        matcher_factory=TokenSimilarityMatcher).collect()[0]
    assert sem.results[0]["title"] == "T1"
    assert sem.results[0]["price usd"] == "$9"
