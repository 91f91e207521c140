"""Round-4 training-data operators: Gopher repetition signals,
benchmark decontamination, span-level exact dedup — semantics pinned
on constructed inputs (the driver oracle covers the testdata corpus)."""

from pyspark.sql import functions as F

from engine.queries import _REGISTRY
import engine.analytics  # noqa: F401

SF = "/root/testdata/sf0.001"


def test_gopher_repetition_flags_repeated_text(spark, tmp_path):
    """A document that is one phrase repeated must score near 1.0 on
    both signals; a diverse document must score near 0."""
    rows = [
        (1, " ".join(["spam phrase here"] * 20)),          # 60 tokens
        (2, " ".join(f"w{i}" for i in range(60))),          # all distinct
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(path)
    # the registered query reads {sf_dir}/documents.parquet
    import os
    os.rename(path, str(tmp_path / "documents.parquet"))
    fn, _ = _REGISTRY["gopher_repetition"]
    got = {r.doc_id: r for r in fn(spark, str(tmp_path)).collect()}

    spammy, diverse = got[1], got[2]
    assert spammy.n_tokens == 60 and diverse.n_tokens == 60
    # 58 3-grams, only 3 distinct (cyclic repeats of the 3-word phrase)
    assert spammy.frac_dup_3gram > 0.9
    assert diverse.frac_dup_3gram == 0.0
    # "spam phrase" / "phrase here" / "here spam" each ~1/3 of bigrams
    assert spammy.top_bigram_share > 0.3
    assert diverse.top_bigram_share < 0.05


def test_decontaminate_flags_planted_benchmark_overlap(spark):
    """Every (doc_id % 10 == 3) document carries benchmark doc 0's
    opening 13-gram by construction; nothing else in the word-soup
    corpus collides.  sf0.001 has 500 docs → 50 planted."""
    fn, _ = _REGISTRY["decontaminate_ngram"]
    got = {r.doc_id: r.n_contaminated_ngrams
           for r in fn(spark, SF).collect()}
    planted = {d for d in range(500) if d % 10 == 3 and d % 97 != 0}
    assert planted <= set(got)          # every plant is flagged
    assert all(got[d] >= 1 for d in planted)
    # the sf0.001 word-soup vocabulary is tiny, so a couple of NATURAL
    # 13-gram collisions with the benchmark slice are real
    # contamination, not noise — but they stay rare
    assert len(set(got) - planted) <= 5
    assert all(d % 97 != 0 for d in got)  # benchmark docs never flagged


def test_span_dedup_counts_first_occurrence_semantics(spark, tmp_path):
    """Doc 1 contributes the first occurrence of a 20-token span; doc 2
    repeats that span twice plus one unique span; within-doc repeats
    also count as dups (only the global first occurrence is kept)."""
    span_a = " ".join(f"a{i}" for i in range(20))
    span_b = " ".join(f"b{i}" for i in range(20))
    rows = [
        (1, span_a),                                   # 1 span, keeper
        (2, " ".join([span_a, span_b, span_a])),       # dup, keep, dup
    ]
    import os
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))
    fn, _ = _REGISTRY["dedup_span_exact"]
    got = {r.doc_id: r for r in fn(spark, str(tmp_path)).collect()}
    assert got[1].n_spans == 1 and got[1].n_dup_spans == 0
    assert got[2].n_spans == 3 and got[2].n_dup_spans == 2
