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


def test_substring_dedup_catches_straddling_repeat(spark, tmp_path):
    """VERDICT r5 item 4's motivating case: a 25-token run shared by
    two documents at DIFFERENT, grid-misaligned offsets.  The fixed
    non-overlapping 20-token windows of dedup_span_exact see no
    duplicate at all; dedup_substring must report exactly the maximal
    25-token span in each document, at its true offset."""
    import os

    shared = [f"s{i}" for i in range(25)]
    doc1 = [f"u{i}" for i in range(10)] + shared + ["x1", "x2", "x3",
                                                   "x4", "x5"]
    doc2 = [f"v{i}" for i in range(3)] + shared + [f"w{i}"
                                                   for i in range(12)]
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, " ".join(doc1)), (2, " ".join(doc2))],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    fixed_fn, _ = _REGISTRY["dedup_span_exact"]
    fixed = {r.doc_id: r for r in fixed_fn(spark, str(tmp_path)).collect()}
    assert fixed[1].n_dup_spans == 0 and fixed[2].n_dup_spans == 0

    fn, _ = _REGISTRY["dedup_substring"]
    got = sorted(tuple(r) for r in fn(spark, str(tmp_path)).collect())
    assert got == [(1, 10, 25), (2, 3, 25)]


def test_substring_dedup_merges_and_self_repeats(spark, tmp_path):
    """Within-document self-repeats count (a doc repeating its own
    20-token block reports the covering span), and two nearby repeats
    whose coverage overlaps merge into ONE maximal span."""
    import os

    block = [f"b{i}" for i in range(20)]
    # doc 1: block at 0 and again at 25 (gap 5 unique tokens):
    # coverage [0,19] and [25,44] do not touch (gap 25 > 20) → two
    # spans; doc 2 carries the block once (cross-doc dup evidence)
    doc1 = block + [f"g{i}" for i in range(5)] + block
    doc2 = [f"h{i}" for i in range(7)] + block
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, " ".join(doc1)), (2, " ".join(doc2))],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    fn, _ = _REGISTRY["dedup_substring"]
    got = sorted(tuple(r) for r in fn(spark, str(tmp_path)).collect())
    assert got == [(1, 0, 20), (1, 25, 20), (2, 7, 20)]

    # touching coverage merges: the block twice back-to-back is
    # duplicated windows at starts 0 and 20 (gap == L) → ONE 40-token
    # covered span, not two
    doc3 = block + block
    doc4 = [f"r{i}" for i in range(4)] + block
    path2 = str(tmp_path / "m" / "docs")
    os.makedirs(str(tmp_path / "m"), exist_ok=True)
    spark.createDataFrame(
        [(3, " ".join(doc3)), (4, " ".join(doc4))],
        "doc_id long, text string").write.parquet(path2)
    os.rename(path2, str(tmp_path / "m" / "documents.parquet"))
    got2 = sorted(tuple(r) for r in fn(spark, str(tmp_path / "m")).collect())
    assert got2 == [(3, 0, 40), (4, 4, 20)]


def test_substring_cut_keeps_canonical_occurrence(spark, tmp_path):
    """The rewrite action: every duplicated window's global-first
    occurrence survives intact, every other occurrence's positions are
    cut; unaffected docs pass through with n_cut = 0 and their own
    text hash.  Re-running span detection on the rebuilt corpus finds
    nothing (each duplicated substring now exists exactly once)."""
    import hashlib
    import os

    shared = [f"s{i}" for i in range(25)]
    doc1 = [f"u{i}" for i in range(10)] + shared + ["x1", "x2", "x3",
                                                   "x4", "x5"]
    doc2 = [f"v{i}" for i in range(3)] + shared + [f"w{i}"
                                                   for i in range(12)]
    doc3 = [f"z{i}" for i in range(22)]           # no dups, len >= L
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, " ".join(doc1)), (2, " ".join(doc2)), (3, " ".join(doc3))],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    fn, _ = _REGISTRY["dedup_substring_cut"]
    got = {r.doc_id: r for r in fn(spark, str(tmp_path)).collect()}

    # doc 1 holds the canonical occurrence: untouched
    assert got[1].n_cut == 0 and got[1].n_tokens == 40
    assert got[1].text_md5 == hashlib.md5(
        " ".join(doc1).encode()).hexdigest()
    # doc 2's copy is cut position-wise (the whole 25-token run)
    assert got[2].n_cut == 25
    rebuilt2 = " ".join(doc2[:3] + doc2[28:])
    assert got[2].text_md5 == hashlib.md5(rebuilt2.encode()).hexdigest()
    # bystander doc is untouched
    assert got[3].n_cut == 0
    assert got[3].text_md5 == hashlib.md5(
        " ".join(doc3).encode()).hexdigest()

    # Lee et al. fixed point: the rebuilt corpus has no >=L repeat left
    path2 = str(tmp_path / "r" / "docs")
    os.makedirs(str(tmp_path / "r"), exist_ok=True)
    spark.createDataFrame(
        [(1, " ".join(doc1)), (2, rebuilt2), (3, " ".join(doc3))],
        "doc_id long, text string").write.parquet(path2)
    os.rename(path2, str(tmp_path / "r" / "documents.parquet"))
    spans_fn, _ = _REGISTRY["dedup_substring"]
    assert spans_fn(spark, str(tmp_path / "r")).count() == 0

    # within-doc self repeat: the doc's own later copy is cut too
    block = [f"b{i}" for i in range(20)]
    doc4 = block + block
    doc5 = [f"r{i}" for i in range(4)] + block
    path3 = str(tmp_path / "s" / "docs")
    os.makedirs(str(tmp_path / "s"), exist_ok=True)
    spark.createDataFrame(
        [(4, " ".join(doc4)), (5, " ".join(doc5))],
        "doc_id long, text string").write.parquet(path3)
    os.rename(path3, str(tmp_path / "s" / "documents.parquet"))
    got2 = {r.doc_id: r for r in fn(spark, str(tmp_path / "s")).collect()}
    assert got2[4].n_cut == 20          # second block occurrence
    assert got2[4].text_md5 == hashlib.md5(
        " ".join(block).encode()).hexdigest()
    assert got2[5].n_cut == 20          # its copy loses the block
    assert got2[5].text_md5 == hashlib.md5(
        "r0 r1 r2 r3".encode()).hexdigest()


def test_substring_cut_preserves_untouched_bytes(spark, tmp_path):
    """VERDICT r6 item 1a: a document the cut did not touch
    (n_cut = 0) must come back BYTE-IDENTICAL — mixed case, run-of-
    space and all — not as the lowercased token join.  Only the
    touched doc pays the normalization (documented residual)."""
    import hashlib
    import os

    from engine.analytics import substring_cut_rewrite

    shared = [f"s{i}" for i in range(25)]
    # keeper doc: mixed case + double spaces, contains the canonical
    # occurrence of the shared run (global-min doc_id)
    doc1 = ("Upper CASE  prefix " + " ".join(shared)
            + "  Trailing  MiXeD tail x1 x2 x3")
    # untouched bystander: no duplicated window, mixed case
    doc2 = "Nothing  Duplicated Here " + " ".join(
        f"Z{i}" for i in range(22))
    # the copy that gets cut
    doc3 = "v0 v1 v2 " + " ".join(shared) + " w0 w1 w2 w3"
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3)],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in substring_cut_rewrite(docs).collect()}

    assert got[1].n_cut == 0 and got[1].text == doc1   # byte-identical
    assert got[2].n_cut == 0 and got[2].text == doc2   # byte-identical
    assert got[3].n_cut == 25                          # copy is cut
    assert got[3].text == "v0 v1 v2 w0 w1 w2 w3"       # normalized join

    # the driver-checkable md5 form agrees: untouched docs hash their
    # ORIGINAL bytes
    fn, _ = _REGISTRY["dedup_substring_cut"]
    md5s = {r.doc_id: r.text_md5
            for r in fn(spark, str(tmp_path)).collect()}
    assert md5s[1] == hashlib.md5(doc1.encode()).hexdigest()
    assert md5s[2] == hashlib.md5(doc2.encode()).hexdigest()


def test_substring_cut_bytes_preserves_original_chars(spark, tmp_path):
    """VERDICT r6 item 1 stretch: the byte-offset-preserving rewrite
    cuts the duplicated tokens out of the ORIGINAL character stream —
    mixed case, double spaces and punctuation spacing all survive in a
    TOUCHED document; only the duplicate's own characters vanish
    (leaving their inter-token whitespace)."""
    import os

    from engine.analytics import substring_cut_bytes

    shared = " ".join(f"s{i}" for i in range(25))
    doc1 = "Keeper PREFIX " + shared + " Keeper-Tail x1"
    doc2 = "Mixed  CASE intro " + shared + " Outro,  Punct! end"
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, doc1), (2, doc2)],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in substring_cut_bytes(docs).collect()}

    # keeper untouched, byte-identical
    assert got[1].n_cut == 0 and got[1].byte_exact
    assert got[1].text == doc1
    # the copy loses EXACTLY the 25 shared tokens' characters; the 24
    # inter-token spaces remain, everything else is original bytes
    assert got[2].n_cut == 25 and got[2].byte_exact
    assert got[2].text == "Mixed  CASE intro " + " " * 24 \
        + " Outro,  Punct! end"


def test_substring_cut_bytes_falls_back_on_expanding_lowercase(
        spark, tmp_path):
    """The honest boundary: a TOUCHED document whose lowercasing is
    not length-preserving (Turkish dotted capital I expands to two
    code points) cannot align char spans — it falls back to the
    normalized token join and reports byte_exact = false.  An
    UNTOUCHED doc with the same character is emitted verbatim (the
    whole-text segment indexes no span)."""
    import os

    from engine.analytics import substring_cut_bytes

    shared = " ".join(f"s{i}" for i in range(25))
    assert len("İ".lower()) == 2          # the expansion under test
    doc1 = "keeper " + shared + " tail"
    doc2 = "İstanbul intro " + shared + " outro"       # touched + İ
    doc3 = "İzmir only, nothing duplicated here at all"  # untouched + İ
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3)],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in substring_cut_bytes(docs).collect()}

    assert got[1].n_cut == 0 and got[1].byte_exact and got[1].text == doc1
    assert got[2].n_cut == 25 and not got[2].byte_exact
    assert got[2].text == "i̇stanbul intro outro"   # normalized fallback
    assert got[3].n_cut == 0 and got[3].byte_exact
    assert got[3].text == doc3                     # verbatim


def test_decontaminate_cut_excises_quoted_benchmark_passage(spark):
    """Span-level decontamination: a document QUOTING a 20-token
    benchmark passage mid-text loses exactly those positions (byte-
    preserving — its own mixed-case context survives verbatim), the
    document itself SURVIVES (the gate would drop it whole), and
    clean documents pass byte-identically."""
    from engine.analytics import decontaminate_cut

    passage = " ".join(f"bench{i}" for i in range(20))
    bench = spark.createDataFrame(
        [(0, "Preamble words here " + passage + " closing remark")],
        "doc_id long, text string")
    doc1 = "My OWN Context  before " + passage + " and My  Tail x1"
    doc2 = "Totally Clean  document with " + " ".join(
        f"w{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string")

    got = {r.doc_id: r for r in decontaminate_cut(docs, bench).collect()}

    # every position of the quoted passage is covered by some
    # colliding 13-gram window -> all 20 tokens cut, no keeper
    assert got[1].n_cut == 20 and got[1].byte_exact
    assert passage not in got[1].text
    assert got[1].text == "My OWN Context  before " + " " * 19 \
        + " and My  Tail x1"
    # clean doc: byte-identical, zero cut
    assert got[2].n_cut == 0 and got[2].text == doc2


def test_substring_cut_bytes_boundary_spans(spark, tmp_path):
    """Byte-splice boundary cases: the cut span at the very START of a
    document (segment 0 is empty), at the very END (the trailing
    segment is empty), and a WHOLE-document duplicate (both empty —
    only the inter-token spaces survive)."""
    import os

    from engine.analytics import substring_cut_bytes

    shared = [f"s{i}" for i in range(25)]
    sj = " ".join(shared)
    doc1 = "Keeper Context " + sj + " Keeper Tail"   # canonical holder
    doc2 = sj + " After  The Run"                    # cut at START
    doc3 = "Before  The Run " + sj                   # cut at END
    doc4 = sj                                        # whole doc
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, doc4)],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in substring_cut_bytes(docs).collect()}

    assert got[1].n_cut == 0 and got[1].text == doc1
    assert got[2].n_cut == 25 and got[2].byte_exact
    assert got[2].text == " " * 24 + " After  The Run"
    assert got[3].n_cut == 25 and got[3].byte_exact
    assert got[3].text == "Before  The Run " + " " * 24
    assert got[4].n_cut == 25 and got[4].byte_exact
    assert got[4].text == " " * 24                   # only the gaps
