"""End-to-end corpus-cleaning job: stage counts reconcile, the
near-dup removal policy leaves NO detectable pair behind, and PII is
gone from the output."""

from pyspark.sql import functions as F

from engine.cleaning import run_cleaning_job
from engine.analytics import _hashed_shingles_df, _minhash_pairs

SF = "/root/testdata/sf0.001"


def test_cleaning_job_reconciles_and_is_pairfree(spark, tmp_path):
    out = str(tmp_path / "cleaned")
    m = run_cleaning_job(spark, f"{SF}/documents.parquet", out)

    # monotone stage funnel that reconciles with the written output
    assert m["rows_in"] == 500
    assert (m["rows_in"] >= m["after_quality_language"]
            >= m["after_exact_dedup"] >= m["after_neardup_removal"]
            == m["rows_out"] > 0)

    cleaned = spark.read.parquet(out)
    assert cleaned.count() == m["rows_out"]
    assert cleaned.select("doc_id").distinct().count() == m["rows_out"]

    # removal policy is a fixed point: re-running near-dup detection
    # on the survivors finds nothing (every confirmed pair's larger
    # member was dropped; detection is deterministic)
    leftover = _minhash_pairs(
        _hashed_shingles_df(cleaned.select("doc_id", "text"))).count()
    assert leftover == 0

    # no un-redacted emails survive the scrub
    email_like = cleaned.filter(
        F.col("text").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ).count()
    assert email_like == 0
    assert m["pii_redactions"] >= 0


def test_cleaning_job_metrics_are_one_pass(spark, tmp_path):
    """The write is the only action that executes the cleaning lineage:
    every stage boundary is persisted and the write materializes the
    caches, so the per-stage metric counts are InMemoryTableScan reads
    — the gates and the MinHash candidate join run exactly once
    (VERDICT r3 'What's wrong' 1)."""
    from engine.cleaning import cleaning_stages

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stages = cleaning_stages(docs)
    try:
        stages["cleaned"].write.mode("overwrite") \
            .parquet(str(tmp_path / "cleaned"))

        # the single write materialized every persisted boundary
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        cached = [i for i in infos if i.numCachedPartitions() > 0]
        assert len(cached) >= 3
        assert all(i.numCachedPartitions() == i.numPartitions()
                   for i in cached), "stage cache only partially built"

        # each metric count reads the cache — no parquet re-scan, so
        # the gates/minhash join cannot re-run
        for name in ("gated", "exact", "survivors"):
            plan = (stages[name]._jdf.queryExecution()
                    .executedPlan().toString())
            assert "InMemoryTableScan" in plan, name
            # the FileScan string still appears INSIDE the
            # InMemoryRelation printout (it describes the plan that
            # BUILT the cache) — the executed read must be the
            # InMemoryTableScan, i.e. come first in the tree
            assert (plan.index("InMemoryTableScan")
                    < plan.index("FileScan parquet")), \
                f"{name} metrics count would re-scan the input"
    finally:
        for name in ("gated", "exact", "survivors"):
            stages[name].unpersist()


def test_cleaning_job_gopher_gate_drops_repeated_boilerplate(spark, tmp_path):
    """A repeated-phrase spam document that PASSES the C4 gates (high
    stopword ratio, no punctuation, in-range length) must survive the
    default job but be dropped when the Gopher repetition gate is on;
    normal documents are untouched either way."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spam_text = " ".join(["the spam of spam and"] * 12)  # 60 tokens
    spam = spark.createDataFrame(
        [(900001, spam_text, "en", "synthetic", len(spam_text))],
        docs.schema)
    inp = str(tmp_path / "docs_spam")
    docs.unionAll(spam).write.parquet(inp)

    m_off = run_cleaning_job(spark, inp, str(tmp_path / "out_off"))
    m_on = run_cleaning_job(spark, inp, str(tmp_path / "out_on"),
                            gopher_gate=True)
    off_ids = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out_off"))
               .select("doc_id").collect()}
    on_ids = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out_on"))
              .select("doc_id").collect()}
    assert 900001 in off_ids          # C4 gates alone keep the spam
    assert 900001 not in on_ids       # the repetition gate drops it
    assert on_ids == off_ids - {900001}  # and ONLY it
    assert m_on["after_quality_language"] \
        == m_off["after_quality_language"] - 1


def test_cleaning_job_redacts_planted_pii(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    planted = docs.withColumn(
        "text", F.concat(F.col("text"),
                         F.lit(" reach me at someone@example.com")))
    inp = str(tmp_path / "docs_pii")
    planted.write.parquet(inp)
    out = str(tmp_path / "cleaned_pii")
    m = run_cleaning_job(spark, inp, out)
    assert m["pii_redactions"] >= m["rows_out"]  # every survivor had one
    cleaned = spark.read.parquet(out)
    assert cleaned.filter(F.col("text").contains("@example.com")).count() == 0
    assert cleaned.filter(F.col("text").contains("[EMAIL]")).count() \
        == m["rows_out"]


def test_cleaning_job_semantic_dedup_gate(spark, tmp_path):
    """VERDICT r5 item 6: SemDeDup as the batch job's fourth gate.
    Plant a 3-member semantic-duplicate component (near-identical
    embeddings, token-distinct texts) among documents that survive the
    token-level stages: the clusters policy keeps exactly the min
    doc_id, the funnel stays monotone and gains the
    after_semantic_dedup row, and the run strictly tightens vs the
    plain one."""
    base_out = str(tmp_path / "plain")
    base = run_cleaning_job(spark, f"{SF}/documents.parquet", base_out)
    surv = sorted(r.doc_id for r in
                  spark.read.parquet(base_out).select("doc_id").collect())
    a, b, c = surv[0], surv[1], surv[2]

    # embeddings: natural corpus everywhere except b and c, which get
    # near-identical copies of a's vector (cosine ~0.9999 >= tau) —
    # one transitive semantic component {a, b, c}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ea = emb.filter(F.col("vec_id") == a).first().embedding
    planted = spark.createDataFrame(
        [(b, [float(ea[0]) + 0.01] + [float(x) for x in ea[1:]]),
         (c, [float(ea[0]) + 0.02] + [float(x) for x in ea[1:]])],
        "vec_id long, embedding array<float>")
    emb_path = str(tmp_path / "emb")
    (emb.filter(~F.col("vec_id").isin([b, c])).select("vec_id", "embedding")
     .unionByName(planted)
     .write.mode("overwrite").parquet(emb_path))

    out = str(tmp_path / "sem")
    m = run_cleaning_job(spark, f"{SF}/documents.parquet", out,
                         embeddings_path=emb_path)
    # funnel: monotone through the new stage, reconciles with output
    assert (m["rows_in"] >= m["after_quality_language"]
            >= m["after_exact_dedup"] >= m["after_neardup_removal"]
            >= m["after_semantic_dedup"] == m["rows_out"] > 0)
    # token-level stages identical to the plain run; the semantic gate
    # drops exactly the two planted non-canonical members (natural
    # corpus tops out near cosine 0.51 — no collateral)
    assert m["after_neardup_removal"] == base["after_neardup_removal"]
    assert m["after_semantic_dedup"] == m["after_neardup_removal"] - 2
    assert m["rows_out"] == base["rows_out"] - 2

    kept = {r.doc_id for r in
            spark.read.parquet(out).select("doc_id").collect()}
    assert a in kept and b not in kept and c not in kept


def test_semantic_dedup_removal_policies(spark):
    """Unit: clusters keeps one per component (min id); pairwise drops
    every closer-to-centroid pair member; docs without embeddings pass
    through; unknown policy fails loudly."""
    import pytest

    from engine.cleaning import semantic_dedup_removal

    from engine.analytics import _lsh_embeddings

    # natural corpus (so the k-means cells are populated — a 3-vector
    # frame would give every vector its own cell and no same-cell
    # pairs) + a planted transitive component {3, 601, 602}
    base = _lsh_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")) \
        .select("vec_id", "e")
    e3 = [float(x) for x in base.filter(F.col("vec_id") == 3).first().e]
    planted = spark.createDataFrame(
        [(601, [e3[0] + 0.01] + e3[1:]),
         (602, [e3[0] + 0.02] + e3[1:])],
        "vec_id long, e array<double>")
    emb_df = base.unionByName(planted)
    docs = (spark.range(500).select(F.col("id").alias("doc_id"))
            .unionByName(spark.createDataFrame(
                [(601,), (602,), (900,)], "doc_id long"))
            .withColumn("text", F.concat(F.lit("doc body "),
                                         F.col("doc_id"))))

    kept_cl = {r.doc_id for r in
               semantic_dedup_removal(docs, emb_df, "clusters").collect()}
    # one survivor per component, min doc_id: 3 stays, 601/602 drop;
    # doc 900 (no embedding) passes through
    assert 3 in kept_cl and 900 in kept_cl
    assert 601 not in kept_cl and 602 not in kept_cl
    # no natural-corpus collateral (max natural cosine ~0.51 < tau)
    assert len(kept_cl) == docs.count() - 2

    kept_pw = {r.doc_id for r in
               semantic_dedup_removal(docs, emb_df, "pairwise").collect()}
    # complete pair graph on {3, 601, 602}: exactly one member (the
    # farthest from its cell centroid) survives
    assert 900 in kept_pw
    assert len({3, 601, 602} & kept_pw) == 1
    assert len(kept_pw) == docs.count() - 2

    with pytest.raises(ValueError):
        semantic_dedup_removal(docs, emb_df, "nope")


def test_cleaning_job_substring_cut_stage(spark, tmp_path):
    """--substring-cut as a job stage: two gate-passing documents
    share a 25-token run (below the 0.2-Jaccard near-dup threshold,
    so both SURVIVE the dedup stages); the rewrite cuts the run from
    the non-canonical doc only, drops no documents, and reports the
    cut size in the metrics."""
    import os

    shared = ("the quick brown fox jumps over the lazy dog while the "
              "amber sun settles on the quiet valley and the winding "
              "river flows gently north").split()
    assert len(shared) == 25

    def filler(prefix, n):
        out = []
        for i in range(n):
            out.append(f"{prefix}{i}")
            if i % 5 == 4:
                out.append("the")
        return out

    # the keeper doc is MIXED-CASE with a double space: n_cut = 0
    # survivors must come back byte-identical (VERDICT r6 item 1a),
    # and case must not break the (lowercased-key) duplicate match
    doc_a = filler("Alpha", 35) + shared + filler("Omega", 30)
    text_a = " ".join(doc_a).replace("Alpha1 ", "Alpha1  ", 1)
    doc_b = filler("beta", 30) + shared + filler("gamma", 35)
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, text_a), (2, " ".join(doc_b))],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    out = str(tmp_path / "cleaned")
    m = run_cleaning_job(spark, str(tmp_path / "documents.parquet"),
                         out, substring_cut=True)
    assert m["rows_in"] == m["rows_out"] == 2   # rewrite, not a gate
    # 26, not 25: both fillers end with a stopword "the", which butts
    # against shared[0] == "the" — the true maximal repeat is one
    # token longer than the planted run (the operator is maximal)
    assert m["substring_tokens_cut"] == 26

    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    joined_shared = " ".join(shared)
    assert joined_shared in rows[1].text        # canonical keeper
    assert joined_shared not in rows[2].text    # cut from the copy
    assert rows[2].n_tokens_cut == 26 and rows[1].n_tokens_cut == 0
    # the untouched keeper survives BYTE-IDENTICAL — mixed case and
    # the double space included (VERDICT r6 item 1a)
    assert rows[1].text == text_a


def test_cleaning_job_hashed_semantic_catches_permuted_copy(spark, tmp_path):
    """--semantic-dedup-hashed: a PERMUTED copy of a document (same
    token multiset, different order) passes exact dedup (different
    bytes) AND shingle MinHash (different 3-grams), but its hashed
    TF-IDF embedding is identical up to normalization — the semantic
    gate drops it, keeping the original (min doc_id)."""
    base_out = str(tmp_path / "plain0")
    base = run_cleaning_job(spark, f"{SF}/documents.parquet", base_out)
    src = sorted(r.doc_id for r in
                 spark.read.parquet(base_out).select("doc_id").collect())[0]
    src_text = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.col("doc_id") == src).first().text
    permuted = " ".join(sorted(src_text.lower().split()))
    assert permuted != src_text.lower()

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inp = str(tmp_path / "docs_perm")
    docs.unionByName(spark.createDataFrame(
        [(900, permuted, "en", "synthetic", len(permuted))],
        docs.schema)).write.parquet(inp)

    # the permuted copy SURVIVES the token-level pipeline
    plain_out = str(tmp_path / "plain")
    m0 = run_cleaning_job(spark, inp, plain_out)
    plain_ids = {r.doc_id for r in
                 spark.read.parquet(plain_out).select("doc_id").collect()}
    assert 900 in plain_ids and src in plain_ids
    assert m0["rows_out"] == base["rows_out"] + 1

    # ... and the hashed semantic gate removes exactly it
    sem_out = str(tmp_path / "sem")
    m1 = run_cleaning_job(spark, inp, sem_out, semantic_hashed=True)
    sem_ids = {r.doc_id for r in
               spark.read.parquet(sem_out).select("doc_id").collect()}
    assert src in sem_ids and 900 not in sem_ids
    assert (m1["after_neardup_removal"]
            >= m1["after_semantic_dedup"] == m1["rows_out"])
    # at D=256 + idf the natural corpus tops out near cosine 0.93
    # (< tau 0.95) — the planted permutation is the only removal
    assert sem_ids == plain_ids - {900}


def test_cleaning_job_decontaminate_gate(spark, tmp_path):
    """--decontaminate: documents sharing any 13-gram with the eval
    frame are dropped (the acting form of decontaminate_ngram's
    flagging); a synthetic eval vocabulary guarantees zero natural
    collisions, so exactly the planted doc goes."""
    frag = " ".join(f"benchq{i}" for i in range(13))
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, f"the evaluation question reads {frag} and the answer "
             "must be given in full sentences by the candidate")],
        "doc_id long, text string").write.parquet(bench_path)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base_out = str(tmp_path / "plain")
    base = run_cleaning_job(spark, f"{SF}/documents.parquet", base_out)
    surv = sorted(r.doc_id for r in
                  spark.read.parquet(base_out).select("doc_id").collect())
    host = surv[0]
    host_text = docs.filter(F.col("doc_id") == host).first().text

    inp = str(tmp_path / "docs_con")
    docs.unionByName(spark.createDataFrame(
        [(901, host_text + " " + frag + " closing words the end",
          "en", "synthetic", 1)],
        docs.schema)).write.parquet(inp)

    out = str(tmp_path / "decon")
    m = run_cleaning_job(spark, inp, out,
                         decontaminate_path=bench_path)
    ids = {r.doc_id for r in
           spark.read.parquet(out).select("doc_id").collect()}
    assert 901 not in ids               # contaminated doc dropped
    # the host document itself is untouched... unless the near-dup
    # stage would have dropped one of (host, 901) anyway — with 901
    # gone at the GATE, the host survives exactly as in the plain run
    assert ids == {r.doc_id for r in
                   spark.read.parquet(base_out)
                   .select("doc_id").collect()}
    assert m["after_quality_language"] \
        == base["after_quality_language"]  # plant added then gated out


def test_cleaning_job_substring_cut_bytes_mode(spark, tmp_path):
    """--substring-cut --substring-mode bytes: the touched document
    keeps its ORIGINAL characters everywhere outside the cut span
    (case, double spaces), the cut leaves only its inter-token
    whitespace, and byte_exact lands in the output schema."""
    import os

    shared = ("the quick brown fox jumps over the lazy dog while the "
              "amber sun settles on the quiet valley and the winding "
              "river flows gently north").split()

    def filler(prefix, n):
        out = []
        for i in range(n):
            out.append(f"{prefix}{i}")
            if i % 5 == 4:
                out.append("the")
        return out

    doc_a = " ".join(filler("alpha", 35) + shared + filler("omega", 30))
    # the COPY is mixed-case with a double space before the shared run
    b_toks = filler("Beta", 30)
    doc_b = " ".join(b_toks) + "  " + " ".join(shared) + " " \
        + " ".join(filler("Gamma", 35))
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, doc_a), (2, doc_b)],
        "doc_id long, text string").write.parquet(path)
    os.rename(path, str(tmp_path / "documents.parquet"))

    out = str(tmp_path / "cleaned")
    m = run_cleaning_job(spark, str(tmp_path / "documents.parquet"),
                         out, substring_cut=True, substring_mode="bytes")
    assert m["rows_in"] == m["rows_out"] == 2
    # 26 tokens cut: filler's trailing stopword "the" + the 25 planted
    assert m["substring_tokens_cut"] == 26

    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert rows[1].n_tokens_cut == 0 and rows[1].byte_exact
    assert rows[1].text == doc_a                  # keeper verbatim
    assert rows[2].n_tokens_cut == 26 and rows[2].byte_exact
    # the copy: "Beta..." prefix minus its trailing " the", then the
    # double space + 25 inter-token spaces where the run stood, then
    # the original mixed-case tail
    expect_b = " ".join(b_toks[:-1]) + "  " + " " * 25 + " " \
        + " ".join(filler("Gamma", 35))
    assert rows[2].text == expect_b
    assert " ".join(shared) not in rows[2].text


def test_cleaning_job_lm_corpus_reference_gate(spark, tmp_path):
    """run_cleaning_job(model_gate='lm', lm_corpus_path=...): the
    reference-trained gate drops a 50% garble fraction that the
    self-trained gate waves through (the junk trains itself into the
    vocabulary).  Both corpora carry enough stopwords to clear the C4
    gate, so the model gate is the deciding stage."""
    import os

    # "the" every other token clears the C4 stopword ratio; the
    # non-stopword halves are disjoint clean/junk vocabularies
    clean_text = " ".join(
        f"the w{i % 8} of w{(i + 3) % 8}" for i in range(14))
    junk_text = " ".join(
        f"the zqj{i % 8} of zqj{(i + 5) % 8}" for i in range(14))
    rows = [(d, clean_text + f" w{d % 8}", "en", "synthetic",
             len(clean_text)) for d in range(50)] + \
           [(d, junk_text + f" zqj{d % 8}", "en", "synthetic",
             len(junk_text)) for d in range(100, 150)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    ref_path = str(tmp_path / "ref")
    docs.filter("doc_id < 50").select("doc_id", "text") \
        .write.parquet(ref_path)

    # the near-identical fixtures collapse in the dedup stages, so the
    # gate's verdict is read at the gated boundary
    # (after_quality_language counts AFTER the model gate); which side
    # was dropped is pinned id-exactly by the operator-level drift
    # test in test_lm_tfidf_shuffle.py
    m_self = run_cleaning_job(spark, inp, str(tmp_path / "out_self"),
                              model_gate="lm")
    m_ref = run_cleaning_job(spark, inp, str(tmp_path / "out_ref"),
                             model_gate="lm",
                             lm_corpus_path=ref_path)
    assert m_self["after_quality_language"] == 100   # junk passes
    assert m_ref["after_quality_language"] == 50     # junk gone
    # the reference-trained run's survivors are drawn from the clean
    # half only
    ref_ids = {r.doc_id for r in
               spark.read.parquet(str(tmp_path / "out_ref"))
               .select("doc_id").collect()}
    assert ref_ids and ref_ids <= set(range(50))


def test_cleaning_job_decontaminate_cut_mode(spark, tmp_path):
    """--decontaminate-mode cut: the contaminated document SURVIVES
    with exactly the quoted benchmark span excised byte-preservingly
    (its own mixed-case context intact); the funnel reports the token
    count and drops nothing; downstream dedup hashes the
    decontaminated text (the plant is no longer a near-dup of its
    host once the shared span is gone... it still is of the host's
    own text — so the plant is constructed with DISTINCT filler)."""
    frag = " ".join(f"benchq{i}" for i in range(20))
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, f"the evaluation question reads {frag} and the answer "
             "must be given in full sentences by the candidate")],
        "doc_id long, text string").write.parquet(bench_path)

    def filler(prefix, n):
        out = []
        for i in range(n):
            out.append(f"{prefix}{i}")
            if i % 5 == 4:
                out.append("the")
        return out

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plant_text = " ".join(filler("Quoter", 30)) + "  " + frag + " " \
        + " ".join(filler("After", 20))
    inp = str(tmp_path / "docs_con")
    docs.unionByName(spark.createDataFrame(
        [(901, plant_text, "en", "synthetic", 1)],
        docs.schema)).write.parquet(inp)

    out = str(tmp_path / "decon_cut")
    m = run_cleaning_job(spark, inp, out,
                         decontaminate_path=bench_path,
                         decontaminate_mode="cut")
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert 901 in rows                        # survives in cut mode
    assert m["decontaminated_tokens_cut"] == 20
    assert frag not in rows[901].text
    # byte-preserving: the mixed-case context and double space remain
    assert rows[901].text == " ".join(filler("Quoter", 30)) + "  " \
        + " " * 19 + " " + " ".join(filler("After", 20))
    assert rows[901].n_decontaminated_tokens == 20
    # nothing else touched: every other survivor reports 0
    assert all(r.n_decontaminated_tokens == 0
               for d, r in rows.items() if d != 901)


def test_cleaning_job_decon_cut_metric_counts_model_gate_drops(
        spark, tmp_path):
    """Self-review r7: decontaminated_tokens_cut must count cuts on
    docs a LATER model gate drops — the metric reads the pre-gate
    boundary, not the post-gate one."""
    import pytest

    frag = " ".join(f"benchq{i}" for i in range(20))
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, f"the evaluation question reads {frag} and the answer "
             "must be given in full sentences by the candidate")],
        "doc_id long, text string").write.parquet(bench_path)

    def filler(prefix, n):
        out = []
        for i in range(n):
            out.append(f"{prefix}{i}")
            if i % 5 == 4:
                out.append("the")
        return out

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plant_text = " ".join(filler("Quoter", 30)) + " " + frag + " " \
        + " ".join(filler("After", 20))
    inp = str(tmp_path / "docs_con")
    docs.unionByName(spark.createDataFrame(
        [(901, plant_text, "en", "synthetic", 1)],
        docs.schema)).write.parquet(inp)

    m = run_cleaning_job(spark, inp, str(tmp_path / "out"),
                         decontaminate_path=bench_path,
                         decontaminate_mode="cut",
                         model_gate="lm")
    # the plant's unique Quoter/After vocabulary scores terribly
    # against the corpus LM — whether or not the gate drops it, the
    # cut count must include its 20 excised tokens
    assert m["decontaminated_tokens_cut"] == 20

    # guard rails added with the review: an empty reference corpus
    # fails loudly instead of silently dropping everything...
    empty_ref = str(tmp_path / "empty_ref")
    spark.createDataFrame([], "doc_id long, text string") \
        .write.parquet(empty_ref)
    with pytest.raises(Exception, match="no tokens"):
        run_cleaning_job(spark, inp, str(tmp_path / "out2"),
                         model_gate="lm", lm_corpus_path=empty_ref)
    # ...and lm_corpus with the dsir gate (which has no reference
    # mode) is rejected instead of silently ignored
    ref = str(tmp_path / "ref")
    docs.select("doc_id", "text").limit(5).write.parquet(ref)
    with pytest.raises(Exception, match="dsir"):
        run_cleaning_job(spark, inp, str(tmp_path / "out3"),
                         model_gate="dsir", lm_corpus_path=ref)
