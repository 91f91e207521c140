"""End-to-end corpus-cleaning job: the training-data pass the
analytics operators exist for, chained into ONE pipeline —

    quality gates (C4 + language) → exact dedup → MinHash near-dup
    removal → [SemDeDup semantic dedup] → [ExactSubstr substring cut]
    → PII scrub → cleaned corpus + per-stage metrics.

Stage semantics are the driver-checked queries' semantics
(engine/analytics.py): the gates are the ``cleaning_pass`` gates, the
near-dup pairs are ``dedup_minhash_lsh``'s (3-gram shingles, 16
minhashes, 8 bands, exact-Jaccard ≥ 0.2 verify), and the scrub is
``pii_scrub``'s (with no planted PII — real redaction only).

Scale shape: gates and scrub are scan-fused projections; exact dedup
is one groupBy; near-dup removal is the banded candidate join plus an
ANTI-JOIN of the corpus against the larger-id members of confirmed
pairs — the removal set, not the corpus, is the join's build side.
Removal policy: a document is dropped iff it is the LARGER doc_id of
some confirmed pair, so re-running detection on the survivors finds
zero pairs (any surviving pair would contradict the removal —
pinned in tests/test_cleaning_job.py).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.analytics import (_C4_STOP_SQL, _LANG_SETS, _PII_EMAIL,
                              _PII_PHONE, _SPARK_TOKS,
                              _connected_components, _hashed_shingles_df,
                              _minhash_pairs, dsir_scores, lm2_scores,
                              lm_scores)


def quality_language_gate(docs: DataFrame) -> DataFrame:
    """C4-style keep gate + keep-English language vote (the
    ``cleaning_pass`` gates) as ONE fused filter."""
    stops = F.expr(f"size(filter({_SPARK_TOKS}, x -> x IN ({_C4_STOP_SQL})))")
    punct = F.expr("length(regexp_replace(text, '[^.,;:!?]', ''))")
    total = F.expr("greatest(length(text), 1)")
    ntok = F.expr(f"size({_SPARK_TOKS})")
    hits = {lang: F.expr(f"size(filter({_SPARK_TOKS}, x -> x IN "
                         f"({', '.join(repr(w) for w in words)})))")
            for lang, words in _LANG_SETS.items()}
    keep = ((stops >= 0.02 * ntok) & (punct <= 0.2 * total)
            & ntok.between(10, 100000)
            & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]))
    return docs.filter(keep)


def gopher_repetition_gate(docs: DataFrame,
                           max_dup_3gram: float = 0.3,
                           max_top_bigram: float = 0.2) -> DataFrame:
    """Gopher-style repetition gate (Rae et al. §A1.2; the driver
    query gopher_repetition carries the oracle for these signals):
    drop documents whose duplicate-3-gram fraction or top-bigram share
    flags them as repeated boilerplate/spam.

    Stays a PURE PROJECTION (the fused-gate shape): the 3-gram
    fraction is array HOFs, and the per-document top-bigram count is a
    longest-equal-run ``aggregate`` over the SORTED bigram array —
    row-local O(L log L), no explode, no shuffle (the driver query
    computes the same number via groupBy because its oracle needs the
    distributed shape; a gate wants the fused one).  Documents under 3
    tokens pass (the C4 length gate owns short-text policy)."""
    toks = F.expr(_SPARK_TOKS)
    tri = ("transform(sequence(1, size(t) - 2), i -> "
           "concat(element_at(t, i), ' ', element_at(t, i + 1), ' ', "
           "element_at(t, i + 2)))")
    big = ("transform(sequence(1, size(t) - 1), i -> "
           "concat(element_at(t, i), ' ', element_at(t, i + 1)))")
    # longest run of equal values in the sorted bigram list == the top
    # bigram's count; lambda-bind t (CollapseProject discipline)
    checks = f"""
      element_at(transform(array({_SPARK_TOKS}), t -> CASE
        WHEN size(t) < 3 THEN true
        ELSE (1.0 - size(array_distinct({tri})) / (size(t) - 2))
               <= {max_dup_3gram}
         AND aggregate(sort_array({big}),
               struct('' AS prev, 0L AS run, 0L AS best),
               (acc, x) -> struct(x,
                 IF(x = acc.prev, acc.run + 1, 1L),
                 greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1L))),
               acc -> acc.best) / (size(t) - 1) <= {max_top_bigram}
      END), 1)"""
    return docs.filter(F.expr(checks))


def model_quality_gate(docs: DataFrame, model: str,
                       lm_corpus: DataFrame = None) -> DataFrame:
    """Corpus-model quality gate — the r5 signals as job stages:

    ``model="lm"``: CCNet-style unigram-LM bits/token ceiling
    (lm_scores) — trained on ``lm_corpus`` when given (the CCNet
    clean-reference contract, VERDICT r6 item 5; self-training drifts
    toward the corpus's own junk at high junk fractions), else on the
    frame being gated (the original self-trained behavior).
    ``model="lm2"``: the interpolated bigram LM (lm2_scores; same
    ``lm_corpus`` contract) — catches bigram-breaking garble the
    unigram profile cannot see.
    ``model="dsir"``: DSIR target-vs-raw log-likelihood ratio > 0
    (dsir_scores).

    Unlike the fused projection gates these cost a model pass: lm adds
    a vocab groupBy + token-keyed join, dsir adds one conditional-sum
    groupBy + a BROADCAST of its fixed 4096-bucket model (the cheaper
    of the two at 100 TB).  The keep set joins back LEFT SEMI on
    doc_id, so gated columns pass through untouched."""
    if lm_corpus is not None:
        if model == "dsir":
            # silently ignoring the reference would invite the false
            # belief that DSIR trained on it (self-review r7) — the
            # dsir gate has no reference mode; fail loudly
            raise ValueError(
                "lm_corpus applies to the lm/lm2 gates only; the dsir "
                "gate is self-trained by construction")
        # an EMPTY (or token-less) reference would make every score
        # NULL and the gate silently drop the whole corpus — the same
        # loud-guard rule as the streaming semantic gate's
        # sem_embeddings_path (self-review r7).  limit(1) keeps the
        # check O(1).
        probe = (lm_corpus.select(F.expr(_SPARK_TOKS).alias("t"))
                 .filter(F.expr("size(t) >= 1")).limit(1).count())
        if probe == 0:
            raise ValueError(
                "lm_corpus yields no tokens — the reference-trained "
                "gate would score every document NULL and drop the "
                "entire corpus")
    if model == "lm":
        keeps = lm_scores(docs, lm_corpus=lm_corpus) \
            .filter(F.col("keep") == 1)
    elif model == "lm2":
        keeps = lm2_scores(docs, lm_corpus=lm_corpus) \
            .filter(F.col("keep") == 1)
    elif model == "dsir":
        # DSIR proper RESAMPLES by importance weight; as a hard gate
        # the absolute `ratio > 0` rule degenerates on small/odd
        # corpora (add-one smoothing can drag every score one side of
        # zero), so the gate keeps the at-or-above-corpus-mean half —
        # the deterministic thresholded analogue.  The mean comparison
        # is exact integer arithmetic (scores are 4dp -> micro-units
        # as longs; a >= mean(a)  <=>  a*n >= sum(a)), so the gate
        # cannot flip with partition layout the way an F.avg of
        # doubles can (the repo's micro-unit discipline).  >= not >
        # (ADVICE r5): on a degenerate corpus where every document
        # scores identically (all-identical docs, single hash-uniform
        # source) every score EQUALS the mean — strict > would drop
        # 100% of documents; >= keeps them all, the only sensible
        # gate outcome when the model cannot rank anything.
        scores = dsir_scores(docs).withColumn(
            "am", F.round(F.col("avg_logratio") * 10000.0, 0)
            .cast("long"))
        mu = scores.agg(F.sum("am").alias("sa"),
                        F.count("*").alias("n"))
        keeps = (scores.crossJoin(F.broadcast(mu))
                 .filter(F.col("am") * F.col("n") >= F.col("sa")))
    else:
        raise ValueError(f"unknown model gate: {model!r}")
    return docs.join(keeps.select("doc_id"), "doc_id", "left_semi")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact content hash (one shuffle)."""
    w_keep = (docs.groupBy(F.md5(F.col("text").cast("binary"))
                           .alias("content_hash"))
              .agg(F.min("doc_id").alias("doc_id")))
    return docs.join(w_keep, "doc_id", "left_semi")


def neardup_pairs(docs: DataFrame, sketch: str = "minhash") -> DataFrame:
    """Confirmed near-dup pairs (exact Jaccard ≥ 0.2 on 3-gram
    shingles) with a pluggable CANDIDATE GENERATOR:

    ``sketch="minhash"``: banded MinHash over the shingles — the
    recall-complete-at-θ generator for arbitrary overlap (catches
    e.g. a doc that contains another).

    ``sketch="simhash128"``: 32-bit-chunk buckets of the 128-bit
    SimHash (``_simhash128_band_candidates``) — candidates are pairs
    whose TOKEN-SET sketches agree on ≥1 chunk, i.e. near-IDENTICAL
    documents (small edits, boilerplate re-crawls: Hamming ≤ 3
    guaranteed, ≤ 6 best-effort).  Measured absolutely faster than
    MinHash banding and saturation-proof to ~10^9 docs (r4 decade
    table) — the default to prefer past ~10^6 docs when the dup mode
    is crawl re-copies.  Honest trade, not hidden: a true ≥0.2-Jaccard
    pair whose sketches differ widely (e.g. A vs A+B concatenation)
    is NOT a simhash candidate; both generators feed the SAME
    exact-Jaccard verify, so confirmed pairs are never false."""
    from engine.analytics import (_simhash128_band_candidates,
                                  _simhash128_chunks, _verify_jaccard)

    if sketch == "minhash":
        return _minhash_pairs(_hashed_shingles_df(docs))
    if sketch == "simhash128":
        cand = _simhash128_band_candidates(_simhash128_chunks(docs))
        # carry_n: the per-doc shingle count rides the verify base, so
        # the Jaccard denominator needs no sizes aggregation +
        # join-backs (r8 — each was a full extra shingle-pipeline
        # evaluation)
        return _verify_jaccard(cand,
                               _hashed_shingles_df(docs, carry_n=True))
    raise ValueError(f"unknown near-dup sketch: {sketch!r}")


def neardup_removal(docs: DataFrame, policy: str = "pairwise",
                    sketch: str = "minhash") -> DataFrame:
    """Drop near-duplicate documents (confirmed pairs per
    ``neardup_pairs(sketch)``).

    ``policy="pairwise"``: drop every document that is the larger-id
    member of some confirmed pair — a sound fixed point (survivors
    re-detect zero pairs) but it can keep MORE than one member of a
    transitive cluster (edges (1,3),(2,3) keep both 1 and 2 even
    though 1~3~2 is one cluster).

    ``policy="clusters"``: resolve transitive clusters with min-id
    label propagation (_connected_components) and keep exactly ONE
    document per cluster (the smallest doc_id) — the standard
    production dedup shape; an A~B~C chain collapses to a single
    survivor (tested in tests/test_cleaning_job.py)."""
    pairs = neardup_pairs(docs, sketch=sketch)
    if policy == "clusters":
        drop = (_connected_components(pairs)
                .filter(F.col("doc_id") != F.col("cluster_id"))
                .select("doc_id"))
    elif policy == "pairwise":
        drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    else:
        raise ValueError(f"unknown near-dup policy: {policy!r}")
    return docs.join(drop, "doc_id", "left_anti")


def semantic_dedup_removal(docs: DataFrame, emb: DataFrame,
                           policy: str = "clusters") -> DataFrame:
    """SemDeDup as a batch-job stage (VERDICT r5 item 6): drop
    semantic duplicates of ``docs`` using the embedding frame ``emb``
    (vec_id == doc_id, e: array<double> — the serving layout of
    engine/index.write_ann_index).  Embeddings are restricted to the
    documents still alive at this stage (left semi), so earlier gates
    never resurrect through the semantic pass, and documents WITHOUT
    an embedding pass through untouched (no embedding → no evidence).

    ``policy="clusters"`` (default — mirrors neardup_removal's
    clusters policy): semantic-duplicate components are resolved with
    the shared min-id connected components and exactly ONE document
    per component survives (the smallest doc_id — the same canonical
    keeper as token-level cluster dedup; within a single PAIR
    SemDeDup's farthest-from-centroid rule decides which side is the
    `removed_id`, but a transitive component needs one canonical
    survivor and the min-id rule keeps the two dedup families
    consistent).  ``policy="pairwise"`` is the paper's per-pair rule
    verbatim: drop every `removed_id` (closer-to-centroid member);
    like token pairwise it can keep >1 member of a chain.

    Scale shape: semdedup_pairs confines the quadratic inside k-means
    cells (k ∝ n at scale), the components table is duplicates-only,
    and the final drop is an anti-join with the small removal set as
    the build side — same as neardup_removal."""
    from engine.analytics import semdedup_pairs

    emb_alive = emb.join(docs.select(F.col("doc_id").alias("vec_id")),
                         "vec_id", "left_semi")
    pairs = semdedup_pairs(emb_alive)
    if policy == "clusters":
        drop = (_connected_components(
                    pairs.select(F.col("removed_id").alias("doc_a"),
                                 F.col("keeper_id").alias("doc_b")))
                .filter(F.col("doc_id") != F.col("cluster_id"))
                .select("doc_id"))
    elif policy == "pairwise":
        drop = pairs.select(F.col("removed_id").alias("doc_id")).distinct()
    else:
        raise ValueError(f"unknown semantic-dedup policy: {policy!r}")
    return docs.join(drop, "doc_id", "left_anti")


def substring_cut_stage(docs: DataFrame,
                        min_len: int = None,
                        cache_registry: list = None,
                        mode: str = "tokens") -> DataFrame:
    """ExactSubstr rewrite as a job stage (the Lee et al. action the
    span operators point at): every duplicated >= min_len-token
    substring occurrence is cut from the NORMALIZED token stream
    except its global-first keeper — no document is dropped, their
    text shrinks.  Adds ``n_tokens_cut`` so the job's metrics can
    report total tokens removed.  Columns other than ``text`` pass
    through; UNTOUCHED documents (n_tokens_cut = 0) keep their
    original text byte-identically (VERDICT r6 item 1a).  ``mode``
    picks what TOUCHED docs carry: "tokens" (default) emits the
    lowercased token join (the stream all dedup operators key on —
    documented in substring_cut_rewrite); "bytes" splices the cut
    spans out of the ORIGINAL character stream (substring_cut_bytes)
    and adds a ``byte_exact`` lineage column (false only for the rare
    expanding-lowercase rows that fell back to the token join)."""
    from engine.analytics import (_SUBSTR_L, substring_cut_bytes,
                                  substring_cut_rewrite)

    ml = min_len if min_len is not None else _SUBSTR_L
    keep_cols = [c for c in docs.columns if c != "text"]
    if mode == "bytes":
        rewritten = substring_cut_bytes(
            docs.select("doc_id", "text"), ml,
            cache_registry=cache_registry)
        return (docs.select(*keep_cols)
                .join(rewritten.select(
                    "doc_id", "text", "byte_exact",
                    F.col("n_cut").alias("n_tokens_cut")), "doc_id"))
    if mode != "tokens":
        raise ValueError(f"unknown substring-cut mode: {mode!r}")
    rewritten = substring_cut_rewrite(
        docs.select("doc_id", "text"), ml,
        cache_registry=cache_registry)
    return (docs.select(*keep_cols)
            .join(rewritten.select("doc_id", "text",
                                   F.col("n_cut").alias("n_tokens_cut")),
                  "doc_id"))


def pii_scrub_text(docs: DataFrame) -> DataFrame:
    """Redact emails/phones in place; adds n_redactions."""
    n_red = (F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL),
                                         F.lit(0)))
             + F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE),
                                           F.lit(0))))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "[EMAIL]"),
        _PII_PHONE, "[PHONE]")
    return docs.withColumn("n_redactions", n_red.cast("long")) \
               .withColumn("text", scrubbed)


def cleaning_stages(docs: DataFrame, neardup_policy: str = "pairwise",
                    gopher_gate: bool = False,
                    sketch: str = "minhash",
                    model_gate: str = None,
                    semantic_dedup: DataFrame = None,
                    semantic_policy: str = "clusters",
                    substring_cut: bool = False,
                    substring_mode: str = "tokens",
                    lm_corpus: DataFrame = None,
                    decontaminate: DataFrame = None,
                    decontaminate_mode: str = "drop") -> dict:
    """The job's stage DataFrames, each boundary PERSISTED.

    Every stage output is referenced more than once downstream (exact
    dedup reads the gated frame twice, near-dup removal reads the exact
    frame for bands/shingles/sizes/anti-join, and the metrics counts
    read every boundary), so without persistence each reference would
    re-execute the gates and the MinHash candidate join — at 100 TB
    each extra reference is a full corpus re-scan (VERDICT r3 "What's
    wrong" 1).  With the boundaries persisted, the single write action
    materializes every cache exactly once and the per-stage metric
    counts are cache reads (plan-asserted in tests/test_cleaning_job.py:
    the counts execute as InMemoryTableScan with no parquet scan)."""
    gated = quality_language_gate(docs)
    if gopher_gate:
        gated = gopher_repetition_gate(gated)
    if decontaminate is not None:
        if decontaminate_mode == "cut":
            # SURGICAL decontamination (decontaminate_cut): the
            # contaminated spans are excised byte-preservingly and the
            # document SURVIVES — it runs here, before any dedup, so
            # every downstream content hash / shingle / window is
            # computed over decontaminated text; adds the
            # n_decontaminated_tokens lineage column
            from engine.analytics import decontaminate_cut
            keep_cols = [c for c in gated.columns if c != "text"]
            rewritten = decontaminate_cut(
                gated.select("doc_id", "text"), decontaminate)
            gated = (gated.select(*keep_cols)
                     .join(rewritten.select(
                         "doc_id", "text",
                         F.col("byte_exact").alias("decon_byte_exact"),
                         F.col("n_cut")
                         .alias("n_decontaminated_tokens")), "doc_id"))
        elif decontaminate_mode == "drop":
            # benchmark decontamination as a gate (a drop is a drop):
            # documents sharing any 13-gram with the eval frame never
            # reach the dedup stages; its removals land inside the
            # after_quality_language funnel row
            from engine.analytics import decontaminate_gate
            gated = decontaminate_gate(gated, decontaminate)
        else:
            raise ValueError(
                f"unknown decontaminate mode: {decontaminate_mode!r}")
    if model_gate:
        # the decon-cut token metric must count cuts on docs the model
        # gate later DROPS too (self-review r7: summing the post-gate
        # boundary undercounts), so the pre-model-gate frame becomes
        # its own persisted boundary when both stages are active
        decon_frame = None
        if (decontaminate is not None and decontaminate_mode == "cut"):
            decon_frame = gated.persist()
        gated = model_quality_gate(gated, model_gate,
                                   lm_corpus=lm_corpus)
    gated = gated.persist()
    exact = exact_dedup(gated).persist()
    survivors = neardup_removal(exact, policy=neardup_policy,
                                sketch=sketch).persist()
    stages = {"gated": gated, "exact": exact, "survivors": survivors}
    if model_gate and decontaminate is not None \
            and decontaminate_mode == "cut":
        stages["_decon"] = decon_frame
    final = survivors
    if semantic_dedup is not None:
        # fourth gate: token-level near-dup first (cheap sketches
        # shrink the corpus), THEN the embedding pass over what's left
        final = semantic_dedup_removal(survivors, semantic_dedup,
                                       policy=semantic_policy).persist()
        stages["semantic"] = final
    if substring_cut:
        # rewrite stage, not a gate: documents survive with duplicated
        # >=L-token substrings cut (keeper occurrence excepted); runs
        # after every document-dropping stage so keepers are chosen
        # among documents that actually ship.  The stage's internal
        # token cache is surfaced so the job can release it with the
        # stage boundaries (no leaked blocks across repeated jobs)
        caches: list = []
        final = substring_cut_stage(final, cache_registry=caches,
                                    mode=substring_mode).persist()
        stages["substring"] = final
        stages["_substring_caches"] = caches
    stages["cleaned"] = pii_scrub_text(final)
    return stages


def run_cleaning_job(spark: SparkSession, input_path: str,
                     output_path: str,
                     neardup_policy: str = "pairwise",
                     gopher_gate: bool = False,
                     sketch: str = "minhash",
                     model_gate: str = None,
                     embeddings_path: str = None,
                     semantic_policy: str = "clusters",
                     semantic_hashed: bool = False,
                     substring_cut: bool = False,
                     substring_mode: str = "tokens",
                     lm_corpus_path: str = None,
                     decontaminate_path: str = None,
                     decontaminate_mode: str = "drop") -> dict:
    """documents parquet in → cleaned corpus parquet out, one JSON-able
    metrics dict back (per-stage survivor counts reconcile the run the
    way the extraction pipeline's lineage rows do).

    ONE-PASS metrics: the write is the only action that executes the
    cleaning lineage — rows_out / pii_redactions ride it as an
    ``observe`` on the final frame, and the per-stage counts read the
    persisted stage boundaries (cleaning_stages) that the write already
    materialized.  rows_in is a zero-column parquet count (footer-cheap,
    touches no cleaning operator)."""
    from pyspark.sql import Observation

    t0 = time.time()
    docs = spark.read.parquet(input_path)
    emb = None
    if embeddings_path is not None:
        from engine.analytics import _lsh_embeddings
        emb = (_lsh_embeddings(spark.read.parquet(embeddings_path))
               .select("vec_id", "e"))
    elif semantic_hashed:
        # text-only corpora: hashed TF-IDF embeddings built from the
        # input frame itself (the idf model trains on the full input
        # corpus — the same train-on-the-frame contract as the lm
        # gates).  Catches token-multiset near-dups (permuted copies)
        # that exact dedup AND shingle MinHash both miss.
        from engine.analytics import doc_hashed_embeddings
        emb = doc_hashed_embeddings(docs)
    decon = (spark.read.parquet(decontaminate_path)
             if decontaminate_path is not None else None)
    lm_ref = (spark.read.parquet(lm_corpus_path)
              if lm_corpus_path is not None else None)
    stages = cleaning_stages(docs, neardup_policy=neardup_policy,
                             gopher_gate=gopher_gate, sketch=sketch,
                             model_gate=model_gate,
                             semantic_dedup=emb,
                             semantic_policy=semantic_policy,
                             substring_cut=substring_cut,
                             substring_mode=substring_mode,
                             lm_corpus=lm_ref,
                             decontaminate=decon,
                             decontaminate_mode=decontaminate_mode)
    obs = Observation()
    observations = [
        F.count(F.lit(1)).alias("rows_out"),
        F.coalesce(F.sum("n_redactions"), F.lit(0)).alias("pii_redactions")]
    if substring_cut:
        observations.append(
            F.coalesce(F.sum("n_tokens_cut"), F.lit(0))
            .alias("substring_tokens_cut"))
    cleaned = stages["cleaned"].observe(obs, *observations)
    cleaned.write.mode("overwrite").parquet(output_path)
    out_metrics = obs.get
    metrics = {
        "rows_in": docs.count(),
        "after_quality_language": stages["gated"].count(),
    }
    if decontaminate_path is not None and decontaminate_mode == "cut":
        # counts cuts on EVERY decontaminated doc, including ones a
        # later model gate drops: with a model gate active the
        # pre-gate frame is its own persisted boundary (_decon);
        # without one the gated boundary IS that frame
        decon_src = stages.get("_decon", stages["gated"])
        metrics["decontaminated_tokens_cut"] = int(
            decon_src.agg(F.coalesce(
                F.sum("n_decontaminated_tokens"), F.lit(0))).first()[0])
    metrics.update({
        "after_exact_dedup": stages["exact"].count(),
        "after_neardup_removal": stages["survivors"].count(),
    })
    if "semantic" in stages:
        metrics["after_semantic_dedup"] = stages["semantic"].count()
    metrics.update({
        "rows_out": int(out_metrics["rows_out"]),
        "pii_redactions": int(out_metrics["pii_redactions"]),
        "wall_sec": round(time.time() - t0, 3),
    })
    if substring_cut:
        metrics["substring_tokens_cut"] = int(
            out_metrics["substring_tokens_cut"])
    for name in ("gated", "exact", "survivors", "semantic", "substring",
                 "_decon"):
        if name in stages:
            stages[name].unpersist()
    for df in stages.get("_substring_caches", []):
        df.unpersist()
    return metrics
