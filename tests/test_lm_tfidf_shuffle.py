"""r5 tail operators: unigram-LM perplexity filter, TF-IDF top terms,
deterministic corpus shuffle — semantics plus the shuffle plan's scale
shape (the global rank must come from the two-level block scheme, not
a corpus-wide single-partition sort)."""

import hashlib
import re

import engine.analytics  # noqa: F401  (registers the queries)
from engine.queries import _REGISTRY

SF = "/root/testdata/sf0.001"


def test_lm_perplexity_filter_semantics(spark):
    fn, _ = _REGISTRY["lm_perplexity_filter"]
    rows = {r.doc_id: r for r in fn(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)

    # bits/token is positive and the keep gate actually splits
    keeps = {r.keep for r in rows.values()}
    assert all(r.bits_per_token > 0 for r in rows.values())
    assert keeps == {0, 1}
    assert all(r.keep == int(r.bits_per_token <= 4.95)
               for r in rows.values())

    # ground truth on the tiny corpus: recompute mean -log2 p(token)
    # from raw python counts and compare within quantization error
    # (per-token micro-bit rounding -> < 1e-5 on the mean)
    from collections import Counter
    import math
    tok_lists = {d.doc_id: [t for t in d.text.lower().split(" ") if t]
                 for d in docs}
    counts = Counter(t for toks in tok_lists.values() for t in toks)
    total = sum(counts.values())
    for doc_id, toks in tok_lists.items():
        expect = sum(math.log2(total / counts[t]) for t in toks) / len(toks)
        assert abs(rows[doc_id].bits_per_token - expect) < 5e-4, doc_id
        assert rows[doc_id].n_tokens == len(toks)


def test_tfidf_top_terms_ranking(spark):
    fn, _ = _REGISTRY["tfidf_top_terms"]
    out = fn(spark, SF).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(by_doc) == len(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # scores non-increasing; ties broken by term ascending
        for a, b in zip(rs, rs[1:]):
            assert (a.tfidf_micro, b.term) >= (b.tfidf_micro, a.term)

    # a term appearing in EVERY document has idf = ln(1) = 0 -> can
    # never outrank a term with positive idf and tf >= 1
    doc_toksets = [set(t for t in d.text.lower().split(" ") if t)
                   for d in docs]
    ubiquitous = set.intersection(*doc_toksets) if doc_toksets else set()
    for rs in by_doc.values():
        for r in rs:
            if r.term in ubiquitous:
                assert r.tfidf_micro == 0


def test_corpus_shuffle_matches_global_md5_rank_and_plan(spark):
    fn, _ = _REGISTRY["corpus_shuffle"]
    out = fn(spark, SF)
    got = {r.doc_id: r.pos for r in out.collect()}

    # ground truth: global rank of md5(doc_id) computed driver-side
    ids = [r.doc_id for r in
           spark.read.parquet(f"{SF}/documents.parquet")
           .select("doc_id").collect()]
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode())
                                       .hexdigest(), i))
    expect = {doc_id: pos for pos, doc_id in enumerate(order, start=1)}
    assert got == expect

    # scale shape: no corpus-wide sort.  Range-partitioning exchanges
    # must not exist; every SinglePartition exchange feeds the tiny
    # block aggregate (<= 256 rows), never the raw document scan.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan, plan
    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.end():]
        agg_at = tail.find("HashAggregate(keys=[blk")
        scan_at = tail.find("FileScan parquet")
        assert 0 <= agg_at < scan_at, plan
    # the corpus-side window partitions by blk (parallel ranks)
    assert re.search(r"\[blk#\d+\], \[k#", plan), plan


def test_lm_reference_corpus_catches_self_trained_drift(spark):
    """VERDICT r6 item 5: CCNet scores against an LM trained on a
    CLEAN reference corpus.  At a 50% junk fraction the junk becomes
    its own high-probability vocabulary — every garble doc PASSES the
    self-trained gate — while the reference-trained gate (clean half
    only) sees pure OOV and drops every one of them, with zero clean
    collateral.  Holds for BOTH the unigram and the bigram LM."""
    from engine.analytics import lm2_scores, lm_scores

    clean_text = " ".join(f"w{i % 8}" for i in range(40))
    junk_text = " ".join(f"zqj{i % 8}" for i in range(40))
    rows = [(d, clean_text) for d in range(50)] + \
           [(d, junk_text) for d in range(100, 150)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.filter("doc_id < 50")
    junk_ids = set(range(100, 150))

    for scorer in (lm_scores, lm2_scores):
        self_keep = {r.doc_id for r in
                     scorer(docs).filter("keep = 1").collect()}
        assert junk_ids <= self_keep, \
            f"{scorer.__name__}: junk must PASS the self-trained gate"

        ref_scored = {r.doc_id: r for r in
                      scorer(docs, lm_corpus=ref).collect()}
        ref_keep = {d for d, r in ref_scored.items() if r.keep == 1}
        assert ref_keep == set(range(50)), \
            f"{scorer.__name__}: reference gate must drop ALL junk " \
            f"and ONLY junk"
        # OOV docs score the worst possible bits under the reference
        # LM — far above any plausible ceiling
        assert all(ref_scored[d].bits_per_token > 8 for d in junk_ids)
