"""Semantic-tier tests (SURVEY.md §7.2.4): the pluggable matcher
activates T3 semantic header match, G8 recursive similarity search and
J5 semantic key matching.  The TokenSimilarityMatcher is deterministic
and dependency-free, so the FULL code paths run in CI; matcher=None
remains the parity-pinned degraded mode."""

from engine.dom import parse_html
from engine.kernels import general, jsonld, table
from engine.matcher import EmbeddingMatcher, Matcher, TokenSimilarityMatcher
from engine.parser import extract_turn
from engine.query_parse import parse_query_hybrid


class FixedMatcher(Matcher):
    """Scores from an explicit table — precise control in tests."""

    def __init__(self, table_, default=0.0):
        self.table = table_
        self.default = default

    def similarity(self, a, b):
        return self.table.get((a, b), self.table.get((b, a), self.default))


def test_token_matcher_basics():
    m = TokenSimilarityMatcher()
    assert m.similarity("price", "price") == 1.0
    assert m.similarity("price", "book price") > 0.4
    assert m.similarity("price", "zzz") == 0.0
    idx, score = m.best_match("price", ["author", "unit price", "title"])
    assert idx == 1 and score > 0.4


def test_embedding_matcher_cosine():
    vecs = {"a": [1.0, 0.0], "b": [1.0, 0.0], "c": [0.0, 1.0]}
    m = EmbeddingMatcher(lambda xs: [vecs[x] for x in xs])
    assert abs(m.similarity("a", "b") - 1.0) < 1e-9
    assert abs(m.similarity("a", "c")) < 1e-9


def test_embedding_matcher_batches_encode_calls():
    """best_match over N candidates must issue ONE encode call for all
    cache misses, not one per string (SURVEY.md §4.1)."""
    vecs = {"q": [1.0, 0.0], "a": [0.0, 1.0], "b": [1.0, 0.0],
            "c": [0.5, 0.5]}
    calls = []

    def encode(xs):
        calls.append(list(xs))
        return [vecs[x] for x in xs]

    m = EmbeddingMatcher(encode)
    idx, score = m.best_match("q", ["a", "b", "c"])
    assert idx == 1 and abs(score - 1.0) < 1e-9
    assert len(calls) == 1 and sorted(calls[0]) == ["a", "b", "c", "q"]
    # a second argmax over cached strings issues no model call at all
    m.best_match("q", ["a", "b"])
    assert len(calls) == 1


# --- T3 semantic -----------------------------------------------------------

def test_table_semantic_header_match():
    # no exact/substring relation between 'cost' and 'Price (USD)'
    m = FixedMatcher({("cost", "Price (USD)"): 0.9})
    mapping = table.match_attributes_to_headers(
        ["cost"], ["Title", "Price (USD)"], 0.6, matcher=m)
    assert mapping == {"cost": 1}


def test_table_semantic_below_threshold_dropped():
    m = FixedMatcher({("cost", "Price (USD)"): 0.5})
    mapping = table.match_attributes_to_headers(
        ["cost"], ["Title", "Price (USD)"], 0.6, matcher=m)
    assert mapping == {}


def test_table_exact_still_wins_over_matcher():
    m = FixedMatcher({}, default=0.99)
    mapping = table.match_attributes_to_headers(
        ["price"], ["price", "other"], 0.6, matcher=m)
    assert mapping == {"price": 0}


# --- G8 --------------------------------------------------------------------

def test_g8_non_container_above_threshold_returns_text():
    html = '<div class="c"><p class="cost-tag">42 dollars</p></div>'
    root = parse_html(html)
    m = FixedMatcher({("price", "cost-tag"): 0.9})
    res = general.find_by_similarity(root.find("div"), "price", m, 0.6)
    assert res.value == "42 dollars" and res.score == 0.9


def test_g8_non_container_below_threshold_falls_back_to_text_tag():
    # quirk (ref :786-789): fallback text is returned at the SIMILARITY
    # score, not the common-attr score, and with no threshold gate
    html = ('<div class="c"><p>First text</p>'
            '<span class="whatever">other</span></div>')
    root = parse_html(html)
    m = FixedMatcher({("price", "whatever"): 0.3})
    res = general.find_by_similarity(root.find("div"), "price", m, 0.6)
    assert res.value == "First text" and res.score == 0.3


def test_g8_recurses_into_best_container():
    html = ('<div class="outer">'
            '<div class="pricing"><p class="amount">99</p></div>'
            '<p class="noise">n1</p></div>')
    root = parse_html(html)
    m = FixedMatcher({("price", "pricing"): 0.7, ("price", "amount"): 0.95,
                      ("price", "noise"): 0.1})
    res = general.find_by_similarity(root.find("div", {"class": "outer"}),
                                     "price", m, 0.6)
    assert res.value == "99" and res.score == 0.95
    # path chain prefixed with the container step
    assert [t.tag_name for t in res.path_chain] == ["div", "p"]


def test_g8_low_score_container_fans_out_to_all_containers():
    # best candidate is a container below threshold → recurse into ALL
    # container candidates, take the global max (ref :739-761)
    html = ('<div class="outer">'
            '<div class="aaa"><p class="xx">wrong</p></div>'
            '<div class="bbb"><p class="amount">right</p></div></div>')
    root = parse_html(html)
    m = FixedMatcher({("price", "aaa"): 0.5, ("price", "bbb"): 0.2,
                      ("price", "amount"): 0.9, ("price", "xx"): 0.1})
    res = general.find_by_similarity(root.find("div", {"class": "outer"}),
                                     "price", m, 0.6)
    assert res.value == "right" and res.score == 0.9
    # quirk: the prepended step is the BEST element ('aaa'), not the
    # element the winning recursion came from (ref :759-761)
    assert res.path_chain[0].attributes.get("class") == ["aaa"]


def test_g8_no_candidates_uses_common_attr_fallback():
    html = '<div class="name-box"><p>The Name</p></div>'
    root = parse_html(html)
    # container's own class scores against COMMON_ATTRIBUTES
    m = FixedMatcher({("name-box", "name"): 0.85})
    res = general.find_by_similarity(root.find("div"), "title", m, 0.6)
    assert res.value == "The Name" and res.score == 0.85


def test_g8_depth_limit():
    html = '<div class="c"><p class="x">t</p></div>'
    root = parse_html(html)
    m = FixedMatcher({}, default=0.9)
    assert general.find_by_similarity(root.find("div"), "a", m, 0.6,
                                      depth=0) is None


def test_g9a_empty_value_penalty_with_matcher():
    # a 'name'-like attr matched at high similarity but empty value →
    # score ×0.6, value nulled (ref :232-239)
    html = ('<div><p class="title"></p><p class="other">x</p>'
            '<span><i>a</i><u>b</u></span></div>')
    root = parse_html(html)

    class M(Matcher):
        def similarity(self, a, b):
            if (a, b) == ("title", "title") or (a, b) == ("name", "title"):
                return 1.0
            if b in ("name", "title") and a == "title":
                return 1.0
            return 0.9 if a == "title" or b == "title" else 0.0

    results = general.parse_from_likely_containers(root, ["title"], 0.6, M())
    # high common-attr similarity + empty text → suppressed to None
    assert results == [] or results[0].get("title") in (None, "x", "a b")


def test_g5_winner_quirk_fewer_attrs_can_win_on_stale_count():
    """Ref general_parser.py:164-178: when a group wins on the
    confidence branch, ``highest_count`` is NOT updated; a later group
    with EQUAL confidence but fewer found attrs then beats it because
    its count exceeds the stale zero.  Only observable with fractional
    scores (similarity tier), carried verbatim."""
    html = (
        # group X: 3 containers; 'alpha' exact (1.0), 'beta' via the
        # G8 fallback-text quirk at score 0.0 → conf 0.5, count 2,
        # NOT all-high-confidence (no early break)
        '<div class="xx"><p class="alpha">x1</p></div>'
        '<div class="xx"><p class="alpha">x2</p></div>'
        '<div class="xx"><p class="alpha">x3</p></div>'
        # group Y: 2 containers, 'beta' exact (1.0), 'alpha' missing
        # (no text-tag fallback) → conf 0.5, count 1
        '<div class="yy"><div class="beta">b1</div></div>'
        '<div class="yy"><div class="beta">b2</div></div>')
    root = parse_html(html)
    m = FixedMatcher({})
    results = general.parse_general(root, "item", ["alpha", "beta"], 0.6, m)
    # group X (larger, evaluated first) wins the confidence branch with
    # conf 0.5/count 2; group Y ties on confidence and its count (1)
    # beats the never-updated highest_count (0) → Y's records win even
    # though it found FEWER attributes
    assert len(results) == 2
    assert results[0] == {"alpha": None, "beta": "b1"}
    assert results[1] == {"beta": "b2"}


# --- J5 --------------------------------------------------------------------

def test_j5_semantic_fills_missing_attrs_by_position():
    flat = {"book[0].name": "N0", "book[1].name": "N1", "cost_usd": 12.5}
    m = FixedMatcher({("price", "cost_usd"): 0.9})
    results = jsonld.extract_entities_from_flattened(
        flat, "book", ["name", "price"], m, 0.6)
    # regex found name for instances 0/1; semantic fills 'price' into
    # the FIRST result only (merge by list position, ref :305-315)
    assert results[0] == {"name": "N0", "price": 12.5}
    assert results[1] == {"name": "N1"}


def test_j5_last_tied_key_wins():
    flat = {"k1": "first", "k2": "second"}
    m = FixedMatcher({("attr", "k1"): 0.8, ("attr", "k2"): 0.8})
    results = jsonld.extract_using_semantic_matching(flat, ["attr"], m, 0.6)
    assert results == [{"attr": "second"}]  # >= keeps the later key


def test_j5_values_stringified_at_spark_boundary():
    from engine.extract import _stringify_results
    assert _stringify_results([{"price": 12.5, "name": "x", "nil": None}]) \
        == [{"price": "12.5", "name": "x", "nil": None}]


# --- end-to-end with matcher ------------------------------------------------

def test_extract_turn_with_token_matcher_table():
    html = ("<table><thead><tr><th>Book Title</th><th>Cost in USD</th></tr>"
            "</thead><tbody><tr><td>T1</td><td>$9</td></tr></tbody></table>")
    parsed = parse_query_hybrid("Get the book title and cost")
    t = extract_turn(html, parsed, matcher=TokenSimilarityMatcher())
    assert t.strategy == "table"
    assert t.results[0]["title"] == "T1"


def test_matcher_none_unchanged_snapshot():
    """Plugging matcher=None must remain byte-identical to the pinned
    deterministic behavior (regression guard for the threading work)."""
    import json

    from scripts.gen_goldens import GOLDENS_PATH, build
    with open(GOLDENS_PATH) as f:
        expected = json.load(f)
    assert build() == expected
