"""Query-parser unit tests against the reference's own inline cases
(``rule_base_query_parser.py:268-277``, FIXTURES.md §2)."""

from engine import nouns
from engine.query_parse import clean_query, parse_query, parse_query_hybrid


def test_reference_inline_cases():
    """The reference's own inline queries through the STOCK ladder
    (nltk installed → POS tier live, rule_base_query_parser.py:125-131):
    queries without a "the X" pattern resolve via pos-tagging."""
    cases = {
        "Can you give me the book: name and price?":
            ("book", ["name", "price"], "the-pattern"),
        "Extract job title, location, salary, and company name from the listings":
            ("job", ["title", "location", "salary", "company name"], "pos-tagging"),
        "Get the product name, price, and description":
            ("product", ["name", "price", "description"], "the-pattern"),
        "List book author, title, price and rating":
            ("book", ["author", "title", "price", "rating"], "pos-tagging"),
        "Extract club name, location and membership fee":
            ("club", ["name", "location", "membership fee"], "pos-tagging"),
        "Get the property name, price, and address":
            ("property", ["name", "price", "address"], "the-pattern"),
        "Show me all the movie titles and ratings":
            ("movie", ["titles", "ratings"], "the-pattern"),
        "Find all companies with their revenue and employees":
            ("company", ["revenue", "employees"], "pos-tagging"),
        "Get customer information including names and addresses":
            ("customer", ["names", "addresses"], "pos-tagging"),
        "Extract vehicle details like model and year":
            ("vehicle", ["details", "model", "year"], "pos-tagging"),
    }
    for query, (entity, attrs, approach) in cases.items():
        parsed = parse_query(query)
        assert parsed.entity == entity, query
        assert parsed.attributes == attrs, query
        assert parsed.entity_approach == approach, query


def test_pos_tier_beats_simple_heuristic_on_adjective_led_queries():
    """Q4 divergence: the degraded (NLTK-absent) mode grabs the leading
    adjective; the stock POS tier skips to the noun."""
    cases = {
        "Get detailed product info with price": ("product", "detailed"),
        "Show available apartments with rent and size":
            ("apartment", "available"),
        "Find cheapest flights with airline and duration":
            ("flight", "cheapest"),
    }
    for query, (pos_entity, degraded_entity) in cases.items():
        assert parse_query(query).entity == pos_entity, query
        assert parse_query(query).entity_approach == "pos-tagging", query
        degraded = parse_query(query, use_pos=False)
        assert degraded.entity == degraded_entity, query
        assert degraded.entity_approach == "simple-heuristic", query


def test_pos_tagger_units():
    from engine.postag import pos_tag, tokenize

    assert tokenize("list book author, title and price") == [
        "list", "book", "author", ",", "title", "and", "price"]
    assert tokenize("what's the book's price") == [
        "what", "'s", "the", "book", "'s", "price"]
    tags = dict(pos_tag(["get", "detailed", "product", "info",
                         "companies", "quickly", "running", "42"]))
    assert tags["get"] == "VB"
    assert tags["detailed"] in ("JJ", "VBN")
    assert tags["product"] == "NN"
    assert tags["companies"] == "NNS"
    assert tags["quickly"] == "RB"
    assert tags["running"] in ("VBG", "NN")
    assert tags["42"] == "CD"


def test_clean_query():
    assert clean_query("Get the book: name and price?!?") == "get the book  name and price"
    assert clean_query("  WHAT? ") == "what"


def test_attribute_dedup_preserves_order():
    parsed = parse_query("get price, price and name of the book")
    assert parsed.attributes == ["price", "name"]


def test_hybrid_is_rule_based_without_ml():
    # ml_query_parser.py:189-191 — no model → rule result verbatim
    a = parse_query("Get the product name")
    b = parse_query_hybrid("Get the product name")
    assert (a.entity, a.attributes) == (b.entity, b.attributes)
    assert b.method == "rule-based"


def test_entityless_query_raises_like_reference():
    """Quirk carried verbatim: every no-entity path in the reference
    returns a BARE None (rule_base_query_parser.py:118,139), so the
    caller's unpack raises TypeError and the request surfaces as the
    'Parsing error: cannot unpack non-iterable NoneType object'
    envelope — never the clean cannot-extract message."""
    import pytest

    for q in ("get me the", "the", "   ", "of in on"):
        with pytest.raises(TypeError, match="cannot unpack non-iterable"):
            parse_query(q)

    # entity present, attributes empty → the CLEAN branch
    parsed = parse_query("get the book")
    assert parsed.entity == "book" and parsed.attributes == []


def test_nouns():
    assert nouns.singularize("companies") == "company"
    # quirk carried verbatim: ref noun.py:33-35 yields 'knif', not 'knife'
    assert nouns.singularize("knives") == "knif"
    assert nouns.singularize("glasses") == "glass"
    assert nouns.singularize("boxes") == "box"
    assert nouns.singularize("books") == "book"
    assert nouns.singularize("people") == "person"
    assert nouns.pluralize("company") == "companies"
    # ref noun.py:83-85 only maps a trailing 'f' (wolf→wolves);
    # 'knife' falls through to the default +s rule
    assert nouns.pluralize("knife") == "knifes"
    assert nouns.pluralize("wolf") == "wolves"
    # ref noun.py:86-88: a trailing-s noun is returned unchanged
    assert nouns.pluralize("glass") == "glass"
    assert nouns.pluralize("photo") == "photos"
    assert nouns.pluralize("book") == "books"
    assert nouns.pluralize("person") == "people"
    # round-trip quirk carried from the reference: -es words
    assert nouns.singularize("dishes") == "dish"
