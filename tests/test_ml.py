"""ML-tier tests (SURVEY.md §2.2 Q10, §2.6 M1-M4) with the
deterministic fake generator."""

from engine import ml


def test_query_response_parse():
    text = '"entity":"website", "attributes": "url, domain age, primary language"'
    entity, attrs = ml.parse_query_response(text)
    assert entity == "website"
    assert attrs == ["url", "domain age", "primary language"]


def test_query_parse_model_absent():
    assert ml.ml_parse_query("anything", None) == (None, [])


def test_query_parse_with_fake():
    entity, attrs = ml.ml_parse_query("give me books", ml.FakeSeq2Seq())
    assert entity == "book" and attrs == ["name", "price"]


def test_extraction_response_parse():
    resp = '"name":"A Book", "price":"$9.99", "note":"x, y"'
    assert ml.parse_extraction_response(resp) == {
        "name": "A Book", "price": "$9.99", "note": "x, y"}


def test_extraction_response_comma_quirk():
    # a comma INSIDE a value before a quote does not split (ref split
    # on ', "') — carried verbatim
    resp = '"a":"1, 2", "b":"3"'
    assert ml.parse_extraction_response(resp) == {"a": "1, 2", "b": "3"}


def test_ml_parse_html_model_absent():
    assert ml.ml_parse_html("<div></div>", "q", ["a"], None) == []


def _cards(n):
    return "<html><body>" + "".join(
        f'<div class="card"><p class="name">Item {i}</p>'
        f'<p class="price">£{i}0</p></div>' for i in range(n)
    ) + "</body></html>"


def test_ml_parse_html_end_to_end_with_fake():
    results = ml.ml_parse_html(_cards(3), "get the name and price",
                               ["name", "price"], ml.FakeSeq2Seq())
    assert results == [
        {"name": "Item 0", "price": "£00"},
        {"name": "Item 1", "price": "£10"},
        {"name": "Item 2", "price": "£20"},
    ]


def test_top_promising_groups_score_is_conf_times_count():
    top = ml.find_top_promising_groups({0: 2, 1: 4}, {0: 0.9, 1: 0.3}, top_k=1)
    assert top == [(0, 1.8)]  # 0.9*2 > 0.3*4


def test_serialize_roundtrip():
    from engine.dom import parse_html
    html = '<div class="a b"><p id="x">t &amp; u</p></div>'
    root = parse_html(html)
    out = ml._node_to_html(root.find("div"))
    # entities were decoded at parse time; serialization re-escapes
    # like bs4 str()
    assert out == '<div class="a b"><p id="x">t &amp; u</p></div>'
