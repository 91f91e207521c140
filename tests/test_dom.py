"""Lightweight-DOM semantics (engine/dom.py)."""

from engine.dom import parse_html


def test_basic_tree_and_text():
    root = parse_html("<div><p>Hello <b>world</b></p></div>")
    div = root.find("div")
    assert div is not None
    assert div.get_text() == "Hello world"


def test_entities_decoded_in_text_and_attrs():
    root = parse_html('<p title="a&amp;b">x &lt; y&nbsp;z</p>')
    p = root.find("p")
    assert p["title"] == "a&b"
    assert p.get_text() == "x < y\xa0z"


def test_class_is_token_list():
    root = parse_html('<div class="a b  c"></div>')
    assert root.find("div")["class"] == ["a", "b", "c"]


def test_find_all_filters():
    html = ('<div class="x"><span class="x y">1</span></div>'
            '<span id="s2">2</span><span>3</span>')
    root = parse_html(html)
    assert len(root.find_all("span")) == 3
    assert len(root.find_all("span", class_=True)) == 1
    assert root.find("span", {"id": "s2"}).get_text() == "2"
    # string class filter matches token or full joined string
    assert len(root.find_all(attrs={"class": "x"})) == 2
    assert len(root.find_all(attrs={"class": "x y"})) == 1


def test_recursive_false():
    root = parse_html("<div><p>a</p><div><p>b</p></div></div>")
    outer = root.find("div")
    assert len(outer.find_all("p", recursive=False)) == 1
    assert len(outer.find_all("p")) == 2


def test_void_elements_do_not_nest():
    root = parse_html('<div><img src="u"><p>t</p></div>')
    div = root.find("div")
    children = [c.name for c in div.children if not isinstance(c, str)]
    assert children == ["img", "p"]


def test_script_content_is_raw_string():
    root = parse_html('<script type="application/json">{"a": "x<y&z"}</script>')
    s = root.find("script")
    assert s.string == '{"a": "x<y&z"}'


def test_stray_end_tag_recovery():
    root = parse_html("<div><p>a</div></p><span>b</span>")
    assert root.find("span").get_text() == "b"


def test_unwrap():
    root = parse_html("<p>a<b>b</b>c</p>")
    root.find("b").unwrap()
    p = root.find("p")
    assert p.get_text() == "abc"
    assert p.find("b") is None


def test_parents():
    root = parse_html('<div class="c"><span><a href="u">x</a></span></div>')
    a = root.find("a")
    names = [p.name for p in a.parents]
    assert names == ["span", "div", "[document]"]


def test_comments_excluded():
    root = parse_html("<p>a<!-- nope -->b</p>")
    assert root.find("p").get_text() == "ab"


def test_duplicate_attr_last_wins():
    # bs4 html.parser builder default: on_duplicate_attribute='replace'
    root = parse_html('<div id="one" id="two"></div>')
    assert root.find("div")["id"] == "two"


def test_malformed_html_does_not_raise():
    root = parse_html("<div <p>> broken <<< &unknown; <b>ok")
    assert root is not None
