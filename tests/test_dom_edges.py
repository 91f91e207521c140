"""DOM edge-semantics tests: the cases where html.parser-backed trees
differ from browser/html5lib behavior — we pin the html.parser-family
behavior the reference observes through bs4."""

from engine.dom import parse_html
from engine.kernels import general, table


def test_unclosed_li_nests_like_htmlparser():
    # html.parser does NOT imply-close <li>; the second li nests inside
    # the first (bs4's html.parser backend behaves the same way)
    root = parse_html("<ul><li>a<li>b</li></li></ul>")
    ul = root.find("ul")
    top_level = ul.find_all("li", recursive=False)
    assert len(top_level) == 1
    assert len(ul.find_all("li")) == 2


def test_table_text_stays_in_place():
    # no browser-style relocation of stray text out of tables
    root = parse_html("<table>stray<tr><td>x</td></tr></table>")
    assert root.find("table").get_text() == "strayx"


def test_script_inside_body_not_parsed_as_markup():
    root = parse_html('<body><script>if (a < b) { x("<div>"); }</script></body>')
    assert root.find("div") is None
    assert root.find("script").string == 'if (a < b) { x("<div>"); }'


def test_style_cdata_mode():
    root = parse_html("<style>p > a { color: red }</style><p>t</p>")
    assert len(root.find_all("p")) == 1


def test_attribute_quoting_variants():
    root = parse_html("<div a=1 b='2' c=\"3\" d></div>")
    div = root.find("div")
    assert div["a"] == "1" and div["b"] == "2" and div["c"] == "3"
    assert div["d"] == ""


def test_uppercase_tags_and_attrs_lowercased():
    root = parse_html('<DIV CLASS="Big Top">x</DIV>')
    div = root.find("div")
    assert div["class"] == ["Big", "Top"]  # values keep case, names don't


def test_conditional_comment_dropped():
    root = parse_html("<!--[if IE]><div class='ie'></div><![endif]--><p>y</p>")
    assert root.find("div") is None
    assert root.find("p").get_text() == "y"


def test_nested_tables_row_scoping():
    html = """<table><tr><th>name</th></tr>
      <tr><td><table><tr><td>inner</td></tr></table></td></tr></table>"""
    root = parse_html(html)
    outer = root.find("table")
    # find_all('tr') from the outer table sees inner rows too — exactly
    # what the reference's table parser would see through bs4
    assert len(outer.find_all("tr")) == 3
    results = table.parse_tables(root, "x", ["name"], 0.6)
    assert results[0]["name"] == "inner"


def test_whitespace_only_class_tokens():
    root = parse_html('<div class="  a   b ">x</div>')
    assert root.find("div")["class"] == ["a", "b"]


def test_mismatched_case_end_tag():
    root = parse_html("<div><P>text</P></div>")
    assert root.find("p").get_text() == "text"


def test_input_value_extraction():
    root = parse_html('<form><input name="price" value="42"></form>')
    el = root.find("input")
    assert general.get_element_text(el) == "42"


def test_entity_edge_cases_in_text():
    root = parse_html("<p>&pound;51.77 &amp;&nbsp;&#163;5</p>")
    assert root.find("p").get_text() == "£51.77 &\xa0£5"
