"""Table kernel (SURVEY.md §2.4) — including the reference's own inline
golden (``table_parser.py:242-289``)."""

from engine.dom import parse_html
from engine.kernels import table

_REF_GOLDEN_HTML = """
<html><body>
  <table>
    <thead>
      <tr><th>Book Title</th><th>Author</th><th>Price</th><th>Rating</th></tr>
    </thead>
    <tbody>
      <tr><td>The Great Gatsby</td><td>F. Scott Fitzgerald</td><td>$12.99</td><td>4.5</td></tr>
      <tr><td>To Kill a Mockingbird</td><td>Harper Lee</td><td>$14.99</td><td>4.8</td></tr>
    </tbody>
  </table>
</body></html>
"""


def test_reference_inline_golden():
    root = parse_html(_REF_GOLDEN_HTML)
    assert table.is_table(root)
    # class default threshold 0.7: partial match (0.8) still passes
    results = table.parse_tables(root, "book", ["title", "author", "price"],
                                 similarity_threshold=0.7)
    assert results == [
        {"title": "The Great Gatsby", "author": "F. Scott Fitzgerald", "price": "$12.99"},
        {"title": "To Kill a Mockingbird", "author": "Harper Lee", "price": "$14.99"},
    ]


def test_headers_thead_priority():
    root = parse_html(_REF_GOLDEN_HTML)
    t = root.find("table")
    assert table.extract_headers(t) == ["Book Title", "Author", "Price", "Rating"]


def test_headers_first_tr_with_th_fallback():
    html = "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
    t = parse_html(html).find("table")
    assert table.extract_headers(t) == ["A", "B"]


def test_headers_first_tr_fallback():
    html = "<table><tr><td>A</td></tr><tr><td>1</td></tr></table>"
    t = parse_html(html).find("table")
    assert table.extract_headers(t) == ["A"]


def test_exact_match_beats_partial():
    mapping = table.match_attributes_to_headers(
        ["price"], ["price range", "price"], 0.6)
    assert mapping == {"price": 1}


def test_partial_match_dropped_above_threshold():
    # partial scores 0.8; with threshold 0.9 it must be dropped
    mapping = table.match_attributes_to_headers(["title"], ["Book Title"], 0.9)
    assert mapping == {}


def test_missing_cells_filled_empty_and_empty_rows_dropped():
    html = """<table>
      <tr><th>a</th><th>b</th></tr>
      <tr><td>1</td></tr>
      <tr><td></td><td></td></tr>
    </table>"""
    t = parse_html(html).find("table")
    rows = table.extract_rows_data(t, {"a": 0, "b": 1})
    assert rows == [{"a": "1", "b": ""}]


def test_clean_text():
    assert table.clean_text("  a\n\tb\xa0c – d — e ") == "a b c - d - e"
    assert table.clean_text("") == ""


def test_multi_table_concat():
    html = ("<table><tr><th>a</th></tr><tr><td>1</td></tr></table>"
            "<table><tr><th>a</th></tr><tr><td>2</td></tr></table>")
    root = parse_html(html)
    assert table.parse_tables(root, "x", ["a"], 0.6) == [{"a": "1"}, {"a": "2"}]
