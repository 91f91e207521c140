"""File-source tests (S2): directory of HTML pages → transcript-shaped
rows → the same extraction kernel."""

import os

from engine.extract import extract_turns
from engine.sources import read_html_files


def test_read_html_files_and_extract(spark, tmp_path):
    pages = tmp_path / "pages"
    os.makedirs(pages)
    for i in range(3):
        (pages / f"page{i}.html").write_text(
            '<div class="item"><p class="name">N%d</p>'
            '<p class="price">P%d</p></div>' % (i, i)
            + '<div class="item"><p class="name">M%d</p>'
              '<p class="price">Q%d</p></div>' % (i, i))

    df = read_html_files(spark, str(pages))
    rows = df.collect()
    assert len(rows) == 3
    assert all(r.conv_id.endswith(".html") for r in rows)
    assert all(not r.oversize for r in rows)

    res = extract_turns(df, "Can you give me the book: name and price?")
    got = {r.conv_id.rsplit("/", 1)[-1]: r.n_results for r in res.collect()}
    assert got == {"page0.html": 2, "page1.html": 2, "page2.html": 2}


def test_oversize_flag(spark, tmp_path):
    pages = tmp_path / "pages2"
    os.makedirs(pages)
    (pages / "big.html").write_text("<p>" + "x" * 1000 + "</p>")
    df = read_html_files(spark, str(pages), max_bytes=100)
    assert df.collect()[0].oversize is True
