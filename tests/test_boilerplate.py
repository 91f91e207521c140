"""Arc90/readability-style boilerplate stripping (engine/boilerplate.py)
— the north-star operator "text-density and link-density heuristics
over node subtrees"."""

import pytest

from engine.boilerplate import (extract_main_text, score_main_content,
                                strip_boilerplate)
from engine.dom import parse_html

PAGE = """
<html><body>
<div class="nav"><a href="/">Home</a> <a href="/a">About</a>
  <a href="/p">Products</a> <a href="/c">Contact</a></div>
<div class="content">
  <p>This is the real article text, with several commas, long enough to
  matter for readability scoring in every implementation.</p>
  <p>A second paragraph keeps the density up, adds more commas, and
  cements the winner.</p>
</div>
<div class="sidebar"><ul><li><a href="/x">Link one</a></li>
  <li><a href="/y">Link two</a></li></ul></div>
<div class="footer"><a href="/imprint">Imprint</a></div>
</body></html>
"""


def test_content_div_beats_nav_sidebar_footer():
    out = extract_main_text(PAGE)
    assert out["winner_class"] == "content"
    assert out["main_text"].startswith("This is the real article text")
    assert "Home" not in out["main_text"]
    assert "Imprint" not in out["main_text"]
    assert out["removed_len"] > 0
    assert out["link_density"] == 0.0


def test_link_density_kills_link_farm():
    # a link farm with long anchor texts outscores on raw points but
    # its link_density ≈ 1 collapses the final score
    html = """
    <div class="posts">
      <p><a href="1">A long comma, separated, link text block that is
      certainly over the length threshold</a></p>
      <p><a href="2">Another long, comma heavy, anchor text block also
      over the length threshold here</a></p>
    </div>
    <div class="content">
      <p>Short but honest article text, with commas, and no links at
      all inside the whole block.</p>
    </div>
    """
    out = extract_main_text(html)
    assert out["winner_class"] == "content"


def test_short_paragraphs_are_not_candidates():
    root = parse_html("<div class='content'><p>too short</p></div>")
    winner, score, _ = score_main_content(root)
    assert winner is None  # < 25 chars → no candidate blocks at all


def test_no_candidates_falls_back_to_document_text():
    out = extract_main_text("<div><p>tiny</p><p>also tiny</p></div>")
    assert out["winner_tag"] == "[document]"
    assert out["main_text"] == "tiny also tiny" or \
        out["main_text"] == "tinyalso tiny"


def test_script_and_style_text_excluded():
    html = """
    <div class="content"><p>Real text, with a comma, long enough to be
    a candidate paragraph here.</p>
    <script>var boilerplate = "not text";</script></div>
    """
    out = extract_main_text(html)
    assert "boilerplate" not in out["main_text"]
    assert "not text" not in out["main_text"]


def test_negative_hint_penalizes_comment_block():
    html = """
    <div class="comments">
      <p>A user comment, quite long, with commas, that should not win
      against the article body ever.</p>
      <p>Another comment, also long enough, with commas, to generate
      candidate points for its parent.</p>
    </div>
    <div class="article">
      <p>The actual article text, also with commas, long enough to be
      a candidate paragraph block.</p>
    </div>
    """
    out = extract_main_text(html)
    assert out["winner_class"] == "article"


@pytest.mark.usefixtures("spark")
def test_strip_boilerplate_operator(spark):
    from pyspark.sql import Row

    rows = [
        Row(conv_id="c0", turn_idx=0, role="assistant", text=PAGE),
        Row(conv_id="c0", turn_idx=1, role="assistant",
            text="plain prose, no markup at all"),
        Row(conv_id="c1", turn_idx=0, role="assistant", text=None),
    ]
    out = {(r.conv_id, r.turn_idx): r
           for r in strip_boilerplate(spark.createDataFrame(rows)).collect()}
    page = out[("c0", 0)]
    assert page.winner_class == "content"
    assert page.main_text.startswith("This is the real article text")
    assert page.removed_len == page.total_len - page.main_len > 0
    prose = out[("c0", 1)]
    assert prose.winner_tag == "none"
    assert prose.main_text == "plain prose, no markup at all"
    assert prose.removed_len == 0
    empty = out[("c1", 0)]
    assert empty.main_text == "" and empty.total_len == 0
