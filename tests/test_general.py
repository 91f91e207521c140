"""General-parser kernel (SURVEY.md §2.5) unit tests."""

from engine.dom import parse_html
from engine.kernels import general, structures


def _cards(n, with_name=True):
    items = []
    for i in range(n):
        name = f'<p class="name">Item {i}</p>' if with_name else ""
        items.append(f'<div class="card">{name}<p class="price">£{i}0</p></div>')
    return "<html><body>" + "".join(items) + "</body></html>"


def test_repeated_structures_grouping_and_sort():
    html = ('<div class="a"></div><div class="a"></div><div class="a"></div>'
            '<div class="b"></div><div class="b"></div>'
            '<div class="solo"></div>')
    groups = structures.find_repeated_structures(parse_html(html))
    assert [len(g) for g in groups] == [3, 2]
    assert " ".join(groups[0][0]["class"]) == "a"


def test_li_grouped_by_list_class():
    html = '<ul class="menu"><li>a</li><li>b</li></ul>'
    groups = structures.find_repeated_structures(parse_html(html))
    assert len(groups) == 1 and [el.name for el in groups[0]] == ["li", "li"]


def test_likely_containers_min_descendants():
    html = "<div><p>a</p><p>b</p></div><span><i>x</i></span>"
    found = structures.find_likely_entity_containers(parse_html(html), 2)
    # body has ≥2 descendants, the div too; the span only 1
    names = [el.name for el in found]
    assert "div" in names and "span" not in names


def test_exact_match_extraction_and_replay():
    root = parse_html(_cards(3))
    results = general.parse_general(root, "item", ["name", "price"])
    assert results == [
        {"name": "Item 0", "price": "£00"},
        {"name": "Item 1", "price": "£10"},
        {"name": "Item 2", "price": "£20"},
    ]


def test_group_below_half_attrs_rejected():
    # only price present; 1 found of 2 → ≥ max(1, 2//2)=1 → still kept
    root = parse_html(_cards(2, with_name=False))
    results = general.parse_general(root, "item", ["name", "price"])
    assert results == [{"name": None, "price": "£00"}, {"price": "£10"}]


def test_replay_record_shape_asymmetry():
    """First record carries all requested attrs; replay records only the
    attrs found in the first container (ref general_parser.py:187-205)."""
    root = parse_html(_cards(2, with_name=False))
    results = general.parse_general(root, "item", ["name", "price"])
    assert set(results[0].keys()) == {"name", "price"}
    assert set(results[1].keys()) == {"price"}


def test_image_ladder():
    html = ('<div class="c"><div class="wrap"><img src="u0.png" alt="z"></div></div>'
            '<div class="c"><div class="wrap"><img src="u1.png"></div></div>')
    root = parse_html(html)
    results = general.parse_general(root, "x", ["image", "caption"])
    assert results[0]["image"] == "u0.png"
    assert results[1]["image"] == "u1.png"


def test_link_ladder():
    html = ('<div class="c"><a href="h0">t0</a><p class="name">n0</p></div>'
            '<div class="c"><a href="h1">t1</a><p class="name">n1</p></div>')
    root = parse_html(html)
    results = general.parse_general(root, "x", ["link", "name"])
    assert results == [{"link": "h0", "name": "n0"}, {"link": "h1", "name": "n1"}]


def test_image_miss_skips_text_strategies():
    # attr contains an image keyword but no <img>: returns None even
    # though a class-matching element exists (ref :491-493)
    html = ('<div class="c"><p class="photo">not an image</p></div>'
            '<div class="c"><p class="photo">x</p></div>')
    root = parse_html(html)
    results = general.parse_general(root, "x", ["photo", "missing"])
    assert results == []  # nothing found → no group accepted


def test_text_property_unwrap_enables_text():
    html = ('<div class="c"><p class="name"><b>Bold</b> name</p><p class="price">1</p></div>'
            '<div class="c"><p class="name"><b>Other</b></p><p class="price">2</p></div>')
    root = parse_html(html)
    results = general.parse_general(root, "x", ["name", "price"])
    assert results[0]["name"] == "Bold name"


def test_get_element_text_rules():
    root = parse_html('<p>  a \n b\xa0c </p><p>***</p><input value="v">')
    ps = root.find_all("p")
    assert general.get_element_text(ps[0]) == "a b c"
    assert general.get_element_text(ps[1]) is None  # no alnum
    assert general.get_element_text(root.find("input")) == "v"


def test_navigation_keyword_suppressed_in_likely_containers():
    # single container (no repeated group) whose 'name' value is a nav word
    html = '<div><p class="name">next</p><p class="other">keep</p></div>'
    root = parse_html(html)
    results = general.parse_from_likely_containers(root, ["name"], 0.6)
    assert results == [{"name": None}]


def test_likely_container_best_record_single():
    html = ('<div><p class="alpha">A</p><span><i>j</i><u>k</u></span></div>'
            '<div><p class="alpha">B</p><p class="beta">C</p></div>')
    root = parse_html(html)
    results = general.parse_from_likely_containers(root, ["alpha", "beta"], 0.6)
    assert results == [{"alpha": "B", "beta": "C"}]


def test_confidence_counts_missing_as_zero():
    ext = {"a": general.AttributeData("a", "v", 1.0, []), "b": None}
    assert general.overall_confidence(ext) == 0.5
