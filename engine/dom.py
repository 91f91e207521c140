"""Lightweight DOM built on stdlib ``html.parser``.

The reference parses every page with BeautifulSoup's ``html.parser``
backend (e.g. ``/root/reference/src/intelligent_parser.py:73``,
``general_parser.py:96``, ``table_parser.py:71``,
``json_script_parser.py:117``).  bs4 is not a dependency of this
rebuild; instead we tokenize with the same stdlib tokenizer bs4's
``html.parser`` backend uses and build a minimal tree that reproduces
the subset of the bs4 API the extraction kernels need:

* ``find`` / ``find_all`` with tag-name, ``attrs``, ``class_`` and
  ``recursive`` filters, in document order;
* ``get_text()`` (concatenation of descendant text, entities decoded);
* ``unwrap()`` (used for TEXT_PROPERTY_TAGS cleanup,
  ``general_parser.py:98-100``);
* ``parents`` iteration (path-chain construction,
  ``general_parser.py:523-531``);
* ``.string`` for script/JSON payloads (``json_script_parser.py:128``).

Semantics pinned to match the bs4/html.parser behaviour observable in
the reference's fixtures: tag/attr names lowercased, ``class`` is a
token list, character references decoded in text but not inside
script/style, comments dropped, void elements self-close, and stray
end tags are recovered by popping to the nearest matching open tag.

This module is pure Python and runs *inside* Arrow-batched UDFs — the
per-row work is vectorized at the batch level per the north star (no
per-row Python round trips through Spark).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Dict, Iterator, List, Optional, Union

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# Attributes bs4 treats as whitespace-separated token lists for HTML.
_MULTI_VALUED = {"class"}

AttrFilter = Dict[str, Union[str, bool, List[str]]]


class Node:
    """One element.  Text nodes are plain ``str`` entries in ``children``."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None,
                 parent: Optional["Node"] = None):
        self.name = name
        self.attrs: dict = attrs if attrs is not None else {}
        self.children: list = []  # Node | str
        self.parent = parent

    # -- attribute access -------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __getitem__(self, key: str):
        return self.attrs[key]

    def __contains__(self, key: str) -> bool:
        return key in self.attrs

    # -- traversal --------------------------------------------------------
    @property
    def parents(self) -> Iterator["Node"]:
        node = self.parent
        while node is not None:
            yield node
            node = node.parent

    def iter_elements(self, recursive: bool = True) -> Iterator["Node"]:
        """Descendant elements in document order (self excluded).

        Iterative DFS — nested generators cost O(depth) per yield and
        this is the hottest loop in the extraction kernel."""
        if not recursive:
            for child in self.children:
                if isinstance(child, Node):
                    yield child
            return
        stack = [(self.children, 0)]
        while stack:
            children, i = stack[-1]
            n = len(children)
            while i < n:
                child = children[i]
                i += 1
                if isinstance(child, Node):
                    stack[-1] = (children, i)
                    yield child
                    if child.children:
                        stack.append((child.children, 0))
                    break
            else:
                stack.pop()

    @property
    def descendants(self) -> Iterator["Node"]:
        return self.iter_elements(True)

    # -- text -------------------------------------------------------------
    def get_text(self) -> str:
        # iterative: adversarially deep markup must not hit the Python
        # recursion limit inside the extraction kernel
        parts: List[str] = []
        stack: List[list] = [self.children[::-1]]
        while stack:
            top = stack[-1]
            if not top:
                stack.pop()
                continue
            child = top.pop()
            if isinstance(child, Node):
                if child.children:
                    stack.append(child.children[::-1])
            else:
                parts.append(child)
        return "".join(parts)

    @property
    def string(self) -> Optional[str]:
        """bs4 ``.string``: the single text child, else ``None``."""
        if len(self.children) == 1 and isinstance(self.children[0], str):
            return self.children[0]
        if len(self.children) == 1 and isinstance(self.children[0], Node):
            return self.children[0].string
        return None

    # -- mutation ---------------------------------------------------------
    def unwrap(self) -> None:
        """Replace this element by its children in the parent."""
        if self.parent is None:
            return
        siblings = self.parent.children
        idx = next(i for i, c in enumerate(siblings) if c is self)
        for child in self.children:
            if isinstance(child, Node):
                child.parent = self.parent
        siblings[idx:idx + 1] = self.children
        self.children = []
        self.parent = None

    # -- search -----------------------------------------------------------
    def find_all(self, name=None, attrs: Optional[AttrFilter] = None,
                 recursive: bool = True, limit: Optional[int] = None,
                 **kwargs) -> List["Node"]:
        name_filter = _normalize_name(name)
        merged = dict(attrs) if attrs else {}
        for key, val in kwargs.items():
            if key == "class_":
                key = "class"
            merged[key] = val
        out: List[Node] = []
        if not merged:
            # hot path: tag-name-only filter, no attribute matching
            if not recursive:
                if name_filter is None:
                    out = [c for c in self.children if isinstance(c, Node)]
                else:
                    out = [c for c in self.children
                           if isinstance(c, Node) and c.name in name_filter]
            elif name_filter is None:
                out = list(self.iter_elements(True))
            else:
                out = [el for el in self.iter_elements(True)
                       if el.name in name_filter]
            return out[:limit] if limit is not None else out
        for el in self.iter_elements(recursive):
            if _matches(el, name_filter, merged):
                out.append(el)
                if limit is not None and len(out) >= limit:
                    break
        return out

    findAll = find_all

    def find(self, name=None, attrs: Optional[AttrFilter] = None,
             recursive: bool = True, **kwargs) -> Optional["Node"]:
        found = self.find_all(name, attrs, recursive, limit=1, **kwargs)
        return found[0] if found else None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name} {self.attrs}>"


def _normalize_name(name):
    if name is None or name is True:
        return None
    if isinstance(name, str):
        return {name}
    return set(name)


def _attr_value_matches(actual, expected) -> bool:
    if expected is True:
        return actual is not None
    if actual is None:
        return False
    if isinstance(actual, list):
        if isinstance(expected, str):
            return expected in actual or expected == " ".join(actual)
        if isinstance(expected, list):
            # token-subset match: every requested token present
            return all(tok in actual for tok in expected)
        return False
    if isinstance(expected, list):
        return actual in expected
    return actual == expected


def _matches(el: Node, name_filter, attrs: AttrFilter) -> bool:
    if name_filter is not None and el.name not in name_filter:
        return False
    for key, expected in attrs.items():
        if not _attr_value_matches(el.attrs.get(key), expected):
            return False
    return True


class _TreeBuilder(HTMLParser):
    """Stack-based tree builder with end-tag recovery."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack: List[Node] = [self.root]

    # html.parser lowercases tag names already
    def handle_starttag(self, tag: str, attrs) -> None:
        node = self._make_node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = self._make_node(tag, attrs)
        self.stack[-1].children.append(node)

    def _make_node(self, tag: str, attrs) -> Node:
        attr_dict: dict = {}
        for key, value in attrs:
            # duplicate attributes: LAST occurrence wins — bs4's
            # html.parser builder default (on_duplicate_attribute=
            # 'replace') in the version the reference pins
            if value is None:
                value = ""
            if key in _MULTI_VALUED:
                attr_dict[key] = value.split()
            else:
                attr_dict[key] = value
        return Node(tag, attr_dict, parent=self.stack[-1])

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)

    # comments / declarations / PIs are not part of the text surface
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


def parse_html(html: str) -> Node:
    """Parse an HTML string into a :class:`Node` tree (the document root)."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # html.parser is forgiving; any residual failure yields the
        # partial tree built so far (parse failures are accounted for
        # at the pipeline level, engine/pipeline.py).
        pass
    return builder.root
