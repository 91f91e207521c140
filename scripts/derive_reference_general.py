#!/usr/bin/env python3
"""Independent derivation tool for tests/test_reference_derived.py.

This is a THIRD implementation (stdlib-only, shares no code with
engine/kernels) of the reference's general-parser group selection and
exact-match ladder, written directly from reading the reference source:

* grouping          /root/reference/src/utils/html_utils.py:18-83
* winner loop       /root/reference/src/parsers/html_parser/general_parser.py:123-210
* exact-match DFS   general_parser.py:558-612
* path-chain replay general_parser.py:364-457
* text extraction   general_parser.py:824-844
* unwrap rule       general_parser.py:95-100 + html_utils.py:12

Usage: python scripts/derive_reference_general.py <fixture.html>
         "<attr1,attr2,...>"

It prints the group table, the qualification trace, the winner and the
derived records — the literals pasted (and hand-spot-checked) into
tests/test_reference_derived.py.  It is evidence tooling, not part of
the engine; the engine's own implementation is engine/kernels/.
"""

import json
import re
import sys
from html.parser import HTMLParser

TEXT_PROPERTY_TAGS = {'b', 'h1', 'h2', 'h3', 'h4', 'h5', 'h6', 'strong',
                      'i', 'em', 'u', 'small', 'mark', 'abbr', 'cite'}
CONTAINER_TAGS = {'body', 'div', 'span', 'article', 'section', 'ul', 'ol',
                  'li', 'figcaption', 'figure'}
IMAGE_KEYWORDS = {'image', 'img', 'photo', 'picture', 'thumbnail', 'avatar',
                  'logo', 'icon', 'banner'}
LINK_KEYWORDS = {'link', 'url', 'website', 'web', 'site', 'websites', 'sites'}
ATTRS_MAY_CONTAIN_VALUES = {'src', 'alt', 'title', 'poster', 'type', 'kind',
                            'label', 'srclang', 'href', 'rel', 'content'}
VOID = {'area', 'base', 'br', 'col', 'embed', 'hr', 'img', 'input', 'link',
        'meta', 'param', 'source', 'track', 'wbr'}


class Node:
    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []   # Node or str
        self.parent = None

    def classes(self):
        return (self.attrs.get('class') or '').split()

    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    def walk(self):
        yield self
        for c in self.element_children():
            yield from c.walk()

    def get_text(self):
        out = []
        for c in self.children:
            out.append(c.get_text() if isinstance(c, Node) else c)
        return ''.join(out)


class TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node('[document]', [])
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs)
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, attrs)
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(data)
    # comments / decls / PIs dropped (bs4 get_text excludes comments)


def unwrap_text_property_tags(root):
    """general_parser.py:95-100: unwrap b/h1-h6/strong/... everywhere."""
    changed = True
    while changed:
        changed = False
        for node in list(root.walk()):
            for i, c in enumerate(list(node.children)):
                if isinstance(c, Node) and c.tag in TEXT_PROPERTY_TAGS:
                    node.children[i:i + 1] = c.children
                    for gc in c.children:
                        if isinstance(gc, Node):
                            gc.parent = node
                    changed = True


def clean_text(node):
    """general_parser.py:824-844."""
    text = re.sub(r'\s+', ' ', node.get_text().strip()).replace('\xa0', ' ')
    if len(text) < 1 or not re.search(r'[a-zA-Z0-9]', text):
        return None
    return text


def find_repeated_structures(root):
    """html_utils.py:18-83: div/span/article/section grouped by full
    class string (per-tag loop order), li's grouped under their ul/ol
    class; groups of >1, sorted by size desc (stable)."""
    elements_by_class = {}
    for tag_name in ['div', 'span', 'article', 'section']:
        for el in (n for n in root.walk()
                   if n.tag == tag_name and 'class' in n.attrs):
            key = ' '.join(el.classes())
            elements_by_class.setdefault(key, []).append(el)
    for lst in (n for n in root.walk() if n.tag in ('ul', 'ol')):
        key = ' '.join(lst.classes())
        lis = [n for n in lst.walk() if n.tag == 'li']
        elements_by_class.setdefault(key, []).extend(lis)
    groups = [(k, v) for k, v in elements_by_class.items() if len(v) > 1]
    return sorted(groups, key=lambda kv: len(kv[1]), reverse=True)


def _match_token(attribute, value):
    return attribute.lower() in value.lower() or \
        value.lower() in attribute.lower()


def find_by_exact_match(container, attribute):
    """general_parser.py:558-612: DFS over direct children — recurse
    into container-tags-with-children FIRST, then check the child's own
    class tokens / id / name / data-* (substring, both directions).
    Returns (node, path) where path = [container-level nodes..., hit]."""
    for child in container.element_children():
        if child.tag in CONTAINER_TAGS and child.element_children():
            hit = find_by_exact_match(child, attribute)
            if hit:
                node, path = hit
                return node, [child] + path
        for cls in child.classes():
            if _match_token(attribute, cls) and clean_text(child):
                return child, [child]
        tid = child.attrs.get('id', '')
        if tid and _match_token(attribute, tid) and clean_text(child):
            return child, [child]
        tname = child.attrs.get('name', '')
        if tname and _match_token(attribute, tname) and clean_text(child):
            return child, [child]
        for k, v in child.attrs.items():
            if k.startswith('data-') and v and _match_token(attribute, v) \
                    and clean_text(child):
                return child, [child]
    return None


def find_attribute_value(container, attribute):
    """general_parser.py:460-512 (deterministic mode: no model).
    Returns (value, path) or None."""
    al = attribute.lower()
    if any(k in al for k in IMAGE_KEYWORDS):
        img = next((n for n in container.walk()
                    if n.tag == 'img' and n.attrs.get('src')), None)
        return (img.attrs['src'], [img]) if img else None
    if any(k in al for k in LINK_KEYWORDS):
        a = next((n for n in container.walk()
                  if n.tag == 'a' and n.attrs.get('href')), None)
        return (a.attrs['href'], [a]) if a else None
    hit = find_by_exact_match(container, attribute)
    if hit:
        node, path = hit
        return clean_text(node), path
    return None


def replay_path_chain(container, path, attribute):
    """general_parser.py:364-457: walk the recorded chain level by
    level with recursive=False, matching on the recorded attrs minus
    ATTRIBUTES_MAY_CONTAIN_VALUES; ties → most attrs equal."""
    current = container
    for tmpl in path:
        want = {k: v for k, v in tmpl.attrs.items()
                if k not in ATTRS_MAY_CONTAIN_VALUES}
        cands = [c for c in current.element_children() if c.tag == tmpl.tag
                 and all(c.attrs.get(k) == v for k, v in want.items())]
        if not cands:
            return None
        if len(cands) == 1:
            current = cands[0]
        else:
            current = max(cands, key=lambda c: sum(
                1 for k, v in want.items() if c.attrs.get(k) == v))
    al = attribute.lower()
    if any(k in al for k in IMAGE_KEYWORDS):
        return current.attrs.get('src') or current.attrs.get('srcset')
    if any(k in al for k in LINK_KEYWORDS):
        return current.attrs.get('href')
    return clean_text(current)


def derive(path, attributes):
    src = open(path, encoding='utf-8', errors='replace').read()
    tb = TreeBuilder()
    tb.feed(src)
    root = tb.root
    unwrap_text_property_tags(root)

    groups = find_repeated_structures(root)
    print(f"{len(groups)} groups; top 25 by size (size desc, stable):")
    for i, (k, v) in enumerate(groups[:25]):
        print(f"  g{i}: n={len(v)} first=<{v[0].tag}> class={k[:70]!r}")

    filled, confs, first_attrs = {}, {}, {}
    for gi, (k, els) in enumerate(groups):
        vals = {a: find_attribute_value(els[0], a) for a in attributes}
        found = sum(1 for v in vals.values() if v is not None)
        if found >= max(1, len(attributes) // 2):
            filled[gi] = found
            confs[gi] = found / len(attributes)  # exact matches score 1.0
            first_attrs[gi] = vals
            print(f"  QUALIFIES g{gi} ({k[:60]!r} n={len(els)}): "
                  f"found={found} conf={confs[gi]}")
            if found == len(attributes):
                print("  early stop: all attrs high confidence")
                break

    best, hi_count, hi_conf = 0, 0, 0.0
    for gi, count in filled.items():
        c = confs[gi]
        if c > hi_conf:
            hi_conf, best = c, gi              # count NOT updated (quirk)
        elif c == hi_conf:
            if count > hi_count:
                hi_count, best = count, gi
            elif count == hi_count and len(groups[gi][1]) > len(groups[best][1]):
                best = gi
    if hi_conf < 0.4:
        print("no group ≥ 0.4 → likely-container fallback")
        return
    k, els = groups[best]
    print(f"WINNER g{best}: class={k!r} n={len(els)}")

    chains = {a: p for a, (v, p) in
              ((a, fv) for a, fv in first_attrs[best].items()
               if fv is not None)}
    records = []
    for i, el in enumerate(els):
        if i == 0:
            rec = {a: (fv[0] if fv else None)
                   for a, fv in first_attrs[best].items()}
        else:
            rec = {}
            for a, p in chains.items():
                v = replay_path_chain(el, p, a)
                if v is None:
                    fb = find_attribute_value(el, a)
                    v = fb[0] if fb else None
                rec[a] = v
        if any(v for v in rec.values()):
            records.append(rec)
    print(f"{len(records)} records")
    print(json.dumps(records, indent=None))


if __name__ == '__main__':
    derive(sys.argv[1], [a.strip() for a in sys.argv[2].split(',')])
