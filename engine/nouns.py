"""Singular/plural noun rules.

Reproduces the observable rules of the reference's
``/root/reference/src/utils/noun.py:1-96`` (irregulars table + suffix
rules).  These feed entity normalization in the query parser
(``rule_base_query_parser.py:122``) and the response message
pluralization (``intelligent_parser.py:194-197``).
"""

from __future__ import annotations

_IRREGULAR_PLURALS = {
    "children": "child",
    "people": "person",
    "men": "man",
    "women": "woman",
    "feet": "foot",
    "teeth": "tooth",
    "mice": "mouse",
    "geese": "goose",
}

_IRREGULAR_SINGULARS = {v: k for k, v in _IRREGULAR_PLURALS.items()}


def singularize(noun: str) -> str:
    """Plural → singular (ref noun.py:1-49)."""
    if not noun:
        return noun
    if noun in _IRREGULAR_PLURALS:
        return _IRREGULAR_PLURALS[noun]
    if noun.endswith("ies") and len(noun) > 3:
        return noun[:-3] + "y"
    if noun.endswith("ves") and len(noun) > 3:
        return noun[:-3] + "f"
    if noun.endswith("ses") and len(noun) > 3:
        return noun[:-2]
    if noun.endswith("es") and len(noun) > 2:
        if noun.endswith(("ches", "shes", "xes", "zes")):
            return noun[:-2]
        return noun[:-1]
    if noun.endswith("s") and len(noun) > 1:
        return noun[:-1]
    return noun


def pluralize(noun: str) -> str:
    """Singular → plural (ref noun.py:51-96)."""
    if not noun:
        return noun
    if noun in _IRREGULAR_SINGULARS:
        return _IRREGULAR_SINGULARS[noun]
    if noun.endswith("y") and len(noun) > 2:
        return noun[:-1] + "ies"
    if noun.endswith("f") and len(noun) > 2:
        return noun[:-1] + "ves"
    if noun.endswith("s") and len(noun) > 2:
        return noun
    if noun.endswith("o") and len(noun) > 2:
        return noun + "s"
    if len(noun) > 1:
        return noun + "s"
    return noun
