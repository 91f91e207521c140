"""Natural-language query → (entity, attributes).

Rule-based parser replicating the deterministic surface of the
reference (operators Q1-Q9, Q11 of SURVEY.md §2.2):

* normalize  — ``rule_base_query_parser.py:87-98``
* stopword strip + "the X" pattern + simple-heuristic fallback —
  ``rule_base_query_parser.py:100-139``
* attribute extraction / token cleaning —
  ``rule_base_query_parser.py:199-261``
* hybrid policy — ``ml_query_parser.py:153-191``; with no ML model
  present the reference always returns the rule-based result
  (``ml_query_parser.py:189-191``), which is the deterministic
  configuration this rebuild pins parity against (SURVEY.md §5.2).

The POS-tagging tier (Q4) is rebuilt dependency-free in
``engine/postag.py``: ``nltk`` is a HARD dependency of the reference
(``requirements.txt``), so a stock install runs POS tagging for every
query lacking a "the X" pattern (``rule_base_query_parser.py:125-131``)
— the simple heuristic only fires when tagging yields no noun.  The
tier is ON by default (stock-reference parity); ``use_pos=False``
selects the NLTK-absent degraded mode
(``rule_base_query_parser.py:41-42,131-137``).

The query is parsed ONCE on the driver and broadcast into the
extraction UDF (SURVEY.md §3.5) — this module never touches Spark.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from engine import nouns

FRONT_STOPWORDS = {
    "get", "list", "return", "give", "show", "please", "from", "me", "can", "you",
    "extract", "find", "retrieve", "fetch", "obtain", "collect", "gather", "pull",
    "the", "all", "any", "some", "what", "which", "how", "where", "their", "its",
    "a", "an", "this", "that", "these", "those",
}

END_STOPWORDS = {
    "from", "in", "on", "at", "of", "for", "with", "by", "to", "into",
    "the", "page", "website", "document", "html", "content", "listings",
    "items", "elements", "data", "information",
}

_CONNECTOR_RE = re.compile(r"\b(and|with|including|such as|like)\b")
_TRAILING_PUNCT_RE = re.compile(r"[.!?]+$")
_ARTICLE_PREFIX_RE = re.compile(r"^(its?|their|the|a|an)\s+")


@dataclass
class ParsedQuery:
    """Driver-side parse result, broadcast into the extraction kernel."""

    entity: Optional[str] = None
    attributes: List[str] = field(default_factory=list)
    method: str = "rule-based"
    entity_approach: str = ""
    attribute_approach: str = ""


def clean_query(query: str) -> str:
    """Q1 — lowercase, strip trailing [.!?]+, drop '?', ':'→space."""
    query = query.lower().strip()
    query = _TRAILING_PUNCT_RE.sub("", query)
    return query.replace("?", "").replace(":", " ")


def extract_entity(cleaned_query: str,
                   use_pos: bool = True) -> Tuple[Optional[str], str]:
    """Q2-Q5 — stopword strip, "the X" pattern, POS-tagging tier,
    simple-heuristic fallback (ref rule_base_query_parser.py:100-139)."""
    words = cleaned_query.split()

    front = FRONT_STOPWORDS - {"the"}
    while words and words[0] in front:
        words.pop(0)
    end = END_STOPWORDS - {"the"}
    while words and words[-1] in end:
        words.pop()

    # QUIRK carried verbatim: the reference returns a BARE None (not a
    # tuple) on every no-entity path (rule_base_query_parser.py:118,
    # :139), so the caller's tuple unpack raises TypeError and the
    # request surfaces as the "Parsing error: cannot unpack
    # non-iterable NoneType object" envelope (intelligent_parser.py:
    # 182-188) — never as the clean "Could not extract..." message.
    if not words:
        return None

    for i, word in enumerate(words):
        if word == "the" and i + 1 < len(words):
            return nouns.singularize(words[i + 1]), "the-pattern"

    # Q4 — POS tier runs on the FULL cleaned query, not the stripped
    # words (ref rule_base_query_parser.py:127); deterministic rebuild
    # in engine/postag.py.  use_pos=False is the NLTK-absent mode.
    if use_pos:
        from engine import postag
        entity = postag.extract_entity_pos(
            cleaned_query, FRONT_STOPWORDS, END_STOPWORDS)
        if entity:
            return entity, "pos-tagging"

    for word in words:
        if word not in FRONT_STOPWORDS and word not in END_STOPWORDS:
            if len(word) > 2:
                return nouns.singularize(word), "simple-heuristic"

    return None  # bare None — see the quirk note above


def clean_attribute(attribute: str) -> Optional[str]:
    """Q7 — drop stopwords, strip article prefixes, min length 2."""
    cleaned_words = []
    for word in attribute.split():
        if word not in FRONT_STOPWORDS and word not in END_STOPWORDS:
            word = _ARTICLE_PREFIX_RE.sub("", word)
            if word and len(word) > 1:
                cleaned_words.append(word)
    if not cleaned_words:
        return None
    result = " ".join(cleaned_words)
    if len(result) < 2:
        return None
    return result


def extract_attributes(cleaned_query: str, entity: Optional[str]) -> Tuple[List[str], str]:
    """Q6 — remove entity±plural, map connectors to commas, split, dedup."""
    query = cleaned_query
    if entity:
        plural = nouns.pluralize(entity)
        for pattern in (entity, plural, "the " + entity, "the " + plural):
            query = query.replace(pattern, "")

    query = _CONNECTOR_RE.sub(",", query)

    attributes: List[str] = []
    for part in (p.strip() for p in query.split(",")):
        if not part:
            continue
        for sub_part in (s.strip() for s in part.split(" and ")):
            if not sub_part:
                continue
            cleaned = clean_attribute(sub_part)
            if cleaned and cleaned not in attributes:
                attributes.append(cleaned)
    return attributes, "rule-based"


def parse_query(query: str, use_pos: bool = True) -> ParsedQuery:
    """Full rule-based parse (ref rule_base_query_parser.py:66-85).

    Raises TypeError for entity-less queries — the reference's own
    behavior (bare-None unpack, rule_base_query_parser.py:80,118,139);
    callers that need an envelope catch it exactly where the reference
    does (engine/parser.py, engine/extract.py)."""
    cleaned = clean_query(query)
    entity, entity_approach = extract_entity(cleaned, use_pos=use_pos)
    attributes, attr_approach = extract_attributes(cleaned, entity)
    return ParsedQuery(
        entity=entity,
        attributes=attributes,
        method="rule-based",
        entity_approach=entity_approach,
        attribute_approach=attr_approach,
    )


def parse_query_hybrid(query: str, min_attributes: int = 2,
                       use_pos: bool = True) -> ParsedQuery:
    """Q11 — hybrid policy in the deterministic (no-ML) configuration.

    Ref ``ml_query_parser.py:153-191``: the ML fallback only fires when
    a seq2seq model is available; otherwise every branch returns the
    rule-based result, so the policy collapses to the rule parse.  The
    ``min_attributes`` parameter is retained for the pluggable ML hook.
    """
    return parse_query(query, use_pos=use_pos)
