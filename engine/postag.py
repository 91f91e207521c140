"""Q4 — deterministic POS-tagging entity tier (dependency-free).

The reference's entity ladder is: "the X" pattern → POS tagging →
simple heuristic (``/root/reference/src/parsers/query_parser/
rule_base_query_parser.py:118-137``).  ``nltk`` is a HARD dependency of
the reference (``/root/reference/requirements.txt``), so a stock
install runs the POS tier (``rule_base_query_parser.py:141-197``) for
every query that lacks a "the X" pattern; the simple heuristic is only
the NLTK-absent / tagging-failed fallback.

NLTK cannot ship in this environment, so this module rebuilds the tier
as a deterministic lexicon + suffix-rule tagger that reproduces the
averaged-perceptron tagger's decisions on the query domain.  Queries
are lowercased before tagging (``rule_base_query_parser.py:90``), which
pins the perceptron in a narrow regime:

* lowercase text almost never receives NNP/NNPS (the tagger's
  proper-noun evidence is orthographic), so the reference's
  proper-noun-priority branch (``:181-186``) is structurally present
  here but vacuous — exactly as it is in the stock reference;
* unknown lowercase words default to NN (the perceptron's strongest
  prior), plural-looking unknowns to NNS;
* closed-class words (determiners, prepositions, pronouns, modals,
  auxiliaries, conjunctions) are lexicon entries, as they are for the
  perceptron (its ``tagdict`` pins unambiguous frequent words).

The tokenizer mirrors ``nltk.word_tokenize``'s Treebank behavior on
this domain: punctuation is split off as its own token and standard
contractions are split ("what's" → "what", "'s").

Determinism: pure functions of the input string — no model files, no
randomness, no environment dependence.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from engine import nouns

# ---------------------------------------------------------------------------
# tokenizer (word_tokenize-equivalent on the lowercase query domain)
# ---------------------------------------------------------------------------

_CONTRACTION_RE = re.compile(r"(n't|'s|'re|'ve|'ll|'d|'m)$")
_TOKEN_RE = re.compile(r"[a-z0-9]+(?:[-_.][a-z0-9]+)*'?[a-z0-9]*|[^\sa-z0-9]")


def tokenize(text: str) -> List[str]:
    """Treebank-style tokenization of an already-lowercased query:
    words (hyphen/underscore compounds kept), punctuation as separate
    tokens, contractions split off."""
    out: List[str] = []
    for tok in _TOKEN_RE.findall(text):
        m = _CONTRACTION_RE.search(tok)
        if m and m.start() > 0:
            out.append(tok[: m.start()])
            out.append(m.group(0))
        else:
            out.append(tok)
    return out


# ---------------------------------------------------------------------------
# lexicon (closed classes + frequent query-domain verbs/adjectives)
# ---------------------------------------------------------------------------

_LEXICON = {
    # determiners / articles
    **{w: "DT" for w in ("the", "a", "an", "this", "that", "these", "those",
                         "all", "any", "some", "each", "every", "no", "both")},
    # prepositions / subordinating conjunctions
    **{w: "IN" for w in ("of", "in", "on", "at", "by", "for", "with", "from",
                         "to", "into", "about", "under", "over", "between",
                         "within", "per", "as", "like", "than", "if")},
    # conjunctions
    **{w: "CC" for w in ("and", "or", "but", "nor", "plus")},
    # pronouns
    **{w: "PRP" for w in ("i", "you", "he", "she", "it", "we", "they", "me",
                          "him", "her", "us", "them")},
    **{w: "PRP$" for w in ("my", "your", "his", "its", "our", "their")},
    # wh-words
    **{w: "WDT" for w in ("which", "whatever")},
    "what": "WP", "who": "WP", "whom": "WP", "whose": "WP$",
    "where": "WRB", "when": "WRB", "why": "WRB", "how": "WRB",
    # modals / auxiliaries
    **{w: "MD" for w in ("can", "could", "will", "would", "shall", "should",
                         "may", "might", "must")},
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "being": "VBG", "am": "VBP",
    "do": "VBP", "does": "VBZ", "did": "VBD",
    "has": "VBZ", "have": "VBP", "had": "VBD",
    # imperative query verbs (the reference's FRONT_STOPWORDS verbs and
    # their frequent companions)
    **{w: "VB" for w in ("get", "list", "return", "give", "show", "extract",
                         "find", "retrieve", "fetch", "obtain", "collect",
                         "gather", "pull", "tell", "display", "provide",
                         "want", "need", "see", "grab", "scrape", "parse",
                         "include", "please")},
    "including": "VBG",
    # frequent adjectives of the query domain (the perceptron tags these
    # JJ; without lexicon entries the NN default would mis-fire)
    **{w: "JJ" for w in ("available", "detailed", "top", "best", "new",
                         "latest", "current", "full", "main", "cheap",
                         "expensive", "recent", "popular", "average",
                         "total", "free", "open", "good", "high", "low",
                         "several", "other", "relevant", "specific",
                         "important", "complete")},
    # adverbs
    **{w: "RB" for w in ("not", "also", "only", "just", "here", "there",
                         "now", "then", "too", "very", "well")},
    # nouns that suffix rules would mis-tag (verb-looking or -ing/-ed
    # endings; the perceptron knows these from its tagdict)
    **{w: "NN" for w in ("listing", "rating", "pricing", "building",
                         "heading", "ranking", "booking", "training",
                         "meeting", "housing", "shipping", "opening",
                         "earning", "wedding", "finding", "warning",
                         "morning", "evening", "everything", "something",
                         "anything", "nothing", "bed", "speed", "breed",
                         "seed", "feed", "deed")},
    **{w: "NNS" for w in ("listings", "ratings", "earnings", "savings",
                          "belongings", "findings", "headings", "bookings",
                          "meetings", "buildings", "openings", "beds",
                          "speeds", "breeds", "seeds", "feeds", "deeds")},
    "news": "NN", "series": "NN", "species": "NN",
}

_PUNCT_TAG = {",": ",", ".": ".", ":": ":", ";": ":", "?": ".", "!": ".",
              "(": "(", ")": ")", "\"": "''", "'": "''", "`": "``",
              "$": "$", "#": "#", "%": "NN", "&": "CC", "-": ":", "/": ":"}

_NUM_RE = re.compile(r"^\d+(\.\d+)?$")


def _suffix_tag(word: str) -> str:
    """Unknown-word rules, ordered to mirror the perceptron's suffix
    features: -ing → VBG, -ed → VBN, -ly → RB, adjectival suffixes →
    JJ, plural-looking → NNS, default NN."""
    if word.endswith("ing") and len(word) > 4:
        return "VBG"
    if word.endswith("ed") and len(word) > 3:
        return "VBN"
    if word.endswith("ly") and len(word) > 3:
        return "RB"
    for suf in ("able", "ible", "ous", "ful", "ive", "ic", "al"):
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return "JJ"
    if word.endswith("est") and len(word) > 4:
        return "JJS"
    if (word.endswith("s") and len(word) > 3
            and not word.endswith(("ss", "us", "is"))):
        return "NNS"
    return "NN"


def pos_tag(tokens: List[str]) -> List[Tuple[str, str]]:
    """Deterministic tag per token: punctuation table → lexicon →
    number → suffix rules."""
    tagged = []
    for tok in tokens:
        if tok in _PUNCT_TAG:
            tag = _PUNCT_TAG[tok]
        elif tok in _LEXICON:
            tag = _LEXICON[tok]
        elif _NUM_RE.match(tok):
            tag = "CD"
        else:
            tag = _suffix_tag(tok)
        tagged.append((tok, tag))
    return tagged


def extract_entity_pos(cleaned_query: str,
                       front_stopwords: set, end_stopwords: set
                       ) -> Optional[str]:
    """Q4 — noun selection over the FULL cleaned query (the reference
    passes the un-stripped query to the POS tier,
    ``rule_base_query_parser.py:127``): skip stopwords and words
    shorter than 3 chars, prefer proper nouns (vacuous on lowercase
    input) then common nouns, take the first, singularize
    (``rule_base_query_parser.py:141-197``)."""
    tokens = tokenize(cleaned_query)
    tagged = pos_tag(tokens)

    proper_nouns: List[str] = []
    common_nouns: List[str] = []
    for word, tag in tagged:
        word_lower = word.lower()
        if word_lower in front_stopwords or word_lower in end_stopwords:
            continue
        if len(word) < 3:
            continue
        if tag in ("NNP", "NNPS"):
            proper_nouns.append(word_lower)
        elif tag in ("NN", "NNS"):
            common_nouns.append(word_lower)

    candidates = proper_nouns + common_nouns
    if candidates:
        return nouns.singularize(candidates[0])
    return None
