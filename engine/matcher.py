"""Pluggable similarity matcher for the semantic tiers (SURVEY.md §7.2.4).

The reference gates three extraction tiers behind a sentence-
transformer model (T3 semantic header match ``table_parser.py:175-196``,
G8 recursive similarity search ``general_parser.py:645-797``, J5
semantic key match ``json_script_parser.py:425-479``).  When the model
is absent it degrades to exact/substring-only — the deterministic
configuration this rebuild pins parity on.

This module makes the tier pluggable:

* ``None`` (default) — model absent; tiers are no-ops, byte-parity
  with the reference's degraded mode.
* :class:`TokenSimilarityMatcher` — a deterministic, dependency-free
  matcher (token/char-trigram Jaccard) used to exercise and test the
  FULL semantic code paths (recursion, fallbacks, penalties) without
  model weights.
* :class:`EmbeddingMatcher` — the production hook: wraps any
  ``encode(list[str]) -> ndarray`` callable (e.g. a broadcast
  sentence-transformer on the executors).  Scores are cached per
  unique string pair per TASK (bounded; cleared when the cap is hit) —
  the reference re-encodes inside its per-container recursion
  (``general_parser.py:702-703``), which is exactly the inefficiency
  SURVEY.md §4.1 says not to replicate.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple


class Matcher:
    """Interface: similarity in [0, 1] + argmax over candidates."""

    def similarity(self, a: str, b: str) -> float:  # pragma: no cover
        raise NotImplementedError

    def best_match(self, query: str,
                   candidates: Sequence[str]) -> Tuple[Optional[int], float]:
        """Argmax candidate index + score (ties → first, mirroring
        numpy argmax in the reference)."""
        best_idx, best_score = None, 0.0
        for i, cand in enumerate(candidates):
            score = self.similarity(query, cand)
            if best_idx is None or score > best_score:
                best_idx, best_score = i, score
        return best_idx, best_score


def _trigrams(s: str) -> set:
    s = s.lower().strip()
    if len(s) < 3:
        return {s} if s else set()
    return {s[i:i + 3] for i in range(len(s) - 2)}


class TokenSimilarityMatcher(Matcher):
    """Deterministic similarity: max of word-Jaccard and char-trigram
    Jaccard, exact match = 1.0.  A model-free stand-in with the same
    range/argmax contract as cosine over embeddings."""

    _MAX_CACHE = 200_000  # bound per-task memory on high-cardinality text

    def __init__(self):
        self._cache: dict = {}

    def similarity(self, a: str, b: str) -> float:
        if not a or not b:
            return 0.0
        key = (a, b)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        if len(self._cache) >= self._MAX_CACHE:
            self._cache.clear()
        al, bl = a.lower().strip(), b.lower().strip()
        if al == bl:
            score = 1.0
        else:
            wa, wb = set(al.split()), set(bl.split())
            wj = len(wa & wb) / len(wa | wb) if wa | wb else 0.0
            ta, tb = _trigrams(al), _trigrams(bl)
            tj = len(ta & tb) / len(ta | tb) if ta | tb else 0.0
            score = max(wj, tj)
        self._cache[key] = score
        return score


class EmbeddingMatcher(Matcher):
    """Wraps an ``encode(list[str]) -> list[vector]`` callable (a
    broadcast model on executors).  Unique strings are embedded once
    per matcher instance (per Arrow batch in practice)."""

    _MAX_CACHE = 50_000  # bound per-task memory on high-cardinality text

    def __init__(self, encode: Callable[[List[str]], "object"]):
        self._encode = encode
        self._vecs: dict = {}

    def _vec(self, s: str):
        v = self._vecs.get(s)
        if v is None:
            if len(self._vecs) >= self._MAX_CACHE:
                self._vecs.clear()
            v = self._encode([s])[0]
            self._vecs[s] = v
        return v

    def similarity(self, a: str, b: str) -> float:
        if not a or not b:
            return 0.0
        va, vb = self._vec(a), self._vec(b)
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        if na == 0 or nb == 0:
            return 0.0
        return dot / (na * nb)
