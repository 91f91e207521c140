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


def matcher_factory_from_name(name: Optional[str]):
    """Named matcher configurations for JobConfig / CLI surfaces.

    * ``none`` / None / '' — semantic tiers off (the parity-pinned
      degraded mode);
    * ``token`` — :class:`TokenSimilarityMatcher`, the supported
      deterministic matcher-on configuration (goldens in
      ``goldens/samples_snapshot_semantic.json``).

    :class:`EmbeddingMatcher` needs an ``encode`` callable (a broadcast
    model), so it is wired programmatically via
    ``extract_turns(matcher_factory=...)`` rather than by name.
    Returns an executor-side ``() -> Matcher`` factory or None.
    """
    if not name or name == "none":
        return None
    if name == "token":
        return TokenSimilarityMatcher
    raise ValueError(f"unknown matcher {name!r} (expected none|token)")


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
    broadcast model on executors).  Unique strings are embedded in
    BATCHES: every similarity/argmax entry point first collects its
    cache misses and issues one ``encode`` call for all of them —
    never one model round-trip per string (the per-item-encode
    anti-pattern SURVEY.md §4.1 bans; the reference re-encodes inside
    its per-container recursion, ``general_parser.py:702-703``)."""

    _MAX_CACHE = 50_000  # bound per-task memory on high-cardinality text

    def __init__(self, encode: Callable[[List[str]], "object"]):
        self._encode = encode
        self._vecs: dict = {}

    def prime(self, strings: Sequence[str]) -> None:
        """Encode every not-yet-cached string in ONE model call."""
        misses = [s for s in dict.fromkeys(strings)
                  if s and s not in self._vecs]
        if not misses:
            return
        if len(self._vecs) + len(misses) > self._MAX_CACHE:
            self._vecs.clear()
        for s, v in zip(misses, self._encode(misses)):
            self._vecs[s] = v

    def _vec(self, s: str):
        v = self._vecs.get(s)
        if v is None:
            self.prime([s])
            v = self._vecs[s]
        return v

    def best_match(self, query: str,
                   candidates: Sequence[str]) -> Tuple[Optional[int], float]:
        # one encode call covers the query and every candidate before
        # the scoring loop runs
        self.prime([query, *candidates])
        return super().best_match(query, candidates)

    def similarity(self, a: str, b: str) -> float:
        if not a or not b:
            return 0.0
        self.prime([a, b])
        va, vb = self._vec(a), self._vec(b)
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        if na == 0 or nb == 0:
            return 0.0
        return dot / (na * nb)
