"""Generate snapshot goldens: engine output over the reference's own
fixture corpus (/root/reference/samples, read-only) × FIXTURES.md §2
queries.

The reference itself cannot execute in this sandbox (its bs4/flask
dependency stack is absent), so per-turn parity is established by
(a) kernel-level unit tests against the reference's inline test cases
and (b) these committed snapshots, which pin the deterministic
configuration's output byte-for-byte against regressions.  Run with
``python scripts/gen_goldens.py --check`` to verify instead of write.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import parser  # noqa: E402

SAMPLES_DIR = "/root/reference/samples"
_GOLDENS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens")
GOLDENS_PATH = os.path.join(_GOLDENS_DIR, "samples_snapshot.json")
# matcher-on configuration (JobConfig(matcher='token')): same fixture
# corpus through the TokenSimilarityMatcher so the semantic tiers (T3/
# G8/J5) are a pinned, supported mode — not just a test-only path
GOLDENS_SEMANTIC_PATH = os.path.join(
    _GOLDENS_DIR, "samples_snapshot_semantic.json")

# fixture family × query pairs (FIXTURES.md §2/§3)
CASES = [
    ("two-books.html", "Can you give me the book: name and price?"),
    ("books.html", "Can you give me the book: name and price?"),
    ("books.html", "List book title, price and availability"),
    ("single-book.html", "Can you give me the book: name and price?"),
    ("book-simple.html", "Can you give me the book: name and price?"),
    ("tables.html", "Can you give me the book: name and price?"),
    ("tables-without-thead.html", "Can you give me the book: name and price?"),
    ("ecommerce.html", "Get the product name, price, and description"),
    ("products.html", "Get the product name, price, and description"),
    ("jobs.html", "Extract job title, location, salary, and company name from the listings"),
    ("two-jobs.html", "Extract job title, location, salary, and company name from the listings"),
    ("clubs.html", "Extract club name, image and link"),
    ("two-clubs.html", "Extract club name, image and link"),
    ("properties.html", "Get the property name, price, and address"),
    ("property.html", "Get the property name, price, and address"),
    ("property.html", "Get the property title and price"),
    ("application-ldjson.json", "Get the property name, price, and address"),
    # broadened surface: image/link ladders, availability, ratings,
    # single-attr queries, table-vs-general dispatch
    ("books.html", "Get the book image and price"),
    ("clubs.html", "Extract club link and image"),
    ("two-clubs.html", "Extract club name and link"),
    ("single-book.html", "Get the book availability and price"),
    ("ecommerce.html", "Get the product description"),
    ("products.html", "List product name and description"),
    ("two-jobs.html", "Get the job description and title"),
    ("tables.html", "Get the person name and age"),
    ("tables-without-thead.html", "Get the person name and age"),
    ("book-simple.html", "Get the book title, price and image"),
]


def build(matcher=None) -> dict:
    out = {}
    for fname, query in CASES:
        with open(os.path.join(SAMPLES_DIR, fname), encoding="utf-8",
                  errors="replace") as f:
            html = f.read()
        resp = parser.parse(html, query, matcher=matcher)
        out[f"{fname}::{query}"] = {
            "message": resp["message"],
            "results": resp["results"],
            "strategy": resp["metadata"]["approaches_used"]["html_parsing"]
            if "approaches_used" in resp.get("metadata", {}) else None,
        }
    return out


def build_semantic() -> dict:
    from engine.matcher import TokenSimilarityMatcher
    return build(matcher=TokenSimilarityMatcher())


def main() -> int:
    snapshots = [(GOLDENS_PATH, build()),
                 (GOLDENS_SEMANTIC_PATH, build_semantic())]
    if "--check" in sys.argv:
        for path, snapshot in snapshots:
            with open(path) as f:
                expected = json.load(f)
            if snapshot != expected:
                print(f"GOLDEN MISMATCH: {path}")
                return 1
        print("goldens match")
        return 0
    os.makedirs(_GOLDENS_DIR, exist_ok=True)
    for path, snapshot in snapshots:
        with open(path, "w") as f:
            json.dump(snapshot, f, indent=1, sort_keys=True)
        print(f"wrote {path} with {len(snapshot)} cases")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
