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
GOLDENS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens", "samples_snapshot.json")

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


def build() -> dict:
    out = {}
    for fname, query in CASES:
        with open(os.path.join(SAMPLES_DIR, fname), encoding="utf-8",
                  errors="replace") as f:
            html = f.read()
        resp = parser.parse(html, query)
        out[f"{fname}::{query}"] = {
            "message": resp["message"],
            "results": resp["results"],
            "strategy": resp["metadata"]["approaches_used"]["html_parsing"]
            if "approaches_used" in resp.get("metadata", {}) else None,
        }
    return out


def main() -> int:
    snapshot = build()
    if "--check" in sys.argv:
        with open(GOLDENS_PATH) as f:
            expected = json.load(f)
        if snapshot != expected:
            print("GOLDEN MISMATCH")
            return 1
        print("goldens match")
        return 0
    os.makedirs(os.path.dirname(GOLDENS_PATH), exist_ok=True)
    with open(GOLDENS_PATH, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDENS_PATH} with {len(snapshot)} cases")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
