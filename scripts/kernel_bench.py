"""Single-core kernel microbenchmark — isolates pure extraction cost
from Spark overheads for regression tracking across rounds.

Run: python scripts/kernel_bench.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.parser import extract_turn  # noqa: E402
from engine.query_parse import parse_query_hybrid  # noqa: E402


def _families():
    def item(d, t, i):
        return (f'<div class="item"><p class="name">Doc {d}-{t}-{i}</p>'
                f'<p class="price">£{1000 + (d * 3 + t + i) % 9000}</p></div>')

    def gen(d, t):
        return ('<html><body><div class="grid">'
                + "".join(item(d, t, i) for i in range(5))
                + '</div><p>filler words here</p></body></html>')

    def tab(d, t):
        rows = "".join(
            f"<tr><td>Doc {d}-{t}-{i}</td><td>£{1000 + (d * 3 + t + i) % 9000}</td></tr>"
            for i in range(5))
        return ("<html><body><table><thead><tr><th>name</th><th>price</th>"
                f"</tr></thead><tbody>{rows}</tbody></table></body></html>")

    def js(d, t):
        items = ", ".join(
            f'{{"name": "Doc {d}-{t}-{i}", "price": "£{1000 + (d * 3 + t + i) % 9000}"}}'
            for i in range(5))
        return ('<html><head><script type="application/ld+json">'
                f'{{"book": [{items}]}}</script></head><body><p>x</p></body></html>')

    return gen, tab, js


def main() -> int:
    parsed = parse_query_hybrid("Can you give me the book: name and price?")
    gen, tab, js = _families()
    texts = [f(d, fam) for d in range(300) for fam, f in enumerate((gen, tab, js))]
    big = open("/root/reference/samples/books.html").read() \
        if os.path.exists("/root/reference/samples/books.html") else gen(0, 0) * 40

    # warm
    for t in texts[:100]:
        extract_turn(t, parsed)

    best_small = 0.0
    best_big = float("inf")
    for _ in range(3):
        t0 = time.time()
        for t in texts:
            extract_turn(t, parsed)
        best_small = max(best_small, len(texts) / (time.time() - t0))
        t0 = time.time()
        for _ in range(20):
            extract_turn(big, parsed)
        best_big = min(best_big, (time.time() - t0) / 20 * 1000)

    # round-2 kernels: boilerplate strip + PDF text, same protocol
    from engine.boilerplate import extract_main_text
    from engine.pdf import extract_pdf_text
    for t in texts[:50]:
        extract_main_text(t)
    best_bp = 0.0
    for _ in range(3):
        t0 = time.time()
        for t in texts:
            extract_main_text(t)
        best_bp = max(best_bp, len(texts) / (time.time() - t0))
    bp_big = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(20):
            extract_main_text(big)
        bp_big = min(bp_big, (time.time() - t0) / 20 * 1000)
    pdf = (b"%PDF-1.4\n1 0 obj << >> stream\nBT " + b" ".join(
        b"(line %d, with text content) Tj 0 -14 Td" % i for i in range(40))
        + b" ET\nendstream endobj")
    best_pdf = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(2000):
            extract_pdf_text(pdf)
        best_pdf = max(best_pdf, 2000 / (time.time() - t0))

    print(json.dumps({
        "small_turns_per_sec_1core": round(best_small, 1),
        "big_page_ms": round(best_big, 2),
        "big_page_bytes": len(big),
        "big_page_mb_per_sec_1core": round(len(big) / 1e6 / (best_big / 1000), 2),
        "boilerplate_small_per_sec_1core": round(best_bp, 1),
        "boilerplate_big_page_ms": round(bp_big, 2),
        "pdf_docs_per_sec_1core": round(best_pdf, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
