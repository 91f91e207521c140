"""CLI entry (library-surface parity with the reference's /parse):

    python -m engine "Can you give me the book: name and price?" page.html
    cat page.html | python -m engine "query" -

Prints the reference-shaped JSON response envelope.
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: python -m engine <query> <html-file|->", file=sys.stderr)
        return 2
    query, path = argv
    if len(query) > 1000:  # ref app.py:88-89
        print(json.dumps({"results": {}, "message":
                          "Query too long (max 1000 characters)",
                          "metadata": {"error": True}}))
        return 1
    if path == "-":
        html = sys.stdin.read()
    else:
        with open(path, encoding="utf-8", errors="replace") as f:
            html = f.read()

    from engine.parser import parse

    print(json.dumps(parse(html, query), ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
