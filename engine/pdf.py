"""Minimal PDF text extraction (north-star "PDF/layout parse" axis).

No PDF library ships in this environment, so this is a from-scratch,
dependency-free extractor for the SIMPLE-PDF subset, with honest
limits (documented, tested):

supported
  * unencrypted PDFs; content streams stored plain or FlateDecode
    (stdlib ``zlib``);
  * text-showing operators ``Tj``, ``'``, ``"`` and ``TJ`` arrays
    (kerning numbers ignored; a gap ≤ -180 text-space units emits a
    space, the common word-break convention);
  * literal strings with ``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r``
    ``\\t`` and octal escapes, and hex strings ``<...>`` (single-byte,
    latin-1);
  * line structure: ``Td``/``TD``/``T*``/``'``/``\"`` start a new
    line; ``BT`` blocks are separated by newlines.

not supported (extractor returns ok=false rather than garbage)
  * encrypted documents (``/Encrypt`` in any trailer);
  * CID/Type0 composite fonts are NOT detected — multi-byte text
    decodes as latin-1 mojibake; callers needing CID fidelity must
    pre-filter (this is the same failure mode pdfminer has without
    a ToUnicode map).

The extractor scans ``N G obj ... endobj`` objects directly instead
of walking the xref table — resilient to the truncated/appended files
common in crawled corpora (an invalid xref does not block text
recovery).

Spark surface: :func:`parse_pdf_turns` — Arrow-batched ``mapInPandas``
over a binary column, same row→row kernel shape as extract_turns.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, List, Tuple

_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream",
    re.DOTALL)
_TEXT_OP_RE = re.compile(
    rb"(?P<str>\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(?P<op>Tj|'|\")"
    rb"|\[(?P<arr>(?:[^][\\]|\\.|\((?:[^()\\]|\\.)*\))*)\]\s*TJ"
    rb"|(?P<nl>T\*|Td|TD)")
_ARR_ITEM_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|-?\d+(?:\.\d+)?")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _decode_literal(raw: bytes) -> bytes:
    """PDF literal string body (no outer parens) → bytes."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_string_token(tok: bytes) -> bytes:
    if tok.startswith(b"("):
        return _decode_literal(tok[1:-1])
    hexbody = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexbody) % 2:
        hexbody += b"0"
    return bytes.fromhex(hexbody.decode("ascii"))


def _stream_text(content: bytes) -> str:
    """Text-showing operators of one content stream → text."""
    lines: List[str] = []
    cur: List[str] = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for m in _TEXT_OP_RE.finditer(content):
        if m.group("nl") is not None:
            flush()
            continue
        if m.group("str") is not None:
            if m.group("op") in (b"'", b'"'):
                flush()
            cur.append(_decode_string_token(m.group("str"))
                       .decode("latin-1"))
            continue
        arr = m.group("arr")
        if arr is not None:
            parts: List[str] = []
            for item in _ARR_ITEM_RE.finditer(arr):
                tok = item.group(0)
                if tok.startswith((b"(", b"<")):
                    parts.append(_decode_string_token(tok)
                                 .decode("latin-1"))
                else:
                    # large negative kerning = inter-word gap
                    if float(tok) <= -180:
                        parts.append(" ")
            cur.append("".join(parts))
    flush()
    return "\n".join(line for line in lines if line)


def extract_pdf_text(data: bytes) -> Tuple[str, bool]:
    """(text, ok).  ok=False → unsupported document (encrypted or no
    recoverable content stream); text is best-effort either way."""
    if not data or b"%PDF" not in data[:1024]:
        return "", False
    if b"/Encrypt" in data:
        return "", False
    texts: List[str] = []
    for m in _STREAM_RE.finditer(data):
        body = m.group("body")
        if b"/FlateDecode" in m.group("dict"):
            try:
                body = zlib.decompress(body.strip(b"\r\n"))
            except zlib.error:
                continue
        if b"BT" not in body:
            continue
        text = _stream_text(body)
        if text:
            texts.append(text)
    joined = "\n".join(texts)
    return joined, bool(joined)


def parse_pdf_turns(df, binary_col: str = "payload"):
    """Spark operator: (conv_id, turn_idx, role, <binary_col>) →
    extracted text + ok flag + char count.  Pure row map (no shuffle),
    Arrow-batched; unsupported documents produce ok=false rows rather
    than task failures, so one bad file can't kill a 10^12-turn job."""
    import pandas as pd
    from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("pdf_text", StringType()),
        StructField("pdf_ok", BooleanType()),
        StructField("n_chars", IntegerType()),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            texts, oks, lens = [], [], []
            for data in batch[binary_col]:
                try:
                    text, ok = extract_pdf_text(bytes(data or b""))
                except Exception:
                    text, ok = "", False
                texts.append(text)
                oks.append(ok)
                lens.append(len(text))
            yield pd.DataFrame({
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "pdf_text": texts,
                "pdf_ok": oks,
                "n_chars": pd.Series(lens, dtype="int32"),
            })

    pruned = df.select("conv_id", "turn_idx", "role", binary_col)
    return pruned.mapInPandas(run, schema=schema)
