"""PDF text extraction (engine/pdf.py) — the north-star "PDF/layout
parse" axis, dependency-free simple-PDF subset."""

import zlib

import pytest

from engine.pdf import extract_pdf_text, parse_pdf_turns


def _pdf(*streams: bytes, flate: bool = False) -> bytes:
    """Assemble a minimal PDF-ish document from content streams (the
    extractor scans objects directly; no xref needed)."""
    parts = [b"%PDF-1.4\n"]
    for i, body in enumerate(streams):
        extra = b""
        if flate:
            body = zlib.compress(body)
            extra = b" /Filter /FlateDecode"
        parts.append(b"%d 0 obj << /Length %d%s >> stream\n%s\nendstream endobj\n"
                     % (i + 1, len(body), extra, body))
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def test_simple_tj():
    text, ok = extract_pdf_text(
        _pdf(b"BT /F1 12 Tf 72 720 Td (Hello, PDF world!) Tj ET"))
    assert ok and text == "Hello, PDF world!"


def test_flate_decoded_stream():
    text, ok = extract_pdf_text(
        _pdf(b"BT (compressed text line) Tj ET", flate=True))
    assert ok and text == "compressed text line"


def test_tj_array_with_kerning_gap():
    # small kerning joins, gap <= -180 becomes a word space
    text, ok = extract_pdf_text(
        _pdf(b"BT [(Hel) -20 (lo) -250 (world)] TJ ET"))
    assert ok and text == "Hello world"


def test_escapes_and_octal():
    text, ok = extract_pdf_text(
        _pdf(rb"BT (paren \( and \) back\\slash \101) Tj ET"))
    assert ok and text == "paren ( and ) back\\slash A"


def test_hex_string_and_lines():
    text, ok = extract_pdf_text(
        _pdf(b"BT (line one) Tj 0 -14 Td (line two) Tj ET"))
    assert ok and text == "line one\nline two"
    text2, ok2 = extract_pdf_text(_pdf(b"BT <48656C6C6F> Tj ET"))
    assert ok2 and text2 == "Hello"


def test_multiple_streams_concatenate():
    text, ok = extract_pdf_text(
        _pdf(b"BT (page one text) Tj ET", b"BT (page two text) Tj ET"))
    assert ok and text == "page one text\npage two text"


def test_unsupported_cases_flagged_not_crashed():
    assert extract_pdf_text(b"") == ("", False)
    assert extract_pdf_text(b"not a pdf at all") == ("", False)
    enc = _pdf(b"BT (secret) Tj ET") + b"<< /Encrypt 5 0 R >>"
    text, ok = extract_pdf_text(enc)
    assert not ok
    # corrupt flate body: stream skipped, no exception
    bad = b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> stream\nxxxx\nendstream endobj"
    assert extract_pdf_text(bad) == ("", False)


@pytest.mark.usefixtures("spark")
def test_parse_pdf_turns_operator(spark):
    from pyspark.sql import Row

    good = _pdf(b"BT (Doc zero, extracted) Tj ET", flate=True)
    rows = [
        Row(conv_id="c0", turn_idx=0, role="tool", payload=bytearray(good)),
        Row(conv_id="c0", turn_idx=1, role="tool",
            payload=bytearray(b"garbage bytes")),
        Row(conv_id="c1", turn_idx=0, role="tool", payload=None),
    ]
    out = {(r.conv_id, r.turn_idx): r
           for r in parse_pdf_turns(spark.createDataFrame(rows)).collect()}
    assert out[("c0", 0)].pdf_text == "Doc zero, extracted"
    assert out[("c0", 0)].pdf_ok is True
    assert out[("c0", 1)].pdf_ok is False
    assert out[("c1", 0)].pdf_ok is False and out[("c1", 0)].pdf_text == ""
