"""Charset sniff/decode: BOMs, meta tags, fallbacks, and the decoded-input
extraction path producing the same text as the utf-8 original."""

from __future__ import annotations

import codecs

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators import charset as C

HTML = "<html><body><p>télémetrie über Ångström</p></body></html>"


def test_sniff_order():
    assert C.sniff_charset(codecs.BOM_UTF16_LE + HTML.encode("utf-16-le")) == "utf-16-le"
    assert C.sniff_charset(codecs.BOM_UTF8 + HTML.encode()) == "utf-8-sig"
    assert C.sniff_charset(b'<meta charset="ISO-8859-1"><p>x</p>') == "iso-8859-1"
    assert C.sniff_charset(
        b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">'
    ) == "windows-1251"
    assert C.sniff_charset(b"<p>plain</p>") == "utf-8"


def test_decode_variants():
    # clean utf-8 passes through byte-identical
    out, label = C.decode_to_utf8(HTML.encode())
    assert out == HTML.encode() and label == "utf-8"
    # utf-16 with BOM -> utf-8
    out, label = C.decode_to_utf8(codecs.BOM_UTF16_LE + HTML.encode("utf-16-le"))
    assert out.decode() == HTML and label == "utf-16-le"
    # latin-1 via meta tag
    latin = '<meta charset="iso-8859-1"><p>café</p>'.encode("latin-1")
    out, label = C.decode_to_utf8(latin)
    assert "café" in out.decode() and label == "iso-8859-1"
    # invalid utf-8 bytes -> replacement, flagged
    out, label = C.decode_to_utf8(b"<p>\xff\xfe\x99broken</p>")
    assert label.endswith("!replace") or label.endswith("-le")  # may sniff as BOM
    # unknown label -> fallback, flagged
    out, label = C.decode_to_utf8(b'<meta charset="bogus-enc"><p>x</p>')
    assert label == "bogus-enc!fallback" and b"<p>x</p>" in out


def test_decode_html_distributed_and_extraction_parity(spark):
    """utf-16 and latin-1 variants of golden pages must extract to the SAME
    text as their utf-8 originals after decode_html."""
    from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages
    from space_launch_telemetry_analyzer_spark.sources.pages import (
        expected_text, paragraphs_of, render_page,
    )

    rows = []
    for i in range(4):
        html = render_page(i, paragraphs_of(i))
        if i % 2 == 0:
            raw = codecs.BOM_UTF16_LE + html.encode("utf-16-le")
        else:
            raw = html.encode()
        rows.append((f"https://cs.example/p/{i}", raw))
    df = spark.createDataFrame(rows, "url string, html binary")
    dec = C.decode_html(df)
    labels = {r.url: r.charset for r in dec.collect()}
    assert labels["https://cs.example/p/0"] == "utf-16-le"
    assert labels["https://cs.example/p/1"] == "utf-8"
    # input frame must not grow phantom columns
    assert df.columns == ["url", "html"]

    res = extract_pages(
        dec.select("url", F.col("html_utf8").alias("html"))
    )
    got = {r.url: r.extracted_text for r in res.collect()}
    for i in range(4):
        assert got[f"https://cs.example/p/{i}"] == expected_text(i)


def test_decode_html_null_and_unknown_column(spark):
    df = spark.createDataFrame([(None,)], "html binary")
    row = C.decode_html(df).first()
    assert row.html_utf8 is None and row.charset is None
    with pytest.raises(ValueError, match="not in"):
        C.decode_html(df, "nope")


def test_meta_declared_utf16_without_bom_no_byte_eating():
    """ASCII bytes whose meta tag LIES about utf-16 (no BOM present): the
    BOM strip must be gated on actual BOM presence, not the label — the
    decode starts at byte 0, never byte 2."""
    raw = b'<meta charset="utf-16-le"><p>x</p>'  # ASCII bytes, lying label
    out, label = C.decode_to_utf8(raw)
    assert label == "utf-16-le"
    # decoded from the FULL byte string (mojibake, but no payload loss)
    assert out.decode() == raw.decode("utf-16-le", "replace")
    # and genuinely utf-16 bytes without a BOM are opaque to the ASCII
    # sniff: NUL-laced bytes are valid utf-8, passthrough is the contract
    real16 = '<meta charset="utf-16-le"><p>x</p>'.encode("utf-16-le")
    out2, label2 = C.decode_to_utf8(real16)
    assert label2 == "utf-8" and out2 == real16


def test_header_charset_precedence():
    """WHATWG order: BOM > HTTP header label > meta > utf-8 default."""
    meta_1251 = '<meta charset="windows-1251"><p>café</p>'.encode("latin-1")
    # header beats meta
    assert C.sniff_charset(meta_1251, "iso-8859-1") == "iso-8859-1"
    # BOM beats header
    bom16 = codecs.BOM_UTF16_LE + "<p>x</p>".encode("utf-16-le")
    assert C.sniff_charset(bom16, "windows-1251") == "utf-16-le"
    # header alone (no meta, no BOM)
    assert C.sniff_charset(b"<p>plain</p>", "KOI8-R") == "koi8-r"
    # empty/None header -> meta still wins
    assert C.sniff_charset(meta_1251, None) == "windows-1251"
    assert C.sniff_charset(meta_1251, "") == "windows-1251"
    # decode honors the header label
    ru = "<p>Привет</p>".encode("cp1251")
    out, label = C.decode_to_utf8(ru, "windows-1251")
    assert out.decode() == "<p>Привет</p>" and label == "windows-1251"


def test_decode_html_header_charset_col(spark):
    """Per-row header labels: a cp1251 page with NO meta/BOM decodes right
    only via the header column; rows with NULL hint keep the sniff path."""
    ru_html = "<html><body><p>Привет, мир</p></body></html>"
    rows = [
        ("https://hc.example/ru", ru_html.encode("cp1251"), "windows-1251"),
        ("https://hc.example/plain", b"<p>ascii</p>", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, http_charset string")
    dec = C.decode_html(df, header_charset_col="http_charset")
    got = {r.url: (bytes(r.html_utf8), r.charset) for r in dec.collect()}
    assert got["https://hc.example/ru"] == (ru_html.encode(), "windows-1251")
    assert got["https://hc.example/plain"] == (b"<p>ascii</p>", "utf-8")
    with pytest.raises(ValueError, match="not in"):
        C.decode_html(df, header_charset_col="nope")
