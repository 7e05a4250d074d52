"""WARC ingestion: framing, gzip members, HTTP payload strip, error channel,
and the end-to-end load_warc -> extract_pages path on synthesized archives."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.sources import warc as W


def _record(warc_type: str, uri: str | None, date: str, payload: bytes,
            http: bool = True) -> bytes:
    content = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        if http else payload
    )
    headers = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    if uri is not None:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers += [
        b"WARC-Date: " + date.encode(),
        b"Content-Length: " + str(len(content)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + content + b"\r\n\r\n"


HTML1 = b"<html><body><p>first page content here</p></body></html>"
HTML2 = b"<html><body><p>second page content here</p></body></html>"


def _archive() -> bytes:
    return (
        _record("warcinfo", None, "2024-01-01T00:00:00Z", b"software: test", http=False)
        + _record("request", "https://a.example/x", "2024-01-01T00:00:01Z",
                  b"GET /x HTTP/1.1", http=False)
        + _record("response", "https://a.example/x", "2024-01-01T00:00:01Z", HTML1)
        + _record("response", "https://b.example/y", "2024-01-02T10:30:00Z", HTML2)
    )


def test_iter_records_and_page_filter():
    pages = list(W.warc_pages(_archive()))
    assert [p["error"] for p in pages] == [None, None]
    assert [p["url"] for p in pages] == ["https://a.example/x", "https://b.example/y"]
    assert pages[0]["html"] == HTML1  # HTTP headers stripped
    assert pages[1]["warc_ts"] == "2024-01-02T10:30:00Z"


def test_gzip_members_roundtrip():
    # per-record gzip members concatenated — the Common Crawl layout
    raw = _archive()
    members = b""
    for rec in (raw[: len(raw) // 2], raw[len(raw) // 2:]):
        members += gzip.compress(rec)
    # member split mid-record is fine: decompression restores the stream
    pages = list(W.warc_pages(members))
    assert [p["url"] for p in pages] == ["https://a.example/x", "https://b.example/y"]
    assert pages[0]["html"] == HTML1


def test_truncated_and_malformed_error_channel():
    whole = _archive()
    truncated = whole[: len(whole) - 40]
    pages = list(W.warc_pages(truncated))
    assert pages[-1]["error"] is not None and "truncated" in pages[-1]["error"]
    # garbage input: one error record, no raise
    bad = list(W.warc_pages(b"not a warc file at all"))
    assert len(bad) == 1 and bad[0]["error"] is not None
    # garbage WITH a header terminator fails on the version line check
    bad2 = list(W.warc_pages(b"junk: header\r\n\r\nbody"))
    assert len(bad2) == 1 and "WARC/" in bad2[0]["error"]
    # response without a target URI
    no_uri = _record("response", None, "2024-01-01T00:00:00Z", HTML1)
    pages = list(W.warc_pages(no_uri))
    assert pages[0]["error"] is not None and "Target-URI" in pages[0]["error"]


def test_bare_payload_record():
    # some writers store the payload without an HTTP envelope
    rec = _record("response", "https://c.example/z", "2024-01-01T00:00:00Z",
                  HTML1, http=False)
    pages = list(W.warc_pages(rec))
    assert pages[0]["html"] == HTML1


def test_load_warc_end_to_end(spark, tmp_path):
    """Two archive files (one gzipped) -> load_warc -> extract_pages: urls,
    timestamps, and extracted text all survive; the kernel sees real bytes."""
    from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages
    from space_launch_telemetry_analyzer_spark.sources.pages import (
        expected_text, paragraphs_of, render_page,
    )

    d = tmp_path / "warcs"
    d.mkdir()
    # archive 1: synthetic golden pages (so byte-identity is checkable)
    recs = b"".join(
        _record("response", f"https://w.example/p/{i}",
                f"2024-03-0{i + 1}T00:00:00Z",
                render_page(i, paragraphs_of(i)).encode())
        for i in range(3)
    )
    (d / "a.warc").write_bytes(recs)
    (d / "b.warc.gz").write_bytes(gzip.compress(_archive()))

    pages = W.load_warc(spark, str(d))
    ok = pages.where(F.col("error").isNull())
    assert pages.where(F.col("error").isNotNull()).count() == 0
    assert ok.count() == 5
    assert dict(ok.dtypes)["warc_ts"] == "timestamp"
    assert ok.where(F.col("warc_ts") == "2024-01-02 10:30:00").count() == 1

    res = extract_pages(ok.select("url", "warc_ts", "html"))
    got = {r["url"]: r["extracted_text"] for r in res.collect()}
    for i in range(3):
        assert got[f"https://w.example/p/{i}"] == expected_text(i)
    assert res.where(F.col("error").isNotNull()).count() == 0


def test_write_warc_roundtrip(spark, tmp_path):
    """Distributed writer -> reader roundtrip: per-partition gzip archives,
    HTTP envelope added and stripped, timestamps and bytes identical."""
    rows = [
        (f"https://rt.example/{i}", f"2024-05-0{i + 1}T12:00:0{i}Z", f"<p>body {i}</p>".encode())
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, html binary") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(2)
    out = str(tmp_path / "warcs")
    W.write_warc(df, out)
    import os
    files = sorted(os.listdir(out))
    assert len(files) == 2 and all(f.endswith(".warc.gz") for f in files)
    back = W.load_warc(spark, out)
    got = {r.url: (r.warc_ts.isoformat(), bytes(r.html)) for r in back.collect()}
    want = {u: (t.replace("Z", ""), h) for u, t, h in rows}
    assert got == want


def test_warc_framing_fuzz_adversarial_payloads():
    """Content-Length framing must survive payloads that LOOK like record
    boundaries: embedded CRLFCRLF, fake 'WARC/1.0' headers, binary junk,
    gzip magic. Roundtrip via the local parser: every url and payload comes
    back byte-identical."""
    import random

    rng = random.Random(20260817)
    payloads = []
    for i in range(60):
        kind = i % 5
        if kind == 0:
            p = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
        elif kind == 1:
            p = b"<p>x</p>\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
        elif kind == 2:
            p = b"\r\n\r\n" * rng.randrange(1, 5) + b"tail"
        elif kind == 3:
            p = b"\x1f\x8b" + bytes(rng.randrange(256) for _ in range(64))
        else:
            p = ("unicode φ ü " * rng.randrange(1, 20)).encode()
        payloads.append(p)

    raw = b"".join(
        _record("response", f"https://fz.example/{i}",
                "2024-01-01T00:00:00Z", p)
        for i, p in enumerate(payloads)
    )
    pages = list(W.warc_pages(raw))
    assert [p["error"] for p in pages] == [None] * len(payloads)
    for i, p in enumerate(payloads):
        assert pages[i]["url"] == f"https://fz.example/{i}"
        assert pages[i]["html"] == p, f"payload {i} corrupted"


def test_write_warc_rerun_removes_stale_parts(spark, tmp_path):
    """A re-run with fewer partitions must not leave stale part files that
    load_warc would silently mix into the corpus."""
    out = str(tmp_path / "w")
    df4 = spark.createDataFrame(
        [(f"https://s.example/{i}", "2024-01-01T00:00:00Z", b"<p>a</p>") for i in range(8)],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    W.write_warc(df4.repartition(4), out)
    W.write_warc(df4.limit(2).repartition(1), out)
    back = W.load_warc(spark, out)
    assert back.count() == 2


def test_write_warc_record_ids_unique_and_urn_formed(spark, tmp_path):
    """Re-fetches of one url need DISTINCT record ids (ISO 28500), in proper
    urn:uuid form."""
    out = str(tmp_path / "w2")
    df = spark.createDataFrame(
        [("https://u.example/x", "2024-01-01T00:00:00Z", b"<p>1</p>"),
         ("https://u.example/x", "2024-01-01T00:00:00Z", b"<p>2</p>")],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    W.write_warc(df.coalesce(1), out, gzip_records=False)
    import re
    raw = (tmp_path / "w2" / "part-00000.warc").read_bytes()
    ids = re.findall(rb"WARC-Record-ID: <urn:uuid:([0-9a-f\-]{36})>", raw)
    assert len(ids) == 2 and ids[0] != ids[1]


def test_http_charset_of():
    """Charset label from the HTTP Content-Type header; None when absent
    or the record has no HTTP envelope."""
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=Windows-1251\r\n\r\nx"
    assert W.http_charset_of(body) == "windows-1251"
    quoted = b'HTTP/1.1 200 OK\r\nContent-Type: text/html; charset="UTF-8"\r\n\r\nx'
    assert W.http_charset_of(quoted) == "utf-8"
    assert W.http_charset_of(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nx") is None
    assert W.http_charset_of(b"no envelope at all") is None
    # charset=... appearing in the BODY must not be read as a header
    sneaky = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\ncharset=koi8-r"
    assert W.http_charset_of(sneaky) is None


def test_warc_header_charset_end_to_end(spark, tmp_path):
    """The r3 gap closed: a cp1251 page whose ONLY charset signal is the
    HTTP Content-Type header (no meta, no BOM) must decode correctly
    WARC -> load_warc -> decode_html(header_charset_col) -> extract_pages."""
    from space_launch_telemetry_analyzer_spark.operators.charset import decode_html
    from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages

    ru_text = "Привет, мир — телеметрия работает"
    ru_html = f"<html><body><p>{ru_text}</p></body></html>"
    content = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=windows-1251\r\n\r\n"
        + ru_html.encode("cp1251")
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://ru.example/p\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(content)).encode() + b"\r\n\r\n"
        + content + b"\r\n\r\n"
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "ru.warc").write_bytes(rec)

    pages = W.load_warc(spark, str(d))
    row = pages.first()
    assert row.http_charset == "windows-1251" and row.error is None

    dec = decode_html(pages, header_charset_col="http_charset")
    res = extract_pages(
        dec.select("url", "warc_ts", F.col("html_utf8").alias("html"))
    )
    out = res.first()
    assert out.error is None
    assert out.extracted_text == ru_text


# --- CDX index: surt keys, write_warc(cdx=True), load_cdx, cdx_fetch -----------

def test_surt_key_expression(spark):
    from space_launch_telemetry_analyzer_spark.operators.text_analysis import (
        surt_key,
    )

    cases = [
        ("https://www.Example.COM:443/A/B?b=2&a=1#frag", "com,example)/a/b?a=1&b=2"),
        ("http://sub.host.org:80/", "org,host,sub)/"),
        ("http://host.org:8080/p", "org,host:8080)/p"),
        ("https://user:pw@h.example/x", "example,h)/x"),
        ("https://h.example", "example,h)/"),
        ("https://h.example/p?single", "example,h)/p?single"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == [w for _, w in cases]


def _cdx_fixture_df(spark):
    rows = [
        (f"https://www.H{i % 2}.Example/p/{i}?b=2&a=1",
         f"2024-05-0{i + 1}T12:00:0{i}Z", f"<p>body {i}</p>".encode())
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(2)


def test_cdx_write_load_fetch_roundtrip(spark, tmp_path):
    import os

    out = str(tmp_path / "w")
    W.write_warc(_cdx_fixture_df(spark), out, cdx=True)
    files = sorted(os.listdir(out))
    assert [f for f in files if f.endswith(".cdx")] == \
        ["part-00000.cdx", "part-00001.cdx"]
    # per-file lines sorted by urlkey (binary-search contract)
    for f in files:
        if f.endswith(".cdx"):
            keys = [ln.split(" ")[0]
                    for ln in open(os.path.join(out, f)).read().splitlines()]
            assert keys == sorted(keys)
    res = W.cdx_fetch(W.load_cdx(spark, out)).collect()
    assert len(res) == 6 and all(r["ok"] for r in res)
    by_url = {r["url"]: r for r in res}
    r0 = by_url["https://www.H0.Example/p/0?b=2&a=1"]
    assert r0["urlkey"] == "example,h0)/p/0?a=1&b=2"
    assert r0["ts14"] == "20240501120000"
    assert r0["n_bytes"] == len(b"<p>body 0</p>")
    assert r0["fetched_url"] == r0["url"] and r0["payload_sha1"] == r0["sha1"]


def test_cdx_fetch_detects_corruption(spark, tmp_path):
    import os

    out = str(tmp_path / "w")
    W.write_warc(_cdx_fixture_df(spark), out, cdx=True)
    cdx = W.load_cdx(spark, out)
    # lie about an offset: the span decodes to garbage -> error row, not a
    # task failure
    bad = cdx.withColumn(
        "offset", F.when(F.col("offset") == 0, F.lit(7)).otherwise(F.col("offset")))
    res = W.cdx_fetch(bad).collect()
    assert sum(not r["ok"] for r in res) == 2  # one poisoned row per file
    assert all(r["error"] for r in res if not r["ok"])
    assert sum(r["ok"] for r in res) == 4


def test_cdx_uncompressed_archive(spark, tmp_path):
    out = str(tmp_path / "w")
    W.write_warc(_cdx_fixture_df(spark), out, gzip_records=False, cdx=True)
    res = W.cdx_fetch(W.load_cdx(spark, out)).collect()
    assert len(res) == 6 and all(r["ok"] for r in res)


def test_cdx_rejects_space_in_url(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://h.example/a b", "2024-05-01T12:00:00Z", b"x")],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = str(tmp_path / "w")
    import os
    import pytest as _pytest
    with _pytest.raises(Exception, match="space-free"):
        W.write_warc(df, out, cdx=True)
    # failed task left no partial temp files behind
    leftovers = [f for f in os.listdir(out) if "inprogress" in f]
    assert leftovers == []


def test_cdx_fetch_tolerates_reordered_input(spark, tmp_path):
    out = str(tmp_path / "w")
    W.write_warc(_cdx_fixture_df(spark), out, cdx=True)
    shuffled = W.load_cdx(spark, out).select(
        "filename", "length", "offset", "sha1", "url", "ts14", "urlkey")
    res = W.cdx_fetch(shuffled).collect()
    assert len(res) == 6 and all(r["ok"] for r in res)
    assert all(r["ts14"].startswith("2024") for r in res)


# --- WET sidecar: write_wet / load_wet -----------------------------------------

def test_wet_roundtrip_and_mixed_archive(spark, tmp_path):
    rows = [(f"https://w.example/{i}", f"2024-06-0{i + 1}T10:00:0{i}Z",
             f"extracted text {i} with unicode é…") for i in range(4)]
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(2)
    out = str(tmp_path / "wet")
    W.write_wet(df, out)
    import os
    files = sorted(os.listdir(out))
    assert len(files) == 2 and all(f.endswith(".warc.wet.gz") for f in files)
    back = {r.url: (r.warc_ts.isoformat(), r.text)
            for r in W.load_wet(spark, out).collect()}
    assert back == {u: (t.replace("Z", ""), x) for u, t, x in rows}
    # load_wet skips response records: a RESPONSE archive yields nothing
    wdir = str(tmp_path / "warc")
    W.write_warc(df.withColumn("html", F.col("text").cast("binary")),
                 wdir, html_col="html")
    assert W.load_wet(spark, wdir).count() == 0
    # and load_warc skips conversion records symmetrically
    assert W.load_warc(spark, out).where(F.col("error").isNull()).count() == 0


def test_wet_plain_and_rerun_sweep(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.example/1", "2024-06-01T00:00:00Z", "t")],
        "url string, warc_ts string, text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(3)
    out = str(tmp_path / "wet")
    W.write_wet(df, out, gzip_records=False)
    import os
    first = set(os.listdir(out))
    # re-run with 1 partition: stale parts removed, no silent mix
    W.write_wet(df.repartition(1), out)
    assert not (set(os.listdir(out)) & first)
    assert W.load_wet(spark, out).count() == 1


def test_wat_roundtrip(spark, tmp_path):
    rows = [(f"https://w.example/{i}", f"2024-07-0{i + 1}T09:00:00Z",
             '{"k": %d}' % i) for i in range(3)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, meta_json string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(2)
    out = str(tmp_path / "wat")
    W.write_wat(df, out)
    import os
    assert all(f.endswith(".warc.wat.gz") for f in os.listdir(out))
    back = {r.url: r.meta_json for r in W.load_wat(spark, out).collect()}
    assert back == {u: j for u, _, j in rows}
    # wat and wet readers don't cross-read each other's record types
    assert W.load_wet(spark, out).count() == 0
