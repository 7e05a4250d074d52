"""WARC ingestion: Common-Crawl archive files -> PAGES_SCHEMA rows.

The real-input analog of the reference's media download boundary (S6,
download/downloader.py:10-120): where the reference fetches a video and
hands frames to the kernel, a web corpus arrives as WARC archives (ISO
28500 — the format Common Crawl publishes) and hands pages to the kernel.
`load_pages` covers parquet/JSONL exports; this module reads the archives
themselves, pure-Python (the format is line-oriented headers + counted
content blocks; gzip is stdlib — no external parser needed in-sandbox).

Scale shape: one task per WARC file via Spark's binaryFile source — the
standard unit (a crawl is tens of thousands of ~1 GB files, so file-level
parallelism saturates any cluster; a single file parses sequentially by
design because gzip members chain). Records stream through one mapInPandas
stage; malformed records go to the ERROR CHANNEL (per-record error rows),
never task failures — same contract as the extraction kernel.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def _decompress_if_gzip(raw: bytes) -> bytes:
    """WARC files are usually per-record gzip members concatenated; GzipFile
    reads all members. Plain (uncompressed) input passes through."""
    if raw[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
    return raw


def iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Parse a (decompressed) WARC byte stream into records.

    Yields dicts: {"headers": {name_lower: value}, "content": bytes,
    "error": str | None}. A malformed header block or short content yields
    one error record and parsing stops (the remaining bytes can't be framed
    without a valid Content-Length)."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while raw.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        hdr_end = raw.find(_HDR_END, pos)
        if hdr_end < 0:
            yield {"headers": {}, "content": b"",
                   "error": f"unterminated header block at byte {pos}"}
            return
        lines = raw[pos:hdr_end].split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            yield {"headers": {}, "content": b"",
                   "error": f"missing WARC/ version line at byte {pos}"}
            return
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield {"headers": headers, "content": b"",
                   "error": f"bad/missing Content-Length at byte {pos}"}
            return
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + length
        if body_end > n:
            yield {"headers": headers, "content": b"",
                   "error": f"truncated record: need {length} bytes at {body_start}"}
            return
        yield {"headers": headers, "content": raw[body_start:body_end],
               "error": None}
        pos = body_end


def http_body_of(content: bytes) -> bytes:
    """Payload of an application/http response record: strip the HTTP status
    line + headers. A record with no header/body split is returned whole
    (some writers store bare payloads)."""
    split = content.find(_HDR_END)
    if split >= 0 and content[:5] in (b"HTTP/",):
        return content[split + len(_HDR_END):]
    return content


def warc_pages(raw: bytes) -> Iterator[dict]:
    """response-type records of one WARC file -> page dicts
    (url, warc_ts iso string, html bytes, error)."""
    for rec in iter_warc_records(_decompress_if_gzip(raw)):
        if rec["error"] is not None:
            yield {"url": None, "warc_ts": None, "html": None,
                   "error": rec["error"]}
            continue
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue  # request/metadata/warcinfo records carry no page
        url = h.get("warc-target-uri")
        if not url:
            yield {"url": None, "warc_ts": None, "html": None,
                   "error": "response record without WARC-Target-URI"}
            continue
        yield {"url": url, "warc_ts": h.get("warc-date"),
               "html": http_body_of(rec["content"]), "error": None}


def load_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) -> DataFrame(url, warc_ts timestamp, html binary,
    source_file, error). One task per file (binaryFile source); records
    stream through a single mapInPandas stage. Filter `error IS NULL`
    before extraction; error rows carry the parse diagnostic and file."""
    import pandas as pd

    from pyspark.sql import functions as F

    def parse(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in pdfs:
            rows = {"url": [], "warc_ts": [], "html": [],
                    "source_file": [], "error": []}
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    pages = list(warc_pages(bytes(content)))
                except Exception as e:  # error channel, never task failure
                    pages = [{"url": None, "warc_ts": None, "html": None,
                              "error": f"{type(e).__name__}: {e}"}]
                for p in pages:
                    rows["url"].append(p["url"])
                    rows["warc_ts"].append(p["warc_ts"])
                    rows["html"].append(p["html"])
                    rows["source_file"].append(path_)
                    rows["error"].append(p["error"])
            yield pd.DataFrame(rows)

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    parsed = raw.mapInPandas(
        parse,
        schema="url string, warc_ts string, html binary, "
               "source_file string, error string",
    )
    return parsed.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    gzip_records: bool = True,
) -> None:
    """pages -> WARC archive files, one file per partition (the crawl
    layout: a corpus is many ~independent archive files). Response records
    carry an HTTP envelope and per-record gzip members (the Common Crawl
    convention), so the output round-trips through `load_warc` and is
    readable by any standard WARC consumer.

    Distributed end to end: each task serializes its partition and writes
    `part-NNNNN.warc[.gz]` directly — no driver collect, no shuffle."""
    import os
    import uuid as _uuid

    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    narrow = df.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col(html_col).cast("binary").alias("html"),
    )

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        suffix = ".warc.gz" if gzip_records else ".warc"
        target = os.path.join(path, f"part-{pid:05d}{suffix}")
        chunks = []
        for row in it:
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + (row.html or b"")
            )
            headers = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Record-ID: <urn:uuid:" + _uuid.uuid5(
                    _uuid.NAMESPACE_URL, row.url or "").hex.encode() + b">\r\n"
                b"WARC-Target-URI: " + (row.url or "").encode() + b"\r\n"
                b"WARC-Date: " + (row.ts or "").encode() + b"\r\n"
                b"Content-Type: application/http; msgtype=response\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            )
            record = headers + body + b"\r\n\r\n"
            chunks.append(gzip.compress(record) if gzip_records else record)
        if chunks:
            with open(target, "wb") as f:
                f.write(b"".join(chunks))
        return iter(())

    # mapPartitions is the sanctioned last resort here: the unit of work IS
    # the partition->file mapping (SURVEY custom-operator ladder (c))
    narrow.rdd.mapPartitions(write_partition).count()
