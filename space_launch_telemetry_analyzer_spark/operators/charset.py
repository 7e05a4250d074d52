"""Charset-aware HTML decoding: Common-Crawl bytes are NOT all UTF-8.

The extraction kernel decodes utf-8 with errors=replace (the right default
for a utf-8-dominant corpus and the byte-identity contract), but a real
crawl carries utf-16 exports, legacy latin-1/cp1251 pages, and BOMs. This
opt-in pre-pass normalizes everything to utf-8 bytes BEFORE extraction:

    pages -> decode_html(pages) -> extract_pages(..., html_col='html_utf8')

Sniffing order (WHATWG-encoding-style, simplified): BOM (utf-8-sig,
utf-16/32 LE/BE) > HTTP `Content-Type: ...; charset=` header label (when
the source carries one — load_warc emits it as `http_charset`; pass the
column via decode_html(header_charset_col=...)) > `<meta charset=...>` /
`<meta http-equiv ...charset=...>` in the first 2048 bytes > utf-8
fallback. Unknown labels fall back to utf-8-replace and are reported in
the `charset` column as '<label>!fallback' so corpus QA can count them.

One mapInArrow stage (same discipline as the NFC kernel) with an
output-side fast path: a batch that is entirely clean utf-8 reuses the
original Arrow buffer as the output column (no re-encoded copy). The
input side still materializes each value once for the BOM/meta sniff —
the sniff reads content, so a buffer-level skip is not possible.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import DataFrame

_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)
_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([A-Za-z0-9_\-]+))""",
    re.IGNORECASE,
)


def sniff_charset(b: bytes, header_charset: str | None = None) -> str:
    """Best-effort charset label for an html byte string. `header_charset`
    is the transport-level label (HTTP Content-Type header) — WHATWG ranks
    it above in-document meta but below an actual BOM."""
    for bom, name in _BOMS:
        if b.startswith(bom):
            return name
    if header_charset:
        return header_charset.strip().lower()
    m = _META_RE.search(b[:2048])
    if m:
        return m.group(1).decode("ascii", "ignore").lower()
    return "utf-8"


def decode_to_utf8(b: bytes, header_charset: str | None = None) -> tuple[bytes, str]:
    """(utf-8 bytes, charset label used). Unknown/failed labels fall back to
    utf-8-replace with a '!fallback' marker on the label."""
    label = sniff_charset(b, header_charset)
    for bom, name in _BOMS:
        # strip only a BOM that is ACTUALLY present — a meta tag may declare
        # utf-16 without one, and slicing then would eat real payload bytes.
        # (utf-8-sig strips its own BOM; the explicit-endian codecs don't.)
        if label == name and name != "utf-8-sig" and b.startswith(bom):
            b = b[len(bom):]
            break
    if label == "utf-8":
        try:
            b.decode("utf-8", "strict")
            return b, "utf-8"  # already clean utf-8: passthrough
        except UnicodeDecodeError:
            return b.decode("utf-8", "replace").encode("utf-8"), "utf-8!replace"
    try:
        text = b.decode(label, "replace")
    except LookupError:
        return b.decode("utf-8", "replace").encode("utf-8"), f"{label}!fallback"
    return text.encode("utf-8"), label


def decode_html(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "html_utf8",
    header_charset_col: str | None = None,
) -> DataFrame:
    """Adds (out_col: binary utf-8 html, charset: string). Batch-level fast
    path: a batch that is entirely clean BOM-less utf-8 reuses the original
    Arrow buffer as the output column (input values are still materialized
    once for the sniff — see module docstring). `header_charset_col` names
    an optional per-row transport charset label column (load_warc's
    `http_charset`) honored above in-document meta, below a BOM."""
    import pyarrow as pa

    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    if html_col not in df.columns:
        raise ValueError(f"column {html_col!r} not in {df.columns}")
    if header_charset_col is not None and header_charset_col not in df.columns:
        raise ValueError(f"column {header_charset_col!r} not in {df.columns}")

    def kernel(batches):
        for rb in batches:
            idx = rb.schema.get_field_index(html_col)
            col = rb.column(idx)
            vals = col.to_pylist()
            if header_charset_col is not None:
                hints = rb.column(
                    rb.schema.get_field_index(header_charset_col)
                ).to_pylist()
            else:
                hints = [None] * len(vals)
            decoded: list[bytes | None] = []
            labels: list[str | None] = []
            clean = True
            for v, hint in zip(vals, hints):
                if v is None:
                    decoded.append(None)
                    labels.append(None)
                    continue
                out, label = decode_to_utf8(v, hint)
                clean = clean and label == "utf-8"
                decoded.append(out)
                labels.append(label)
            out_arr = col if clean else pa.array(decoded, type=pa.binary())
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [out_arr, pa.array(labels, pa.string())],
                names=list(rb.schema.names) + [out_col, "charset"],
            )

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, BinaryType()), StructField("charset", StringType())]
    )
    return df.mapInArrow(kernel, schema=out_schema)
