"""Layout parsing: reading-order reconstruction over positioned text boxes
(the PDF/layout-parse leg of the north_rule).

The PDF *codec* is REAL for the text-PDF subset (r4 — was the last stub):
a pure-stdlib parser walks `N G obj ... endobj` objects, inflates plain or
FlateDecode content streams (zlib), and interprets the T.81-era text
operators — BT/ET, Tf, Td/TD, TL, T*, Tm, Tj, ' and TJ arrays, literal
strings with escape/octal forms and hex strings — emitting one positioned
box per text run in TOP-DOWN page coordinates (MediaBox-aware flip).
`make_pdf` is the sink twin: a valid single-page Helvetica PDF (xref +
trailer, optional FlateDecode) whose output round-trips through
`parse_pdf` and opens in any viewer. Payloads that are not PDFs keep the
deterministic fake path behind `fake=True` (image-only/scanned PDFs would
need an OCR engine — out of sandbox scope, and they carry no text
operators to read). The LAYOUT logic — column detection + reading order —
is unchanged:

- input: one row per document with `boxes: array<struct<x,y,w,h,text>>`
  (the shape any real PDF/OCR layout engine produces);
- column detection: 1-D gap clustering on box x-centers (a deterministic
  histogram-valley split — no RNG, no iterative k-means);
- reading order: columns left-to-right, boxes top-to-bottom within a column
  (ties broken by x then text for full determinism);
- output: `layout_text` — the reassembled text, '\n'-joined.

Executed as one Arrow-vectorized `mapInPandas` over the box arrays (numpy
per row; blobs/boxes never leave the batch), same scale shape as the DOM
extraction kernel.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOXES_DDL = "array<struct<x:double,y:double,w:double,h:double,text:string>>"
LAYOUT_OUTPUT_DDL = "doc_id long, n_columns int, layout_text string, error string"

COLUMN_GAP_FRACTION = 0.15  # a gap wider than this fraction of page width splits columns


def reading_order(boxes: list[dict]) -> tuple[int, str]:
    """(n_columns, text) for one document's boxes — pure function, unit-tested."""
    if not boxes:
        return 0, ""
    xs = np.array([b["x"] + b["w"] / 2.0 for b in boxes])
    ys = np.array([b["y"] for b in boxes])
    page_w = max(b["x"] + b["w"] for b in boxes) - min(b["x"] for b in boxes)
    order = np.argsort(xs, kind="stable")
    # valley split: a horizontal gap between sorted x-centers wider than
    # COLUMN_GAP_FRACTION * page width starts a new column
    splits = [0]
    for i in range(1, len(order)):
        if xs[order[i]] - xs[order[i - 1]] > COLUMN_GAP_FRACTION * max(page_w, 1e-9):
            splits.append(i)
    columns: list[list[int]] = []
    bounds = splits + [len(order)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        columns.append(list(order[s:e]))
    pieces: list[str] = []
    for col in columns:  # columns already left-to-right
        col_sorted = sorted(col, key=lambda i: (ys[i], xs[i], boxes[i]["text"] or ""))
        pieces.extend((boxes[i]["text"] or "") for i in col_sorted)
    return len(columns), "\n".join(pieces)


def layout_text(df: DataFrame, id_col: str, boxes_col: str) -> DataFrame:
    """boxes -> (n_columns, layout_text) via one Arrow batch kernel."""
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(boxes_col).alias("boxes"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ncols, texts, errs = [], [], []
            for boxes in pdf["boxes"]:
                try:
                    bx = list(boxes) if boxes is not None else []
                    bx = [b if isinstance(b, dict) else b.asDict() for b in bx]
                    n, t = reading_order(bx)
                    ncols.append(n); texts.append(t); errs.append(None)
                except Exception as e:  # row-level error channel
                    ncols.append(None); texts.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "n_columns": ncols,
                                "layout_text": texts, "error": errs})

    return narrow.mapInPandas(kernel, schema=LAYOUT_OUTPUT_DDL)


# ---------------------------------------------------------------------------
# real PDF text-subset codec (pure stdlib)
# ---------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_KW_RE = re.compile(rb"stream\r?\n")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?:\s+(\d+)\s+R)?")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)


def _iter_objects(payload: bytes):
    """Yields (obj_num, head_bytes, raw_stream_bytes|None) walking the file
    with a sequential cursor. Stream data is sliced by the dictionary's
    /Length when present and consistent (ADVICE r4: a FlateDecode stream
    whose bytes happen to contain b'endobj'/b'endstream' must not truncate),
    falling back to the endstream regex otherwise. Indirect /Length (N 0 R)
    is resolved by a targeted lookup of that object's integer body."""
    pos = 0
    n = len(payload)
    while pos < n:
        m = _OBJ_HEAD_RE.search(payload, pos)
        if not m:
            break
        start = m.end()
        sm = _STREAM_KW_RE.search(payload, start)
        em = payload.find(b"endobj", start)
        if sm and (em == -1 or sm.start() < em):
            head = payload[start:sm.start()]
            data = None
            lm = _LENGTH_RE.search(head)
            length = None
            if lm:
                if lm.group(2) is None:
                    length = int(lm.group(1))
                else:
                    rm = re.search(
                        rb"\b" + lm.group(1) + rb"\s+" + lm.group(2)
                        + rb"\s+obj\b\s*(\d+)", payload)
                    if rm:
                        length = int(rm.group(1))
            if length is not None:
                cand = payload[sm.end():sm.end() + length]
                tail = payload[sm.end() + length:sm.end() + length + 20]
                if re.match(rb"\s*endstream", tail):
                    data = cand
            if data is None:  # /Length absent or inconsistent: regex
                fm = _STREAM_RE.match(payload, sm.start())
                if fm:
                    data = fm.group(1)
                else:
                    data = payload[sm.end():]
            yield int(m.group(1)), head, data
            em = payload.find(b"endobj", sm.end() + (len(data) if data else 0))
            pos = em + 6 if em != -1 else n
        else:
            yield int(m.group(1)), payload[start:em if em != -1 else n], None
            pos = em + 6 if em != -1 else n


class _Name:
    """PDF name token (/F1). A DISTINCT type so Tj/'/TJ string guards can
    never mistake a name for a string operand (ADVICE r4)."""

    __slots__ = ("v",)

    def __init__(self, v: str):
        self.v = v

    def __repr__(self):  # debug aid only
        return f"/{self.v}"


# ---------------------------------------------------------------------------
# font encodings: WinAnsi, /Differences (AGL subset), /ToUnicode CMaps
# ---------------------------------------------------------------------------

# Adobe Glyph List subset: everything the latin web-PDF corpus commonly
# puts in /Differences arrays. Letters/digits map through their names;
# uniXXXX / uXXXXXX names parse below.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "fraction": "⁄", "Euro": "€",
    "trademark": "™", "minus": "−", "fi": "ﬁ",
    "fl": "ﬂ", "florin": "ƒ", "circumflex": "ˆ",
    "caron": "ˇ", "tilde": "˜", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "hungarumlaut": "˝", "cedilla": "¸", "dieresis": "¨",
    "macron": "¯", "acute": "´", "exclamdown": "¡",
    "cent": "¢", "sterling": "£", "currency": "¤",
    "yen": "¥", "brokenbar": "¦", "section": "§",
    "copyright": "©", "ordfeminine": "ª",
    "guillemotleft": "«", "logicalnot": "¬",
    "registered": "®", "degree": "°", "plusminus": "±",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "ordmasculine": "º", "guillemotright": "»",
    "onequarter": "¼", "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý", "Thorn": "Þ",
    "germandbls": "ß", "agrave": "à", "aacute": "á",
    "acircumflex": "â", "atilde": "ã", "adieresis": "ä",
    "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê",
    "edieresis": "ë", "igrave": "ì", "iacute": "í",
    "icircumflex": "î", "idieresis": "ï", "eth": "ð",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "thorn": "þ", "ydieresis": "ÿ", "Scaron": "Š",
    "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "OE": "Œ", "oe": "œ", "Ydieresis": "Ÿ",
    "Lslash": "Ł", "lslash": "ł", "dotlessi": "ı",
}


def _glyph_to_char(name: str) -> str | None:
    if len(name) == 1:
        return name  # A..Z a..z and other single-char names are themselves
    if name in _AGL:
        return _AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


def _winansi_table() -> list[str]:
    """WinAnsiEncoding == cp1252 with the five undefined slots (81 8D 8F
    90 9D) left as U+FFFD sentinels (dropped at emit)."""
    table = []
    for b in range(256):
        try:
            table.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            table.append("�")
    return table


_LATIN1_TABLE = [chr(b) for b in range(256)]


class _FontDecoder:
    """byte-string -> str for one simple (single-byte) font. Precedence:
    ToUnicode CMap > /Differences > base encoding (WinAnsi or the latin-1
    default that doubles for Standard/unspecified — exact for the ASCII
    range every Standard-encoded latin PDF uses)."""

    __slots__ = ("table",)

    def __init__(self, base: list[str] | None = None,
                 differences: dict[int, str] | None = None,
                 tounicode: dict[int, str] | None = None):
        table = list(base if base is not None else _LATIN1_TABLE)
        for code, ch in (differences or {}).items():
            if 0 <= code <= 255:
                table[code] = ch
        for code, ch in (tounicode or {}).items():
            if 0 <= code <= 255:
                table[code] = ch
        self.table = table

    def decode(self, raw: bytes) -> str:
        t = self.table
        return "".join(t[b] for b in raw).replace("�", "")


_DEFAULT_DECODER = _FontDecoder()

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEXTRIPLE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
    re.DOTALL)


def _utf16be(hexs: bytes) -> str:
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be")
    except (ValueError, UnicodeDecodeError):
        return ""


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """ToUnicode CMap stream -> {single-byte code: unicode str}. Handles
    bfchar pairs and bfrange runs (scalar-dst increments and array dsts)."""
    out: dict[int, str] = {}
    for section in _BFCHAR_RE.findall(data):
        for src, dst in _HEXPAIR_RE.findall(section):
            code = int(src, 16)
            if code <= 255:
                out[code] = _utf16be(dst)
    for section in _BFRANGE_RE.findall(data):
        for m in _HEXTRIPLE_RE.finditer(section):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            if lo > 255:
                continue
            hi = min(hi, 255)
            if m.group(3) is not None:
                base = m.group(3)
                s = _utf16be(base)
                if not s:
                    continue
                base_cp = ord(s[-1])
                for i, code in enumerate(range(lo, hi + 1)):
                    out[code] = s[:-1] + chr(base_cp + i)
            else:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(4))
                for i, code in enumerate(range(lo, hi + 1)):
                    if i < len(dsts):
                        out[code] = _utf16be(dsts[i])
    return out


_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_DIFF_TOKEN_RE = re.compile(rb"(\d+)|/([^\s/\[\]()<>]+)")
_FONTRES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONTREF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_ENC_NAME_RE = re.compile(rb"/Encoding\s*/(\w+)")
_ENC_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+\d+\s+R")
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_BASEENC_RE = re.compile(rb"/BaseEncoding\s*/(\w+)")


def _parse_differences(body: bytes) -> dict[int, str]:
    diffs: dict[int, str] = {}
    dm = _DIFF_RE.search(body)
    if not dm:
        return diffs
    code = 0
    for num, name in _DIFF_TOKEN_RE.findall(dm.group(1)):
        if num:
            code = int(num)
        else:
            ch = _glyph_to_char(name.decode("latin-1"))
            if ch is not None:
                diffs[code] = ch
            code += 1
    return diffs


def _base_table(name: bytes | None) -> list[str]:
    if name and name.strip(b"/") == b"WinAnsiEncoding":
        return _winansi_table()
    # StandardEncoding / MacRomanEncoding / unspecified: latin-1 is exact
    # on ASCII (all the reference corpus uses) — documented approximation
    # above it
    return _LATIN1_TABLE


def _build_fonts(objects: dict[int, tuple[bytes, bytes | None]],
                 inflate) -> dict[str, _FontDecoder]:
    """Resource-name -> decoder, from every /Font resource dict in the
    document (inline name->ref pairs; font objects with /Encoding as a
    name or an indirect dict with /BaseEncoding + /Differences, and
    optional /ToUnicode streams)."""
    fonts: dict[str, _FontDecoder] = {}
    for num, (head, _data) in objects.items():
        for resm in _FONTRES_RE.finditer(head):
            for res_name, ref in _FONTREF_RE.findall(resm.group(1)):
                ref = int(ref)
                if ref not in objects:
                    continue
                fhead, _ = objects[ref]
                base = None
                diffs: dict[int, str] = {}
                touni: dict[int, str] = {}
                em = _ENC_NAME_RE.search(fhead)
                if em:
                    base = em.group(1)
                else:
                    erm = _ENC_REF_RE.search(fhead)
                    if erm and int(erm.group(1)) in objects:
                        ehead, _ = objects[int(erm.group(1))]
                        bm = _BASEENC_RE.search(ehead)
                        if bm:
                            base = bm.group(1)
                        diffs = _parse_differences(ehead)
                tm = _TOUNI_RE.search(fhead)
                if tm and int(tm.group(1)) in objects:
                    thead, tdata = objects[int(tm.group(1))]
                    if tdata is not None:
                        touni = _parse_tounicode(inflate(thead, tdata))
                fonts[res_name.decode("latin-1")] = _FontDecoder(
                    _base_table(base), diffs, touni)
    return fonts
# content-stream tokens: strings, numbers, names, brackets, operators
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"
    rb"|<[0-9A-Fa-f\s]*>"
    rb"|\[|\]"
    rb"|/[^\s/\[\]()<>]*"
    rb"|[-+]?[0-9]*\.?[0-9]+"
    rb"|[A-Za-z'\"*]+"
)
_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_string(tok: bytes) -> bytes:
    """Literal `(...)` (escapes + octal) or hex `<...>` string -> raw
    BYTES; the current font's decoder maps them to text at emit time."""
    if tok.startswith(b"<"):
        hexs = re.sub(rb"\s", b"", tok[1:-1])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))
    out = bytearray()
    i, end = 1, len(tok) - 1
    while i < end:
        c = tok[i:i + 1]
        if c == b"\\" and i + 1 < end:
            nxt = tok[i + 1:i + 2]
            if nxt in _STR_ESCAPES:
                out += _STR_ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal \d, \dd, \ddd — OCTAL digits only
                j = i + 1
                while j < min(i + 4, end) and tok[j] in b"01234567":
                    j += 1
                out.append(int(tok[i + 1:j], 8) & 0xFF)
                i = j
                continue
            # \8, \9, or any other unknown escape: backslash dropped per
            # spec, the following character kept (next loop iteration)
            i += 1  # unknown escape: backslash dropped per spec
            continue
        out += c
        i += 1
    return bytes(out)


def _parse_content(data: bytes, page_h: float,
                   fonts: dict[str, _FontDecoder] | None = None) -> list[dict]:
    """Text operators of one content stream -> positioned boxes (top-down
    y). Box width is a Helvetica-ish 0.5*size/char estimate — the layout
    valley-split keys on x-centers and gaps, not exact glyph metrics.
    String operands stay raw bytes until emit, where the CURRENT font's
    decoder (Tf tracks it) maps them through ToUnicode / Differences /
    WinAnsi / latin-1."""
    boxes: list[dict] = []
    font_size, leading = 12.0, 14.0
    x = y = 0.0
    in_text = False
    stack: list = []
    arr: list | None = None
    fonts = fonts or {}
    decoder = _DEFAULT_DECODER

    def emit(raw: bytes) -> None:
        s = decoder.decode(raw)
        if not s:
            return
        boxes.append({
            "x": float(x), "y": float(page_h - y - font_size),
            "w": float(0.5 * font_size * len(s)), "h": float(font_size),
            "text": s,
        })

    def fnum(v, dflt):
        try:
            return float(v)
        except (TypeError, ValueError):
            return dflt

    for tm in _TOKEN_RE.finditer(data):
        tok = tm.group(0)
        c0 = tok[:1]
        if tok == b"[":
            arr = []
            continue
        if tok == b"]":
            stack.append(arr if arr is not None else [])
            arr = None
            continue
        if c0 in b"(<":
            (arr if arr is not None else stack).append(_pdf_string(tok))
            continue
        if c0 in b"-+.0123456789":
            (arr if arr is not None else stack).append(float(tok))
            continue
        if c0 == b"/":
            stack.append(_Name(tok[1:].decode("latin-1")))
            continue
        op = tok
        if op == b"BT":
            in_text, x, y = True, 0.0, 0.0
        elif op == b"ET":
            in_text = False
        elif op == b"Tf" and stack:
            font_size = fnum(stack[-1], font_size)
            if len(stack) >= 2 and isinstance(stack[-2], _Name):
                decoder = fonts.get(stack[-2].v, _DEFAULT_DECODER)
        elif op == b"TL" and stack:
            leading = fnum(stack[-1], leading)
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            dx, dy = fnum(stack[-2], 0.0), fnum(stack[-1], 0.0)
            x += dx
            y += dy
            if op == b"TD":
                leading = -dy  # unconditional per PDF 32000 Table 106
        elif op == b"Tm" and len(stack) >= 6:
            x, y = fnum(stack[-2], x), fnum(stack[-1], y)
        elif op == b"T*":
            y -= leading
        elif op == b"Tj" and in_text and stack and isinstance(stack[-1], bytes):
            emit(stack[-1])
        elif op == b"'" and in_text and stack and isinstance(stack[-1], bytes):
            y -= leading
            emit(stack[-1])
        elif op == b"TJ" and in_text and stack and isinstance(stack[-1], list):
            emit(b"".join(s for s in stack[-1] if isinstance(s, bytes)))
        stack = stack[-8:]  # operands are consumed loosely; bound the stack
    return boxes


def parse_pdf_real(payload: bytes) -> list[dict]:
    """Text-subset PDF -> positioned boxes. Raises ValueError (the row-level
    error channel) on non-PDF bytes, bad Flate data, or a PDF with no text
    content stream. Font-aware since r5: /Font resources resolve to
    per-font decoders (WinAnsiEncoding, /Differences via the AGL subset,
    /ToUnicode CMaps) switched by Tf."""
    import zlib

    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    page_h = 792.0
    m = _MEDIABOX_RE.search(payload)
    if m:
        page_h = float(m.group(4)) - float(m.group(2))

    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for num, head, data in _iter_objects(payload):
        # LAST definition wins: incremental updates append replacement
        # objects at the end of the file (resolving via the newest xref
        # chain would agree for the append-only updates crawls see)
        objects[num] = (head, data)

    def inflate(head: bytes, data: bytes) -> bytes:
        if b"/FlateDecode" in head:
            try:
                return zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"bad FlateDecode stream: {e}")
        return data

    fonts = _build_fonts(objects, inflate)

    boxes: list[dict] = []
    saw_text_stream = False
    for num, (head, data) in objects.items():
        if data is None:
            continue
        data = inflate(head, data)
        if b"BT" not in data:
            continue
        saw_text_stream = True
        boxes.extend(_parse_content(data, page_h, fonts))
    if not saw_text_stream:
        raise ValueError("PDF contains no text content stream")
    return boxes


def _esc_pdf(s: str, codec: str = "latin-1") -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode(codec, "replace")


def make_pdf(boxes: list[dict], page_w: float = 612.0, page_h: float = 792.0,
             compress: bool = True, encoding: str | None = None) -> bytes:
    """Boxes (top-down coords, the shape parse_pdf returns) -> a valid
    single-page Helvetica PDF (xref + trailer; FlateDecode by default).
    The engine's PDF SINK twin — round-trips through parse_pdf.
    encoding='winansi' declares /Encoding /WinAnsiEncoding and encodes
    text as cp1252, so accented/€-range text round-trips exactly through
    the r5 font-aware parser."""
    import zlib

    if encoding not in (None, "winansi"):
        raise ValueError("encoding must be None or 'winansi'")
    codec = "cp1252" if encoding == "winansi" else "latin-1"
    parts = [b"BT"]
    for b in boxes:
        size = b.get("h", 12.0) or 12.0
        ypdf = page_h - b["y"] - size
        parts.append(f"/F1 {size:g} Tf".encode())
        parts.append(f"1 0 0 1 {b['x']:g} {ypdf:g} Tm".encode())
        parts.append(b"(" + _esc_pdf(b.get("text") or "", codec) + b") Tj")
    parts.append(b"ET")
    content = b"\n".join(parts)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "

    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
    if encoding == "winansi":
        font += b" /Encoding /WinAnsiEncoding"
    font += b" >>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w:g} {page_h:g}] "
         f"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>").encode(),
        b"<< " + filt + f"/Length {len(content)}".encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        font,
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


def parse_pdf(payload: bytes, fake: bool = False) -> list[dict]:
    """Genuine `%PDF-` payloads parse FOR REAL (parse_pdf_real, pure
    stdlib text-subset). Non-PDF payloads keep the deterministic fake
    decoder behind fake=True (hash -> stable box set) so plumbing tests
    don't need to build real documents."""
    if payload[:5] == b"%PDF-":
        return parse_pdf_real(payload)
    if not fake:
        raise NotImplementedError(
            "payload is not a PDF; scanned/image PDFs would need OCR "
            "(not available in this environment) — pass fake=True for "
            "the deterministic test decoder"
        )
    h = hashlib.sha256(payload).digest()
    boxes = []
    n = 4 + h[0] % 5
    for i in range(n):
        col = i % 2
        boxes.append({
            "x": 50.0 + col * 300.0,
            "y": 80.0 + (i // 2) * 40.0 + h[i + 1] % 7,
            "w": 200.0, "h": 20.0,
            "text": f"box {i} {h[i + 2]:02x}",
        })
    return boxes
