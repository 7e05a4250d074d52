"""Layout parsing: reading-order reconstruction over positioned text boxes
(the PDF/layout-parse leg of the north_rule).

The PDF *codec* is stubbed like the image decoders (no PDF library in this
container): `parse_pdf` raises NotImplementedError unless `fake=True`, where
a deterministic fake "decoder" turns the payload hash into a stable box set.
The LAYOUT logic — column detection + reading order — is real and tested:

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


def parse_pdf(payload: bytes, fake: bool = False) -> list[dict]:
    """STUB: real PDF text+box extraction needs a PDF library not present in
    this container. The fake decoder derives a deterministic box set from the
    payload hash so the layout plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "PDF parsing requires a PDF library (pdfminer/pypdf); not "
            "available in this environment — pass fake=True for the "
            "deterministic test decoder"
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
