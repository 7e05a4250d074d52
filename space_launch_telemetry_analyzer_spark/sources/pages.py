"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1).

The analog of the reference's golden fixtures (`tests/test_data/ocr_samples/
*.png`, SURVEY.md §5.3): pages are generated from the row id alone by pure
closed-form formulas, so the expected extraction result is known exactly and
the byte-identical contract is testable at any scale without external data.

Layout is FROZEN (changing it invalidates golden tests):
- boilerplate chrome with high link density: <nav>, sidebar link-farm
  <ul><li><a>, <footer>;
- a telemetry strip (div.telemetry) carrying the field spans the rule config
  selects (span.speed/.alt/.speed2/.tplus, ul.status, div.gauges) — the ROI
  analog (configs/default_rois.json in the reference);
- <main><article> with the real content paragraphs (high text density).

The pre-rendered `text` column IS the expected extracted main text, so
`extracted_text == text` byte-for-byte is the golden assertion.

Generation is distributed: `spark.range(n)` -> column expressions for
url/host/ts + one `mapInPandas` for html rendering; every value derives only
from `id`, never from partitioning, so output is stable under any layout.
"""

from __future__ import annotations

import html as _html
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import MPH_TO_KMH

# Zipf-ish host pool: host 0 is the mega-host (~30% of rows) to exercise
# salting (north_rule), the rest spread thin — ≅ FIXTURES.md F1.
N_HOSTS = 64
MEGA_HOST_SHARE_MOD = 10  # ids with id % 10 < 3 -> host 0 (30%)

WORDS = (
    "telemetry launch booster stage orbit apogee thrust nominal vector "
    "ascent downrange velocity trajectory propellant chamber nozzle gimbal "
    "payload fairing separation ignition throttle maxq entry landing burn"
).split()

ENGINE_SECTIONS = (("central_stack", 3), ("inner_ring", 10), ("outer_ring", 20))


def host_of(i: int) -> str:
    if i % MEGA_HOST_SHARE_MOD < 3:
        return "mega.example.com"
    return f"host{(i * 2654435761) % (N_HOSTS - 1)}.example.org"


def field_values(i: int) -> dict:
    """Closed-form expected field values for row id ``i`` — the oracle."""
    t = i % 1200 - 60  # T-minus 60s .. T+19min
    sign = "-" if t < 0 else "+"
    at = abs(t)
    speed_kmh = float((i * 7) % 28000)
    alt_km = float((i * 13) % 2000) / 10.0
    speed2_mph = float((i * 3) % 700)
    lox = float(100 - (i % 101))
    ch4 = max(0.0, lox - 40.0) if i % 7 == 0 else lox
    engines = [((i + j) % 3) != 0 for j in range(sum(n for _, n in ENGINE_SECTIONS))]
    return {
        "time_sign": sign,
        "time_h": at // 3600,
        "time_m": (at % 3600) // 60,
        "time_s": at % 60,
        "speed_kmh": speed_kmh,
        "alt_km": alt_km,
        "speed2_mph": speed2_mph,
        "speed2_kmh": speed2_mph * MPH_TO_KMH,
        "lox": lox,
        "ch4": ch4,
        "engine_bools": engines,
    }


def paragraphs_of(i: int, n_paras: int | None = None) -> list[str]:
    """Deterministic word-salad main content; ≥5 words per paragraph so the
    density classifier keeps them (see operators/extract.py thresholds)."""
    n_paras = n_paras if n_paras is not None else 2 + (i % 4)
    paras = []
    for p in range(n_paras):
        n_words = 8 + ((i + p * 31) % 25)
        ws = [WORDS[(i + p * 7 + k * 3) % len(WORDS)] for k in range(n_words)]
        paras.append(" ".join(ws))
    return paras


def render_page(i: int, paragraphs: list[str], fields: dict | None = None) -> str:
    """FROZEN page template. `paragraphs` become the expected extracted text
    (joined with '\\n'); everything else is boilerplate or telemetry spans."""
    f = fields if fields is not None else field_values(i)
    nav = (
        '<nav class="top"><a href="/">Home</a> <a href="/news">News</a> '
        '<a href="/launches">Launches</a> <a href="/about">About</a></nav>'
    )
    farm = "".join(
        f'<li><a href="/l/{k}">related launch coverage item {k}</a></li>' for k in range(8)
    )
    sidebar = f'<aside class="sidebar"><ul class="farm">{farm}</ul></aside>'
    lis = "".join(
        f'<li class="{"on" if b else "off"}"></li>' for b in f["engine_bools"]
    )
    telemetry = (
        '<div class="telemetry">'
        f'<span class="tplus">T{f["time_sign"]}{f["time_h"]:02d}:{f["time_m"]:02d}:{f["time_s"]:02d}</span>'
        f'<span class="speed">{f["speed_kmh"]:,.0f} km/h</span>'
        f'<span class="alt">{f["alt_km"]:.1f} km</span>'
        f'<span class="speed2">{f["speed2_mph"]:.0f} mph</span>'
        f'<ul class="status">{lis}</ul>'
        f'<div class="gauges"><span class="lox">{f["lox"]:.1f}%</span>'
        f'<span class="ch4">{f["ch4"]:.1f}%</span></div>'
        "</div>"
    )
    body_paras = "".join(f"<p>{_html.escape(p)}</p>" for p in paragraphs)
    footer = (
        '<footer><a href="/terms">Terms of use</a> <a href="/privacy">Privacy</a> '
        "<span>© example launch tracker</span></footer>"
    )
    return (
        f"<html><head><title>Launch page {i}</title></head><body>"
        f"{nav}{sidebar}{telemetry}<main><article>{body_paras}</article></main>{footer}"
        "</body></html>"
    )


def expected_text(i: int) -> str:
    return "\n".join(paragraphs_of(i))


def synth_pages_df(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table: (row_idx, url, warc_ts, html,
    text, lang) — `text` is the golden expected extraction."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "row_idx": ids,
                "url": [f"https://{host_of(int(i))}/page/{int(i)}" for i in ids],
                "warc_ts": pd.to_datetime(
                    [1704067200 + int(i) * 17 + (int(i) * 37) % 11 for i in ids], unit="s"
                ),
                "html": [render_page(int(i), paragraphs_of(int(i))).encode("utf-8") for i in ids],
                "text": [expected_text(int(i)) for i in ids],
                "lang": [("en", "en", "en", "de", "fr", "")[int(i) % 6] for i in ids],
            }
            yield pd.DataFrame(rows)

    rng = spark.range(n_rows, numPartitions=partitions or max(8, n_rows // 4096))
    return rng.mapInPandas(
        gen,
        schema=(
            "row_idx long, url string, warc_ts timestamp, html binary, "
            "text string, lang string"
        ),
    )


def write_synth_pages(
    spark: SparkSession, path: str, n_rows: int, partitions: int | None = None
) -> None:
    """`partitions` controls the FILE COUNT of the written table — with the
    extraction kernel running on scan splits (no pre-kernel shuffle), single
    row-group files are the split-width floor, so benchmarks should write at
    least ~4-5 files per core (a real crawl table has thousands)."""
    synth_pages_df(spark, n_rows, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(path)


# ---------------------------------------------------------------------------
# Real-input ingest: WARC-derived exports -> PAGES_SCHEMA
# ---------------------------------------------------------------------------

def load_pages(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    validate: bool = True,
    require_unique_url: bool = True,
) -> DataFrame:
    """Load an external pages table (parquet or JSON-lines — the two shapes
    WARC-derived exports usually land in; the engine-side analog of the
    reference's S6 ingest boundary, download/downloader.py:10-120) and coerce
    it to PAGES_SCHEMA:

    - html: string -> utf-8 binary (binary passes through);
    - warc_ts: string -> to_timestamp, integral -> epoch-seconds timestamp;
    - missing optional columns (text, lang) -> typed NULLs;
    - url: required, cast to string.

    With validate=True the one-pass constraint check (sources/validate.py)
    runs and a failing report raises ValueError, so a bad input dies at job
    start instead of 40 stages in."""
    from ..schema import PAGES_SCHEMA

    if fmt == "parquet":
        raw = spark.read.parquet(path)
    elif fmt in ("json", "jsonl"):
        raw = spark.read.json(path)
    else:
        raise ValueError(f"unsupported pages format: {fmt}")

    have = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
    if "url" not in have:
        raise ValueError(f"input at {path} has no 'url' column (got {sorted(have)})")

    cols = [F.col("url").cast("string").alias("url")]
    if "warc_ts" in have:
        if have["warc_ts"].startswith("timestamp"):
            ts = F.col("warc_ts").cast("timestamp")
        elif have["warc_ts"] in ("bigint", "int", "long", "double"):
            ts = F.col("warc_ts").cast("double").cast("timestamp")  # epoch secs
        else:
            ts = F.to_timestamp(F.col("warc_ts"))
        cols.append(ts.alias("warc_ts"))
    else:
        cols.append(F.lit(None).cast("timestamp").alias("warc_ts"))
    if "html" in have:
        html = F.col("html") if have["html"] == "binary" else F.encode(F.col("html"), "UTF-8")
        cols.append(html.alias("html"))
    else:
        cols.append(F.lit(None).cast("binary").alias("html"))
    for opt in ("text", "lang"):
        cols.append(
            (F.col(opt).cast("string") if opt in have else F.lit(None).cast("string")).alias(opt)
        )
    # passthrough extras (e.g. row_idx) after the canonical five
    extras = [c for c in raw.columns if c not in {f.name for f in PAGES_SCHEMA.fields}]
    pages = raw.select(*cols, *extras)

    if validate:
        from .validate import validate_pages

        report = validate_pages(pages, require_unique_url=require_unique_url)
        if not report.ok:
            raise ValueError(f"pages input failed validation: {report.reasons()}")
    return pages
