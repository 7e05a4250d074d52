"""Input-constraint validation: the analog of validate_video / validate_json
(processing/validation.py:12-93, plot/data_validation.py:7-28), adapted to a
distributed table: schema assertion driver-side, data constraints as ONE
aggregation pass returning a small report row (never a per-row collect)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import PAGES_SCHEMA

REQUIRED_PAGE_COLUMNS = {f.name: f.dataType.simpleString() for f in PAGES_SCHEMA.fields}


@dataclass
class ValidationReport:
    ok: bool
    n_rows: int
    n_null_url: int
    n_null_html: int
    n_dup_url: int
    schema_errors: list[str]

    def reasons(self) -> list[str]:
        out = list(self.schema_errors)
        if self.n_rows == 0:
            out.append("empty table (≅ frame_count == 0, validation.py:60-66)")
        if self.n_null_url:
            out.append(f"{self.n_null_url} rows with NULL url (row identity)")
        if self.n_dup_url:
            out.append(f"{self.n_dup_url} duplicate urls")
        return out


def validation_agg(pages: DataFrame) -> DataFrame:
    """The ONE-pass constraint aggregation as a 1-row DataFrame (S3/A18
    analog): row count, null identities, null payloads, duplicate urls.
    Driver-verifiable (queries.q_validate_report) and the engine half of
    validate_pages."""
    return pages.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("url").isNull(), 1).otherwise(0)).alias("null_url"),
        F.sum(F.when(F.col("html").isNull(), 1).otherwise(0)).alias("null_html"),
        (F.count("url") - F.countDistinct("url")).alias("dups"),  # count(url) skips NULLs
    )


def validate_pages(pages: DataFrame, require_unique_url: bool = True) -> ValidationReport:
    """Existence/openability become schema checks; frame_count>0 becomes a
    row-count check; NULL html is reported but allowed (it flows to the
    row-level error channel, like unreadable frames)."""
    schema_errors = []
    have = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    for name, typ in REQUIRED_PAGE_COLUMNS.items():
        if name not in have:
            schema_errors.append(f"missing column {name}:{typ}")
        elif have[name] != typ and not (typ, have[name]) == ("timestamp", "timestamp_ntz"):
            schema_errors.append(f"column {name} is {have[name]}, expected {typ}")

    row = validation_agg(pages).first()

    # the dup count is always REPORTED (callers warn on it); with
    # require_unique_url=False it just stops failing `ok` — real crawl
    # archives legitimately carry re-fetches of one url
    n_dup = int(row["dups"])
    ok = (not schema_errors and row["n"] > 0 and row["null_url"] == 0
          and (n_dup == 0 or not require_unique_url))
    return ValidationReport(
        ok=bool(ok),
        n_rows=int(row["n"]),
        n_null_url=int(row["null_url"] or 0),
        n_null_html=int(row["null_html"] or 0),
        n_dup_url=n_dup,
        schema_errors=schema_errors,
    )
