"""Fixed StructType schemas for the engine's tables.

The reference's row type is an implicit nested dict assembled at
ocr/extract_data.py:138-210 and frame_processing.py:30-40 (SURVEY.md §1.2).
Here every table has a fixed, declared schema so Catalyst can prune columns
and push filters; nothing is inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages table (BASELINE.json input_hint).
# Analog of the reference's video: one row per frame/page; (url, warc_ts) is
# the row identity the way frame_number is (validation.py:74-93).
# ---------------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# DOM block array: the flattened intermediate the extraction kernel builds
# from html — the analog of the reference's ROI crops (slice_roi,
# ocr/extract_data.py:18-27), except we flatten the whole page once and
# *select* blocks instead of re-cropping per rule.
# ---------------------------------------------------------------------------
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("css_class", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_chars", T.IntegerType(), False),
        T.StructField("n_words", T.IntegerType(), False),
        T.StructField("n_link_chars", T.IntegerType(), False),
        T.StructField("link_density", T.DoubleType(), False),
        T.StructField("is_content", T.BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Extraction output: one row per page, nulls-not-failures (the reference's
# per-row error channel, frame_processing.py:41-50 — a failed page is still
# a row). Field layout mirrors SURVEY.md §1.2 with "series" ≅ vehicle.
# ---------------------------------------------------------------------------
TIME_SCHEMA = T.StructType(
    [
        T.StructField("sign", T.StringType(), True),
        T.StructField("hours", T.IntegerType(), True),
        T.StructField("minutes", T.IntegerType(), True),
        T.StructField("seconds", T.IntegerType(), True),
    ]
)

FIELD_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("series", T.StringType(), True),
        T.StructField("block_idx", T.IntegerType(), True),
        T.StructField("raw", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

EXTRACTION_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("bucket", T.IntegerType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("n_content_blocks", T.IntegerType(), True),
        T.StructField("speed", T.DoubleType(), True),
        T.StructField("altitude", T.DoubleType(), True),
        T.StructField("time", TIME_SCHEMA, True),
        T.StructField("fuel_lox", T.DoubleType(), True),
        T.StructField("fuel_ch4", T.DoubleType(), True),
        T.StructField("engines", T.MapType(T.StringType(), T.ArrayType(T.BooleanType())), True),
        T.StructField("spans", T.ArrayType(FIELD_SPAN_SCHEMA), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Per-partition lineage/metrics row (north_rule): the distributed analog of
# the reference's shared progress counter + batch summary
# (batch_processing.py:130-171, :189-208).
# ---------------------------------------------------------------------------
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), True),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("n_empty", T.LongType(), False),
        T.StructField("input_bytes", T.LongType(), False),
        T.StructField("output_chars", T.LongType(), False),
        T.StructField("wall_seconds", T.DoubleType(), False),
    ]
)

# Checkpoint table for resumability: one row per completed bucket per run.
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)
