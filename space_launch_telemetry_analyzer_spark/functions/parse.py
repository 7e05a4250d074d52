r"""Field-parse kernels: exact semantic ports of the reference's parsers.

Each kernel exists twice, deliberately:

1. a **python** function — used inside the vectorized extraction kernel
   (operators/extract.py) where the input is already in pandas; and
2. a **Column expression** builder — used in the relational layer and in the
   driver-verified `queries()`, staying JVM-side / whole-stage-codegen so
   Catalyst can fold, push, and prune around it.

Ported semantics (byte-identical contract, see tests/test_parse.py):
- first-number parse  ≅ extract_single_value  (ocr/ocr.py:196-212):
  strip ',' (thousands), first match of \d+(?:\.\d+)?, as float, else None.
- time parse          ≅ extract_time          (ocr/ocr.py:214-231):
  re.search(regex) (default [+-]\d{2}:\d{2}:\d{2}) -> {sign,h,m,s}, else None.
- unit conversion     ≅ convert_measurement   (utils/measurement_converter.py:6-63):
  speed mph->km/h x1.60934; altitude mi->km x1.60934, ft->km x0.0003048;
  identity units pass through; unknown unit raises (expression twin -> NULL +
  caller-side validation, since a distributed job must not die on one row).
- hh:mm:ss formatting ≅ seconds_to_hhmmss     (plot/flight_plotting.py:145-156).
- event-string parse  ≅ parse_event_times     (plot/flight_plotting.py:27-142).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rules import DEFAULT_TIME_REGEX

NUMBER_RE = re.compile(r"\d+(?:\.\d+)?")
# exact factors from utils/measurement_converter.py:20,39,41 — byte-identical
# output depends on these floats
MPH_TO_KMH = 1.60934
MI_TO_KM = 1.60934
FT_TO_KM = 0.0003048
# G-force conversion, utils/constants.py:42
G_FORCE_CONVERSION = 9.81

# ---------------------------------------------------------------------------
# python twins (run inside the Arrow batch kernel)
# ---------------------------------------------------------------------------


def extract_single_value(text: str | None) -> float | None:
    """First number in text as float; ',' stripped first (ocr/ocr.py:196-212)."""
    if text is None:
        return None
    text = text.replace(",", "")
    m = NUMBER_RE.search(text)
    return float(m.group(0)) if m else None


def extract_time(text: str | None, regex: str = DEFAULT_TIME_REGEX) -> dict | None:
    """Signed hh:mm:ss struct or None (ocr/ocr.py:214-231)."""
    if text is None:
        return None
    m = re.search(regex, text)
    if not m:
        return None
    time_str = m.group(0)
    sign = time_str[0]
    hours, minutes, seconds = map(int, time_str[1:].split(":"))
    return {"sign": sign, "hours": hours, "minutes": minutes, "seconds": seconds}


def convert_measurement(value: float | None, measurement_type: str, from_unit: str) -> float | None:
    """Normalize to km/h (speed) / km (altitude); exact reference factors
    (utils/measurement_converter.py:6-63). Unknown unit raises, as there."""
    if value is None:
        return None
    if measurement_type == "speed":
        if from_unit == "km/h":
            return value
        if from_unit == "mph":
            return value * MPH_TO_KMH
        raise ValueError(f"Unsupported speed unit: {from_unit}")
    if measurement_type == "altitude":
        if from_unit == "km":
            return value
        if from_unit == "mi":
            return value * MI_TO_KM
        if from_unit == "ft":
            return value * FT_TO_KM
        raise ValueError(f"Unsupported altitude unit: {from_unit}")
    raise ValueError(f"Unsupported measurement type: {measurement_type}")


def seconds_to_hhmmss(seconds: float) -> str:
    """'h:mm:ss' label (flight_plotting.py:145-156)."""
    sign = "-" if seconds < 0 else ""
    s = abs(int(seconds))
    return f"{sign}{s // 3600}:{(s % 3600) // 60:02d}:{s % 60:02d}"


_EVENT_PATTERNS = (
    # 'Label@hh:mm:ss' / 'Label@seconds'
    re.compile(r"^(?P<label>.+?)@(?P<time>[\d:.]+)$"),
    # 'hh:mm:ss=Label' / 'seconds=Label'
    re.compile(r"^(?P<time>[\d:.]+)=(?P<label>.+)$"),
    # 'hh:mm:ss Label' / 'seconds Label'
    re.compile(r"^(?P<time>[\d:.]+)\s+(?P<label>.+)$"),
)


def _time_token_to_seconds(tok: str) -> float | None:
    """'hh:mm:ss' / 'mm:ss' / plain seconds -> seconds (flight_plotting.py:49-58)."""
    if ":" in tok:
        parts = tok.split(":")
        try:
            nums = [float(p) for p in parts]
        except ValueError:
            return None
        if len(nums) == 3:
            return nums[0] * 3600 + nums[1] * 60 + nums[2]
        if len(nums) == 2:
            return nums[0] * 60 + nums[1]
        return None
    try:
        return float(tok)
    except ValueError:
        return None


def parse_event_time(event: str) -> tuple[float, str] | None:
    """One event string -> (seconds, label); formats per
    plot/flight_plotting.py:27-142 ('hh:mm:ss', 'Label@time', 'time=Label',
    'time Label', bare numeric)."""
    event = event.strip()
    if not event:
        return None
    for pat in _EVENT_PATTERNS:
        m = pat.match(event)
        if m:
            t = _time_token_to_seconds(m.group("time"))
            if t is not None:
                return (t, m.group("label").strip())
    t = _time_token_to_seconds(event)
    if t is not None:
        return (t, "")
    return None


# ---------------------------------------------------------------------------
# Column-expression twins (JVM-side; used by queries() and the relational layer)
# ---------------------------------------------------------------------------


def first_number_expr(col: Column) -> Column:
    """extract_single_value as a codegen-able expression: comma-strip,
    first \\d+(?:\\.\\d+)? match, cast double, no-match -> NULL."""
    extracted = F.regexp_extract(F.regexp_replace(col, ",", ""), r"(\d+(?:\.\d+)?)", 1)
    return F.when(extracted != "", extracted.cast("double"))


def time_struct_expr(col: Column, regex: str = DEFAULT_TIME_REGEX) -> Column:
    """extract_time as an expression -> struct(sign, hours, minutes, seconds),
    all-NULL struct when no match."""
    tok = F.regexp_extract(col, f"({regex})", 1)
    ok = tok != ""
    return F.struct(
        F.when(ok, F.substring(tok, 1, 1)).alias("sign"),
        F.when(ok, F.substring(tok, 2, 2).cast("int")).alias("hours"),
        F.when(ok, F.substring(tok, 5, 2).cast("int")).alias("minutes"),
        F.when(ok, F.substring(tok, 8, 2).cast("int")).alias("seconds"),
    )


def convert_speed_expr(value: Column, unit: Column) -> Column:
    """convert_speed as an expression; unknown unit -> NULL (the row-level
    error channel replaces the reference's raise)."""
    return (
        F.when(unit == "km/h", value)
        .when(unit == "mph", value * F.lit(MPH_TO_KMH))
    )


def convert_altitude_expr(value: Column, unit: Column) -> Column:
    return (
        F.when(unit == "km", value)
        .when(unit == "mi", value * F.lit(MI_TO_KM))
        .when(unit == "ft", value * F.lit(FT_TO_KM))
    )


def seconds_to_hhmmss_expr(seconds: Column) -> Column:
    """seconds_to_hhmmss as an expression (inverse of time parse)."""
    sign = F.when(seconds < 0, F.lit("-")).otherwise(F.lit(""))
    s = F.abs(seconds.cast("long"))
    return F.concat(
        sign,
        (s / 3600).cast("long").cast("string"),
        F.lit(":"),
        F.lpad(((s % 3600) / 60).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((s % 60).cast("string"), 2, "0"),
    )
