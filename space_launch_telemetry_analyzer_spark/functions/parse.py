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


def seconds_to_hhmmss(sec: float) -> str:
    """Exact port of seconds_to_hhmmss (flight_plotting.py:145-156): round to
    int (Python half-even), zero-pad every field, DROP the hour field when
    zero; negatives fall through Python floor-div/positive-mod, so
    -75 -> '-1:58:45' (the reference has no explicit sign handling)."""
    try:
        sec_int = int(round(sec))
        h = sec_int // 3600
        m = (sec_int % 3600) // 60
        s = sec_int % 60
        if h:
            return f"{h:02d}:{m:02d}:{s:02d}"
        return f"{m:02d}:{s:02d}"
    except Exception:
        return str(sec)


# a time token is 1-3 colon-separated 1-2 digit integer groups — note the
# 2-digit cap: a bare '150' is NOT a valid token in the reference
_TIME_TOKEN_RE = re.compile(r"^\d{1,2}(:\d{1,2}){0,2}$")


def _is_time_token(tok: str) -> bool:
    """is_time_token, flight_plotting.py:46-47."""
    return bool(_TIME_TOKEN_RE.match(tok.strip()))


def _token_to_seconds(tok: str) -> int:
    """token_to_seconds, flight_plotting.py:49-58 (integer parts only)."""
    parts = [int(p) for p in tok.split(":")]
    if len(parts) == 3:
        return parts[0] * 3600 + parts[1] * 60 + parts[2]
    if len(parts) == 2:
        return parts[0] * 60 + parts[1]
    if len(parts) == 1:
        return parts[0]
    raise ValueError("Invalid time token")


def parse_event_time(event) -> tuple[float, str | None] | None:
    """One entry of parse_event_times (flight_plotting.py:27-142), exact
    semantics: numeric -> (float, None); '@' then '=' splits on the FIRST
    separator with the time token accepted on EITHER side (label = other
    side, empty -> None); two space-separated tokens with the time on either
    side; bare time token -> (t, None); anything else -> None (skipped).

    Documented deviation: the reference's isinstance(e, (int, float)) check
    (flight_plotting.py:33) accepts Python bools as numeric seconds (True ->
    (1.0, None)); we exclude bool deliberately — a boolean event time is a
    caller bug, and in the typed DataFrame pipeline the column is never
    boolean — so bools fall through to str() ('True' is no time token ->
    None)."""
    if event is None:
        return None
    if isinstance(event, (int, float)) and not isinstance(event, bool):
        return (float(event), None)
    s = str(event).strip()
    if not s:
        return None
    for sep in ("@", "="):
        if sep in s:
            left, right = (p.strip() for p in s.split(sep, 1))
            if _is_time_token(left):
                return (float(_token_to_seconds(left)), right or None)
            if _is_time_token(right):
                return (float(_token_to_seconds(right)), left or None)
    parts = s.split()
    if len(parts) == 2:
        a, b = parts
        if _is_time_token(a):
            return (float(_token_to_seconds(a)), b)
        if _is_time_token(b):
            return (float(_token_to_seconds(b)), a)
    if _is_time_token(s):
        return (float(_token_to_seconds(s)), None)
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
    """seconds_to_hhmmss (flight_plotting.py:145-156) as an expression, in
    lockstep with the python port: bround == Python round (half-even),
    floor/pmod == Python '//'/'%', '%02d' == Python f'{x:02d}' (the sign
    counts toward the width in both), hour field dropped when zero."""
    si = F.bround(seconds, 0).cast("long")
    h = F.floor(si / F.lit(3600.0)).cast("long")
    m = F.floor(F.pmod(si, 3600) / F.lit(60.0)).cast("long")
    s = F.pmod(si, 60).cast("long")
    return F.when(h != 0, F.format_string("%02d:%02d:%02d", h, m, s)).otherwise(
        F.format_string("%02d:%02d", m, s)
    )


_TIME_TOKEN_SQL_RE = r"^\d{1,2}(:\d{1,2}){0,2}$"


def _token_seconds_expr(tok: Column) -> Column:
    p = F.split(tok, ":")
    n = F.size(p)
    return (
        F.when(n == 3, p[0].cast("int") * 3600 + p[1].cast("int") * 60 + p[2].cast("int"))
        .when(n == 2, p[0].cast("int") * 60 + p[1].cast("int"))
        .otherwise(p[0].cast("int"))
    ).cast("double")


def parse_event_expr(col: Column) -> Column:
    """parse_event_times (flight_plotting.py:27-142) as an expression ->
    struct(seconds double, label string); unparseable -> both fields NULL.
    Same precedence as the python port: '@' split, '=' split (first
    separator, time on either side), two space tokens, bare token."""

    def out(sec: Column, lab: Column) -> Column:
        return F.struct(sec.alias("seconds"), lab.alias("label"))

    s = F.trim(col)
    branches: list[tuple[Column, Column]] = []
    for sep in ("@", "="):
        pos = F.instr(s, sep)
        left = F.trim(F.substring_index(s, sep, 1))
        right = F.trim(s.substr(pos + 1, F.length(s)))
        for tok, lab in ((left, right), (right, left)):
            branches.append(
                (
                    (pos > 0) & tok.rlike(_TIME_TOKEN_SQL_RE),
                    out(_token_seconds_expr(tok), F.nullif(lab, F.lit(""))),
                )
            )
    parts = F.split(s, r"\s+")
    two = F.size(parts) == 2
    for i, j in ((0, 1), (1, 0)):
        branches.append(
            (
                two & parts[i].rlike(_TIME_TOKEN_SQL_RE),
                out(_token_seconds_expr(parts[i]), parts[j]),
            )
        )
    branches.append(
        (
            s.rlike(_TIME_TOKEN_SQL_RE),
            out(_token_seconds_expr(s), F.lit(None).cast("string")),
        )
    )
    expr = None
    for cond, val in branches:
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(
        out(F.lit(None).cast("double"), F.lit(None).cast("string"))
    )
