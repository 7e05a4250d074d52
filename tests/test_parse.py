"""Golden parse-kernel tests: the byte-identical contract.

Cases ported verbatim from the reference suite
(tests/test_ocr/test_ocr.py:306-344) plus the conversion-factor cases from
utils/measurement_converter.py and FIXTURES.md F3. Each case is asserted on
BOTH the python kernel and the Column-expression twin so the two stay in
lockstep.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.functions import parse as P


# --- extract_single_value (ocr/ocr.py:196-212; tests ported from
# --- tests/test_ocr/test_ocr.py:306-323)
SINGLE_VALUE_CASES = [
    ("100", 100.0),
    ("speed is 100", 100.0),
    ("100 km/h", 100.0),
    ("100 200 300", 100.0),  # multiple numbers -> first
    ("no numbers here", None),
    ("1,234 km/h", 1234.0),  # thousands separator stripped
    ("12.5 km", 12.5),
    ("", None),
]


@pytest.mark.parametrize("text,expected", SINGLE_VALUE_CASES)
def test_extract_single_value_python(text, expected):
    assert P.extract_single_value(text) == expected


def test_extract_single_value_none():
    assert P.extract_single_value(None) is None


# --- extract_time (ocr/ocr.py:214-231; tests/test_ocr/test_ocr.py:326-344)
TIME_CASES = [
    ("+01:30:00", {"sign": "+", "hours": 1, "minutes": 30, "seconds": 0}),
    ("-00:05:15", {"sign": "-", "hours": 0, "minutes": 5, "seconds": 15}),
    ("Time is +01:30:00 now", {"sign": "+", "hours": 1, "minutes": 30, "seconds": 0}),
    ("01:30:00", None),  # missing sign
    ("+1:30:0", None),  # wrong width
    ("no time here", None),
    ("T+00:01:30", {"sign": "+", "hours": 0, "minutes": 1, "seconds": 30}),
]


@pytest.mark.parametrize("text,expected", TIME_CASES)
def test_extract_time_python(text, expected):
    assert P.extract_time(text) == expected


# --- unit conversion (utils/measurement_converter.py:6-63; FIXTURES.md F3)
def test_convert_measurement():
    assert P.convert_measurement(100.0, "speed", "km/h") == 100.0
    assert P.convert_measurement(62.0, "speed", "mph") == pytest.approx(99.77908)
    assert P.convert_measurement(5.0, "altitude", "km") == 5.0
    assert P.convert_measurement(10.0, "altitude", "mi") == pytest.approx(16.0934)
    assert P.convert_measurement(1000.0, "altitude", "ft") == pytest.approx(0.3048)
    with pytest.raises(ValueError):
        P.convert_measurement(1.0, "speed", "knots")
    with pytest.raises(ValueError):
        P.convert_measurement(1.0, "mass", "kg")


# --- hh:mm:ss formatting (flight_plotting.py:145-156, exact semantics:
# --- round half-even, hour dropped when 0, zero-padded, Python floor-div
# --- fall-through for negatives)
HHMMSS_CASES = [
    (0.0, "00:00"),
    (90.0, "01:30"),
    (3661.0, "01:01:01"),
    (5400.0, "01:30:00"),
    (-75.0, "-1:58:45"),  # -75//3600=-1, -75%3600=3525 -> 58, -75%60=45
    (59.5, "01:00"),  # half-even rounds to 60
    (58.5, "00:58"),  # half-even rounds to 58
    (-0.4, "00:00"),
]


@pytest.mark.parametrize("sec,expected", HHMMSS_CASES)
def test_seconds_to_hhmmss(sec, expected):
    assert P.seconds_to_hhmmss(sec) == expected


# --- event-string parse (flight_plotting.py:27-142, exact semantics)
EVENT_CASES = [
    ("01:02:03", (3723.0, None)),
    ("05:30", (330.0, None)),
    ("42", (42.0, None)),
    ("150", None),  # bare 3-digit token is NOT a time in the reference
    ("MECO@2:30", (150.0, "MECO")),
    ("2:30@MECO", (150.0, "MECO")),  # time accepted on either side
    ("90=MECO", (90.0, "MECO")),
    ("MECO=1:30", (90.0, "MECO")),
    ("1:30 MECO", (90.0, "MECO")),
    ("MECO 1:30", (90.0, "MECO")),
    ("42.5", None),  # numeric STRING is not a token (only int/float entries)
    ("not an event", None),
    ("", None),
    ("a@b=3", (3.0, "a@b")),  # '@' fails both sides -> '=' split wins
]


@pytest.mark.parametrize("ev,expected", EVENT_CASES)
def test_parse_event_time(ev, expected):
    assert P.parse_event_time(ev) == expected


def test_parse_event_time_numeric():
    assert P.parse_event_time(42) == (42.0, None)
    assert P.parse_event_time(42.5) == (42.5, None)
    assert P.parse_event_time(None) is None


# --- expression twins stay in lockstep with the python kernels -------------
def test_expression_twins(spark):
    texts = [t for t, _ in SINGLE_VALUE_CASES] + [t for t, _ in TIME_CASES]
    df = spark.createDataFrame([(t,) for t in texts], "txt string")
    rows = df.select(
        "txt",
        P.first_number_expr(F.col("txt")).alias("num"),
        P.time_struct_expr(F.col("txt")).alias("time"),
    ).collect()
    by_txt = {r["txt"]: r for r in rows}
    for t, expected in SINGLE_VALUE_CASES:
        assert by_txt[t]["num"] == expected, t
    for t, expected in TIME_CASES:
        got = by_txt[t]["time"].asDict()
        if expected is None:
            assert got == {"sign": None, "hours": None, "minutes": None, "seconds": None}, t
        else:
            assert got == expected, t


def test_convert_exprs(spark):
    df = spark.createDataFrame(
        [(62.0, "mph"), (100.0, "km/h"), (7.0, "knots")], "v double, u string"
    )
    rows = df.select(P.convert_speed_expr(F.col("v"), F.col("u")).alias("kmh")).collect()
    assert rows[0]["kmh"] == pytest.approx(99.77908)
    assert rows[1]["kmh"] == 100.0
    assert rows[2]["kmh"] is None  # unknown unit -> NULL (row-level error channel)

    df2 = spark.createDataFrame(
        [(1000.0, "ft"), (10.0, "mi"), (5.0, "km")], "v double, u string"
    )
    rows2 = df2.select(P.convert_altitude_expr(F.col("v"), F.col("u")).alias("km")).collect()
    assert rows2[0]["km"] == pytest.approx(0.3048)
    assert rows2[1]["km"] == pytest.approx(16.0934)
    assert rows2[2]["km"] == 5.0


def test_seconds_to_hhmmss_expr(spark):
    """Expression twin stays in lockstep with the python port on every case."""
    df = spark.createDataFrame([(s,) for s, _ in HHMMSS_CASES], "s double")
    got = [r["f"] for r in df.select("s", P.seconds_to_hhmmss_expr(F.col("s")).alias("f"))
           .orderBy("s").collect()]
    exp = [e for _, e in sorted(HHMMSS_CASES)]
    assert got == exp


def test_parse_event_expr(spark):
    """Expression twin of parse_event_times on every string case."""
    df = spark.createDataFrame([(i, ev) for i, (ev, _) in enumerate(EVENT_CASES)],
                               "i int, ev string")
    rows = df.select("i", P.parse_event_expr(F.col("ev")).alias("p")).collect()
    got = {r["i"]: (r["p"]["seconds"], r["p"]["label"]) for r in rows}
    for i, (_, expected) in enumerate(EVENT_CASES):
        exp = (None, None) if expected is None else expected
        assert got[i] == exp, EVENT_CASES[i]
