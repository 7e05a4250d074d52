"""WebVTT/SRT cue extraction: timing parse, tag strip, block skipping,
malformed handling, distributed operator + error channel."""

from __future__ import annotations

import pytest

from space_launch_telemetry_analyzer_spark.operators.subtitles import (
    parse_srt,
    parse_webvtt,
    subtitle_cues,
)

VTT = (
    "WEBVTT - demo\n\n"
    "NOTE a comment\nspanning lines\n\n"
    "intro\n00:01.000 --> 00:04.500 align:start position:10%\n"
    "<v Narrator>Liftoff <i>imminent</i>\n\n"
    "00:00:05.000 --> 00:00:07.250\nSecond cue line one\nline two\n\n"
    "STYLE\n::cue { color: red }\n\n"
    "garbage block without any timing line\n"
)


def test_webvtt_cues_and_blocks():
    d = parse_webvtt(VTT)
    assert d["cues"] == [
        (0, 1000, 4500, "Liftoff imminent"),
        (1, 5000, 7250, "Second cue line one\nline two"),
    ]
    assert d["n_bad"] == 1  # the garbage block; NOTE/STYLE skip silently


def test_webvtt_requires_header_and_bom_tolerated():
    with pytest.raises(ValueError, match="WEBVTT"):
        parse_webvtt("1\n00:00:01,000 --> 00:00:02,000\nx")
    d = parse_webvtt("﻿WEBVTT\n\n00:01.000 --> 00:02.000\nx")
    assert d["cues"][0][3] == "x"


def test_srt_cues_and_hour_arithmetic():
    d = parse_srt(
        "1\n00:00:01,000 --> 00:00:02,000\nHello there\n\n"
        "2\n01:02:03,456 --> 01:02:04,000\nWorld\n"
    )
    assert d["cues"][1] == (1, 3723456, 3724000, "World")
    # index line optional
    d2 = parse_srt("00:00:01,000 --> 00:00:02,000\nsolo\n")
    assert d2["cues"] == [(0, 1000, 2000, "solo")]
    with pytest.raises(ValueError, match="empty"):
        parse_srt("   \n\n  ")


def test_malformed_timestamps_counted_not_fatal():
    d = parse_srt(
        "1\n00:00:99x,000 --> 00:00:02,000\nbad\n\n"
        "2\n00:00:03,000 --> 00:00:04,000\ngood\n")
    assert d["n_bad"] == 1 and len(d["cues"]) == 1
    assert d["cues"][0][3] == "good"


def test_subtitle_cues_operator_auto_and_errors(spark):
    rows = [
        (1, VTT),
        (2, "1\n00:00:01,000 --> 00:00:02,500\nsrt payload\n"),
        (3, None),
        (4, "WEBVTT\n\nNOTE only comments here\n"),  # zero cues
    ]
    df = spark.createDataFrame(rows, "media_id long, doc string")
    got = {}
    for r in subtitle_cues(df, "media_id", "doc").collect():
        got.setdefault(r["media_id"], []).append(r)
    assert [c["text"] for c in sorted(got[1], key=lambda r: r["cue_index"])] \
        == ["Liftoff imminent", "Second cue line one\nline two"]
    assert got[1][0]["n_cues"] == 2 and got[1][0]["n_bad"] == 1
    assert got[2][0]["start_ms"] == 1000 and got[2][0]["end_ms"] == 2500
    assert got[3][0]["error"] == "ValueError: null document"
    # zero-cue doc still emits one row (ids never vanish)
    assert len(got[4]) == 1 and got[4][0]["cue_index"] is None
    assert got[4][0]["n_cues"] == 0 and got[4][0]["error"] is None


def test_subtitle_cues_bad_fmt_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "media_id long, doc string")
    with pytest.raises(ValueError, match="fmt"):
        subtitle_cues(df, "media_id", "doc", fmt="ass")


def test_route_subtitle_tracks_preference_and_fallback(spark):
    """Language routing: preference order wins; media with no preferred
    language fall back to the lowest track id; sniffed and explicit
    langs agree; unparsable chosen docs keep the error-channel row."""
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.operators.subtitles import (
        route_subtitle_tracks,
    )

    vtt = lambda lang, txt: (  # noqa: E731
        f"WEBVTT\nLanguage: {lang}\n\n"
        f"00:00:01.000 --> 00:00:02.000\n{txt}\n")
    rows = [
        # media 1: en + fr -> fr preferred
        (1, 0, vtt("en", "one-en")), (1, 1, vtt("fr", "one-fr")),
        # media 2: de + es (no preference hit) -> lowest track id (0)
        (2, 0, vtt("de", "two-de")), (2, 1, vtt("es", "two-es")),
        # media 3: header missing Language -> lang NULL -> fallback t=0
        (3, 0, "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nthree\n"),
        # media 4: chosen (only) track is garbage -> zero-cue row (the
        # auto format sniff falls to SRT, which counts malformed blocks
        # instead of raising — ids never vanish)
        (4, 0, "not a subtitle at all"),
    ]
    df = spark.createDataFrame(rows, "mid long, tid int, doc string")
    got = {r["media_id"]: r for r in route_subtitle_tracks(
        df, "mid", "tid", "doc", ["fr", "en"]).collect()}
    assert (got[1]["track_id"], got[1]["lang"], got[1]["text"]) == \
        (1, "fr", "one-fr")
    assert (got[2]["track_id"], got[2]["lang"]) == (0, "de")
    assert got[3]["track_id"] == 0 and got[3]["lang"] is None
    assert got[4]["cue_index"] is None and got[4]["n_cues"] == 0
    assert got[4]["n_bad"] >= 1
    # explicit lang column overrides sniffing
    df2 = df.withColumn("l", F.lit("fr"))
    got2 = route_subtitle_tracks(
        df2, "mid", "tid", "doc", ["fr"], lang_col="l").collect()
    assert all(r["lang"] == "fr" for r in got2)


def test_route_subtitle_tracks_requires_preferences(spark):
    import pytest as _pytest

    from space_launch_telemetry_analyzer_spark.operators.subtitles import (
        route_subtitle_tracks,
    )
    df = spark.createDataFrame([(1, 0, "WEBVTT\n\n")],
                               "mid long, tid int, doc string")
    with _pytest.raises(ValueError, match="preferences"):
        route_subtitle_tracks(df, "mid", "tid", "doc", [])


def test_route_subtitle_tracks_null_doc_survives(spark):
    """A NULL document must not crash routing: lang sniffs NULL, the
    track can still win by fallback, and the cue parser's error channel
    keeps the media id."""
    from space_launch_telemetry_analyzer_spark.operators.subtitles import (
        route_subtitle_tracks,
    )
    df = spark.createDataFrame([(1, 0, None)],
                               "mid long, tid int, doc string")
    rows = route_subtitle_tracks(df, "mid", "tid", "doc", ["en"]).collect()
    assert len(rows) == 1
    assert rows[0]["media_id"] == 1 and rows[0]["lang"] is None
    assert rows[0]["error"] is not None
