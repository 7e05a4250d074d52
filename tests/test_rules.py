"""Rule-config loader + property-based robustness tests."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from space_launch_telemetry_analyzer_spark.functions.parse import (
    extract_single_value,
    extract_time,
    seconds_to_hhmmss,
)
from space_launch_telemetry_analyzer_spark.operators.extract import extract_page, parse_blocks
from space_launch_telemetry_analyzer_spark.rules import RuleConfig, default_config
from space_launch_telemetry_analyzer_spark.sources.pages import render_page


def test_load_default_profile():
    """JSON profile -> typed rules (ROIManager.reload analog), equivalent to
    the built-in default_config."""
    cfg = RuleConfig.load("configs/default.json")
    assert cfg == default_config()
    assert cfg.get_rule_for_id("time").measurement_unit == r"[+-]\d{2}:\d{2}:\d{2}"
    assert [r.id for r in cfg.get_rules_for_series("primary")] == [
        "speed", "altitude", "engines", "fuel",
    ]
    active_at_50 = {(r.id, r.series) for r in cfg.get_active_rules(50)}
    assert ("speed", "secondary") not in active_at_50
    assert ("speed", "secondary") in {(r.id, r.series) for r in cfg.get_active_rules(100)}


def test_config_roundtrip(tmp_path):
    """save -> load round trip (≅ config_gui save_config/load_config)."""
    cfg = default_config()
    p = tmp_path / "cfg.json"
    cfg.save(p)
    assert RuleConfig.load(p) == cfg
    assert RuleConfig.from_dict(cfg.to_dict()) == cfg


def test_empty_profile_extracts_text_only():
    cfg = RuleConfig.load("configs/text_only.json")
    html = render_page(7, ["plain paragraph with plenty of words to classify"]).encode()
    r = extract_page(html, cfg, 7)
    assert r["extracted_text"] == "plain paragraph with plenty of words to classify"
    assert r["speed"] is None and r["spans"] == []


# --- property-based robustness (the reference has none; SURVEY §5) ----------

@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_parse_never_raises_on_byte_soup(data):
    """Arbitrary byte soup -> a row, never an exception (error-as-data)."""
    r = extract_page(data, default_config(), None)
    assert ("extracted_text" in r) and ("error" in r)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=1024))
def test_blocks_never_raise_on_printable_soup(text):
    blocks = parse_blocks(text)
    assert blocks[0].block_idx == 0


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.printable, max_size=200))
def test_single_value_matches_reference_semantics(text):
    """extract_single_value ≡ first \\d+(\\.\\d+)? after comma strip."""
    import re

    got = extract_single_value(text)
    m = re.search(r"\d+(?:\.\d+)?", text.replace(",", ""))
    assert got == (float(m.group(0)) if m else None)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-359999, max_value=359999))
def test_hhmmss_roundtrip(seconds):
    """Reference semantics (flight_plotting.py:145-156): hour dropped when 0
    ('MM:SS'), negatives via floor-div ('-1:58:45'), so the roundtrip is
    h*3600 + m*60 + s with a SIGNED hour field."""
    s = seconds_to_hhmmss(float(seconds))
    parts = s.split(":")
    if len(parts) == 2:
        val = int(parts[0]) * 60 + int(parts[1])
    else:
        val = int(parts[0]) * 3600 + int(parts[1]) * 60 + int(parts[2])
    assert val == seconds


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=99),
    st.integers(min_value=0, max_value=99),
    st.integers(min_value=0, max_value=99),
    st.sampled_from(["+", "-"]),
)
def test_time_parse_roundtrip(h, m, s, sign):
    tok = f"{sign}{h:02d}:{m:02d}:{s:02d}"
    assert extract_time(f"noise {tok} noise") == {
        "sign": sign, "hours": h, "minutes": m, "seconds": s,
    }


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase + " ", min_size=30, max_size=120)
        .map(lambda s: " ".join(("w" + w for w in s.split())) or "w filler words here now ok"),
        min_size=1,
        max_size=4,
    )
)
def test_render_extract_roundtrip_random_paragraphs(paras):
    """Generator/extractor round trip holds for arbitrary word-salad
    paragraphs (≥5 words each), not just the seeded fixtures."""
    paras = [p if len(p.split()) >= 5 else p + " pad pad pad pad pad" for p in paras]
    html = render_page(3, paras).encode()
    r = extract_page(html, default_config(), 3)
    assert r["extracted_text"] == "\n".join(paras)
