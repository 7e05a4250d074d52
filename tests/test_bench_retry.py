"""bench.py query-leg outlier-retry discipline (VERDICT r5 "What's wrong"
#2: the r4/r5 driver artifacts published contention-noise readings for the
query suite because only the extraction legs had retry guards). These pin
the pure retry policy; the Spark wiring is exercised by the bench smoke.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "sla_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _runner(seq):
    it = iter(seq)
    return lambda: next(it)


def test_in_band_reading_runs_once():
    assert bench.readings_until_in_band(_runner([1.0]), band=1.0) == [1.0]


def test_exactly_at_threshold_is_not_an_outlier():
    # factor * band is the boundary: only strictly-greater readings retry
    assert bench.readings_until_in_band(_runner([2.0]), band=1.0) == [2.0]


def test_outlier_retries_until_in_band():
    got = bench.readings_until_in_band(_runner([9.0, 8.0, 1.2]), band=1.0)
    assert got == [9.0, 8.0, 1.2]
    assert min(got) == 1.2


def test_retry_budget_bounds_a_persistent_outlier():
    got = bench.readings_until_in_band(
        _runner([9.0] * 10), band=1.0, max_retries=3)
    assert got == [9.0] * 4  # initial + 3 retries
    assert min(got) > bench.QUERY_OUTLIER_FACTOR * 1.0  # still_over case


def test_no_band_means_single_reading():
    assert bench.readings_until_in_band(_runner([50.0]), band=None) == [50.0]


def test_every_headline_query_has_a_band():
    """The official config must band-check every headline query — a new
    headline entry without a recorded exclusive-window best would silently
    skip the retry guard."""
    missing = [q for q in bench.HEADLINE if q not in bench.EXPECTED_WARM]
    assert not missing, f"add exclusive-window bands for: {missing}"
