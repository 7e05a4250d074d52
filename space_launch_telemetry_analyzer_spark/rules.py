"""Extraction-rule config: the ROI-config analog.

The reference models "where/what to extract" as a small static JSON dimension
(`ocr/roi_manager.py:10-43` ROI, :71-105 manager/loader; schema documented in
its README.md:139-253): each ROI has an id (time/speed/altitude/engines/fuel),
a vehicle, an activation window (start_frame/end_frame, null = open), and a
stringly-typed `measurement_unit` that is either a unit ("km/h", "km") or —
for the time ROI — a regex (`[+-]\\d{2}:\\d{2}:\\d{2}`), consumed as such at
extract_data.py:163 -> ocr.py:184.

WX re-expression: the rectangle (x,y,w,h) becomes a CSS-ish block *selector*
("tag.class") over the flattened DOM block array, the frame window becomes a
row-index/timestamp activation window, everything else keeps the reference's
semantics (unit -> convert, regex -> parse). The config is loaded once on the
driver and broadcast to executors (the reference re-materializes it per
worker process via the pool initializer, batch_processing.py:139-149; Spark's
broadcast is the idiomatic equivalent).
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass, field
from pathlib import Path

DEFAULT_TIME_REGEX = r"[+-]\d{2}:\d{2}:\d{2}"


@functools.lru_cache(maxsize=1024)
def parse_selector(sel: str) -> tuple[str, str]:
    """'tag.class' -> (tag, class); 'tag' -> (tag, ''); '.class' -> ('', class).
    The ONE selector grammar — ExtractionRule.matches and the O(1) index in
    operators/extract.py both use it, so the slow and fast paths cannot
    drift. Cached: the extraction kernel calls it per rule per PAGE, and
    configs hold a handful of distinct selector strings."""
    if "." in sel:
        tag, cls = sel.split(".", 1)
    else:
        tag, cls = sel, ""
    return tag, cls


@dataclass(frozen=True)
class ExtractionRule:
    """One rule ≅ one ROI (ocr/roi_manager.py:10-43)."""

    id: str  # "time" | "speed" | "altitude" | "engines" | "fuel"
    selector: str  # "span.speed" — tag.class match on the block array
    series: str | None = None  # ≅ ROI.vehicle
    start_time: int | None = None  # activation window, null = open
    end_time: int | None = None
    measurement_unit: str | None = None  # unit string, or regex for "time"
    points: dict[str, int] = field(default_factory=dict)  # engines: section -> count

    def is_active(self, idx: int | None) -> bool:
        """Activation predicate, exact semantics of ROI.is_active
        (roi_manager.py:45-53): start <= idx < end, null bounds open."""
        if idx is None:
            return True
        if self.start_time is not None and idx < self.start_time:
            return False
        if self.end_time is not None and idx >= self.end_time:
            return False
        return True

    def matches(self, tag: str, css_class: str) -> bool:
        want_tag, want_class = parse_selector(self.selector)
        if want_tag and want_tag != tag:
            return False
        if want_class and want_class not in (css_class or "").split():
            return False
        return True


@dataclass(frozen=True)
class RuleConfig:
    """≅ ROIManager (roi_manager.py:71-123) — holds the rule list plus
    accessor methods; plain-data so it broadcasts cheaply."""

    version: int
    series: tuple[str, ...]
    rules: tuple[ExtractionRule, ...]
    time_unit: str = "rows"

    def get_active_rules(self, idx: int | None) -> list[ExtractionRule]:
        """≅ ROIManager.get_active_rois (roi_manager.py:107-110)."""
        return [r for r in self.rules if r.is_active(idx)]

    def get_rule_for_id(self, rule_id: str) -> ExtractionRule | None:
        """≅ get_roi_for_id (roi_manager.py:112-117)."""
        for r in self.rules:
            if r.id == rule_id:
                return r
        return None

    def get_rules_for_series(self, series: str) -> list[ExtractionRule]:
        """≅ get_rois_for_vehicle (roi_manager.py:119-123)."""
        return [r for r in self.rules if r.series == series]

    def to_dict(self) -> dict:
        """Round-trip serialization (≅ ROI.to_dict / ConfigModel.save_config,
        config_gui/models.py:46-60,:104-115)."""
        return {
            "version": self.version,
            "time_unit": self.time_unit,
            "series": list(self.series),
            "rules": [
                {
                    "id": r.id,
                    "selector": r.selector,
                    "series": r.series,
                    "start_time": r.start_time,
                    "end_time": r.end_time,
                    "measurement_unit": r.measurement_unit,
                    **({"points": dict(r.points)} if r.points else {}),
                }
                for r in self.rules
            ],
        }

    def save(self, path: str | Path) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.to_dict(), f, indent=2)

    @staticmethod
    def from_dict(d: dict) -> "RuleConfig":
        rules = tuple(
            ExtractionRule(
                id=r["id"],
                selector=r["selector"],
                series=r.get("series"),
                start_time=r.get("start_time"),
                end_time=r.get("end_time"),
                measurement_unit=r.get("measurement_unit"),
                points=dict(r.get("points") or {}),
            )
            for r in d.get("rules", [])
        )
        return RuleConfig(
            version=int(d.get("version", 1)),
            series=tuple(d.get("series", [])),
            rules=rules,
            time_unit=d.get("time_unit", "rows"),
        )

    @staticmethod
    def load(path: str | Path) -> "RuleConfig":
        """≅ ROIManager.reload (roi_manager.py:81-105): JSON -> typed list."""
        with open(path, encoding="utf-8") as f:
            return RuleConfig.from_dict(json.load(f))


def default_config() -> RuleConfig:
    """The default profile (≅ configs/default_rois.json), matching the
    synthetic pages generator in sources/pages.py and FIXTURES.md F2."""
    return RuleConfig.from_dict(
        {
            "version": 1,
            "time_unit": "rows",
            "series": ["primary", "secondary"],
            "rules": [
                {"id": "speed", "series": "primary", "selector": "span.speed",
                 "measurement_unit": "km/h"},
                {"id": "altitude", "series": "primary", "selector": "span.alt",
                 "measurement_unit": "km"},
                {"id": "speed", "series": "secondary", "selector": "span.speed2",
                 "start_time": 100, "end_time": 900, "measurement_unit": "mph"},
                {"id": "time", "series": None, "selector": "span.tplus",
                 "measurement_unit": DEFAULT_TIME_REGEX},
                {"id": "engines", "series": "primary", "selector": "ul.status",
                 "points": {"central_stack": 3, "inner_ring": 10, "outer_ring": 20}},
                {"id": "fuel", "series": "primary", "selector": "div.gauges"},
            ],
        }
    )
