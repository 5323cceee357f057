"""Level <-> size calibration metrics (``sphere.py :: Metric`` and the
public S2 quadratic-projection constants; SURVEY.md §1.1 row 11).

Used to pick covering levels, kNN ring levels, and partition prefixes.
LengthMetric values scale as deriv·2^-level, AreaMetric as deriv·4^-level.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30


class LengthMetric:
    def __init__(self, deriv: float):
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        return self.deriv * math.ldexp(1.0, -level)

    def get_closest_level(self, value: float) -> int:
        """level whose metric is closest to ``value``
        (``Metric.get_closest_level``)."""
        return self.get_min_level(math.sqrt(2.0) * value)

    def get_min_level(self, value: float) -> int:
        """minimum level such that the metric is at most ``value``
        (``Metric.get_min_level``)."""
        if value <= 0:
            return MAX_LEVEL
        m, x = math.frexp(value / self.deriv)
        level = max(0, min(MAX_LEVEL, -(x - 1)))
        return level

    def get_max_level(self, value: float) -> int:
        """maximum level such that the metric is at least ``value``
        (``Metric.get_max_level``)."""
        if value <= 0:
            return MAX_LEVEL
        m, x = math.frexp(self.deriv / value)
        level = max(0, min(MAX_LEVEL, x - 1))
        return level


class AreaMetric:
    def __init__(self, deriv: float):
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        return self.deriv * math.ldexp(1.0, -2 * level)

    def get_max_level(self, value: float) -> int:
        """maximum level whose cell area is at least ``value``."""
        if value <= 0:
            return MAX_LEVEL
        level = int(math.floor(math.log2(self.deriv / value) / 2.0))
        return max(0, min(MAX_LEVEL, level))


# public S2 constants for the QUADRATIC projection (matches the
# reference's st_to_uv variant)
MIN_ANGLE_SPAN = LengthMetric(4.0 / 3)
MAX_ANGLE_SPAN = LengthMetric(1.704897179199218452)
AVG_ANGLE_SPAN = LengthMetric(math.pi / 2)

MIN_WIDTH = LengthMetric(2 * math.sqrt(2.0) / 3)
MAX_WIDTH = LengthMetric(MAX_ANGLE_SPAN.deriv)
AVG_WIDTH = LengthMetric(1.434523672886099389)

MIN_EDGE = LengthMetric(2 * math.sqrt(2.0) / 3)
MAX_EDGE = LengthMetric(MAX_ANGLE_SPAN.deriv)
AVG_EDGE = LengthMetric(1.459213746386106062)

MIN_DIAG = LengthMetric(8 * math.sqrt(2.0) / 9)
MAX_DIAG = LengthMetric(2.438654594434021032)
AVG_DIAG = LengthMetric(2.060422738998471683)

MIN_AREA = AreaMetric(8 * math.sqrt(2.0) / 9)
MAX_AREA = AreaMetric(2.635799256963161491)
AVG_AREA = AreaMetric(4 * math.pi / 6)
