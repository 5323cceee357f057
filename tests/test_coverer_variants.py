"""Coverer parameter variants: level_mod, the quickstart (8,15,500)
shape, interior⊆covering, and CellUnion expand-by-radius
(SURVEY.md §2.6–§2.7 long tail)."""

import numpy as np

from s2spark.coverer import RegionCoverer
from s2spark.geometry import (
    Cap,
    CellUnion,
    cid_from_lat_lng,
    cid_level,
)
from s2spark.metrics import MIN_WIDTH

RNG = np.random.default_rng(11)
CAP = Cap.from_lat_lng_radius(40.0, 10.0, 0.05)


def _covers_samples(union: CellUnion, region, n=800) -> bool:
    for _ in range(n):
        la = RNG.uniform(37, 43)
        ln = RNG.uniform(6, 14)
        if region.contains_latlng(la, ln) \
                and not union.contains_cellid(cid_from_lat_lng(la, ln)):
            return False
    return True


def test_level_mod_2_and_3():
    for mod in (2, 3):
        r = RegionCoverer(min_level=4, max_level=16, max_cells=64,
                          level_mod=mod)
        cov = r.get_covering(CAP)
        assert 0 < len(cov) <= 64
        # raw covering cells obey (level - min_level) % mod == 0;
        # normalization may merge quads, shifting levels by whole
        # subdivision steps only
        assert _covers_samples(cov, CAP)


def test_quickstart_variant_shape():
    r = RegionCoverer(min_level=8, max_level=15, max_cells=500)
    cov = r.get_covering(CAP)
    assert len(cov) <= 500
    assert max(cid_level(c) for c in cov.ids) <= 15
    assert _covers_samples(cov, CAP)
    interior = r.get_interior_covering(CAP)
    for c in interior.ids:
        assert cov.contains_cellid(c)


def test_expand_by_radius_guarantee():
    """CellUnion.expand(min_radius): every point within the radius of
    the original region is covered after dilation."""
    r = RegionCoverer(max_cells=32)
    cov = r.get_covering(CAP)
    radius = 0.02
    grown = cov.expand_radius(radius)
    # sample points in the annulus [cap_r, cap_r + 0.9*radius]
    for _ in range(500):
        theta = RNG.uniform(0, 2 * np.pi)
        d = RNG.uniform(CAP.angle(), CAP.angle() + 0.9 * radius)
        la = 40.0 + np.degrees(d) * np.cos(theta)
        ln = 10.0 + np.degrees(d) * np.sin(theta) / np.cos(np.radians(40.0))
        assert grown.contains_cellid(cid_from_lat_lng(la, ln))


def test_metric_level_monotone():
    for level in range(0, 30):
        w = MIN_WIDTH.get_value(level)
        assert MIN_WIDTH.get_max_level(w) == level
        assert MIN_WIDTH.get_value(level + 1) < w
