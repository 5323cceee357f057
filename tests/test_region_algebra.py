"""Region-algebra long tail (SURVEY.md §2.4 rect algebra + point
utils rows): cap rect bounds, rect intersection / from_center_size /
convolve_with_cap, distances, robust point utilities."""

import math

import numpy as np

from s2spark.geometry import (
    Cap,
    LatLngRect,
    angle_between,
    cross,
    dot,
    latlng_distance,
    latlng_to_point,
    normalize,
    origin_point,
    ortho,
    robust_cross_prod,
    simple_ccw,
)

RNG = np.random.default_rng(23)


def test_cap_rect_bound_contains_cap():
    for lat, lng, r in [(40, 10, 0.1), (85, 0, 0.2), (-89, 50, 0.05),
                        (0, 179.9, 0.3), (-40, -120, 1e-4)]:
        cap = Cap.from_lat_lng_radius(lat, lng, r)
        rect = cap.get_rect_bound()
        for _ in range(400):
            theta = RNG.uniform(0, 2 * np.pi)
            d = RNG.uniform(0, r)
            la = lat + math.degrees(d) * math.cos(theta)
            ln = lng + math.degrees(d) * math.sin(theta) / \
                max(math.cos(math.radians(lat)), 1e-6)
            if abs(la) <= 90 and cap.contains_latlng(la, ln):
                assert rect.contains_latlng(la, ((ln + 180) % 360) - 180)


def test_polar_cap_rect_bound_full_lng():
    rect = Cap.from_lat_lng_radius(89.0, 0.0, 0.1).get_rect_bound()
    assert rect.lng.is_full()
    assert rect.contains_latlng(89.5, 123.0)


def test_rect_intersection_and_union():
    a = LatLngRect.from_degrees(10, 10, 30, 40)
    b = LatLngRect.from_degrees(20, 30, 50, 70)
    inter = a.intersection(b)
    uni = a.union(b)
    for _ in range(800):
        la = RNG.uniform(5, 55)
        ln = RNG.uniform(5, 75)
        in_a = a.contains_latlng(la, ln)
        in_b = b.contains_latlng(la, ln)
        assert inter.contains_latlng(la, ln) == (in_a and in_b)
        if in_a or in_b:
            assert uni.contains_latlng(la, ln)
    disjoint = a.intersection(LatLngRect.from_degrees(60, 80, 70, 90))
    assert disjoint.is_empty()


def test_rect_intersection_seam():
    a = LatLngRect.from_degrees(0, 170, 20, -170)  # wraps
    b = LatLngRect.from_degrees(10, 175, 30, -160)  # wraps
    inter = a.intersection(b)
    assert inter.contains_latlng(15, 179)
    assert inter.contains_latlng(15, -175)
    assert not inter.contains_latlng(15, -165)
    assert not inter.contains_latlng(5, 179)


def test_from_center_size():
    r = LatLngRect.from_center_size(40, 10, 10, 20)
    assert r.contains_latlng(44.9, 19.9)
    assert r.contains_latlng(35.1, 0.1)
    assert not r.contains_latlng(45.1, 10)
    assert not r.contains_latlng(40, 20.1)


def test_convolve_with_cap_covers_dilation():
    rect = LatLngRect.from_degrees(10, 10, 20, 30)
    grown = rect.convolve_with_cap(0.05)
    for _ in range(500):
        la = RNG.uniform(8, 22)
        ln = RNG.uniform(8, 32)
        if rect.contains_latlng(la, ln):
            assert grown.contains_latlng(la, ln)
    # a point just beyond an edge but within the dilation radius
    assert grown.contains_latlng(10 - math.degrees(0.04), 20)
    assert grown.contains_latlng(20 + math.degrees(0.04), 20)


def test_distances():
    assert abs(latlng_distance(0, 0, 0, 90) - math.radians(90)) < 1e-12
    assert abs(latlng_distance(0, 0, 0, 180) - math.pi) < 1e-12
    assert latlng_distance(40, 10, 40, 10) == 0.0
    a = latlng_to_point(10, 20)
    assert abs(angle_between(a, a)) == 0.0


def test_point_utils():
    for _ in range(200):
        v = normalize(tuple(RNG.normal(size=3)))
        o = ortho(v)
        assert abs(dot(v, o)) < 1e-12
        assert abs(dot(o, o) - 1) < 1e-12
        r = robust_cross_prod(v, o)
        assert abs(dot(r, v)) < 1e-9 and abs(dot(r, o)) < 1e-9
    # robust for antiparallel inputs where plain cross vanishes
    v = (1.0, 0.0, 0.0)
    anti = (-1.0, 0.0, 0.0)
    assert cross(v, anti) == (0.0, 0.0, 0.0)
    r = robust_cross_prod(v, anti)
    assert dot(r, r) > 0
    # ccw orientation is antisymmetric
    a, b = latlng_to_point(0, 0), latlng_to_point(0, 10)
    c = latlng_to_point(10, 5)
    assert simple_ccw(a, b, c) != simple_ccw(b, a, c)
    assert dot(origin_point(), origin_point()) - 1 < 1e-12


def test_rect_get_distance():
    """LatLngRect.get_distance: 0 inside; matches dense boundary
    sampling within tolerance outside; latitude-only case exact."""
    import math

    import numpy as np

    from s2spark.geometry import LatLngRect, latlng_distance

    r = LatLngRect.from_degrees(10.0, 20.0, 30.0, 50.0)
    assert r.get_distance(15.0, 30.0) == 0.0
    # point due north of the rect, lng inside: pure lat distance
    assert abs(r.get_distance(40.0, 30.0) - math.radians(10.0)) < 1e-12
    assert abs(r.get_distance(-5.0, 30.0) - math.radians(15.0)) < 1e-12
    # brute-force check against boundary sampling
    rng = np.random.default_rng(11)
    edges = []
    for t in np.linspace(0.0, 1.0, 400):
        edges.append((10.0 + 20.0 * t, 20.0))
        edges.append((10.0 + 20.0 * t, 50.0))
        edges.append((10.0, 20.0 + 30.0 * t))
        edges.append((30.0, 20.0 + 30.0 * t))
    for _ in range(60):
        la = float(rng.uniform(-70, 80))
        ln = float(rng.uniform(-170, 170))
        if r.contains_latlng(la, ln):
            assert r.get_distance(la, ln) == 0.0
            continue
        brute = min(latlng_distance(la, ln, ela, eln)
                    for ela, eln in edges)
        got = r.get_distance(la, ln)
        assert got <= brute + 1e-9
        assert abs(got - brute) < 2e-3  # sampling resolution bound


def test_cap_get_distance():
    import math

    from s2spark.geometry import Cap, latlng_to_point

    cap = Cap.from_lat_lng_radius(40.0, 10.0, 0.1)
    assert cap.get_distance(latlng_to_point(40.0, 10.0)) == 0.0
    assert cap.get_distance(latlng_to_point(40.5, 10.0)) == 0.0  # inside
    # ~20 degrees north of the rim: distance = angle - radius
    p = latlng_to_point(60.0, 10.0)
    want = math.radians(20.0) - 0.1
    assert abs(cap.get_distance(p) - want) < 1e-9
    assert Cap.empty().get_distance(p) == float("inf")
