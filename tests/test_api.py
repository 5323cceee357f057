"""Reference-parity OO sugar (Angle / LatLng / CellId): semantics
must agree with the engine's vectorized kernels and with the
reference library's documented behavior (sphere.py :: Angle, LatLng,
CellId)."""

import math

import numpy as np

from s2spark import geometry as G
from s2spark.api import Angle, CellId, LatLng
from s2spark.kernels import cellops, hilbert


def test_angle_basics():
    a = Angle.from_degrees(180.0)
    assert a.radians == math.pi
    assert Angle.from_radians(math.pi).degrees == 180.0
    assert Angle.from_degrees(10) < Angle.from_degrees(20)
    assert (Angle.from_degrees(10) + Angle.from_degrees(20)) \
        == Angle.from_degrees(30)
    assert abs(Angle.from_degrees(-45)) == Angle.from_degrees(45)


def test_latlng_normalized():
    n = LatLng.from_degrees(100.0, 370.0).normalized()
    assert n.lat.degrees == 90.0
    assert abs(n.lng.degrees - 10.0) < 1e-12
    s = LatLng.from_degrees(-100.0, -370.0).normalized()
    assert s.lat.degrees == -90.0
    assert abs(s.lng.degrees + 10.0) < 1e-12
    w = LatLng.from_degrees(0.0, 190.0).normalized()
    assert abs(w.lng.degrees + 170.0) < 1e-12
    assert LatLng.from_degrees(45, 45).is_valid()
    assert not LatLng.from_degrees(100, 0).is_valid()


def test_latlng_distance():
    d = LatLng.from_degrees(90, 0).get_distance(LatLng.from_degrees(-90, 0))
    assert abs(d.degrees - 180.0) < 1e-9
    d = LatLng.from_degrees(0, 0).get_distance(LatLng.from_degrees(0, 90))
    assert abs(d.degrees - 90.0) < 1e-9
    assert LatLng.from_degrees(10, 20).get_distance(
        LatLng.from_degrees(10, 20)).radians == 0.0


def test_latlng_point_roundtrip():
    ll = LatLng.from_degrees(37.7749, -122.4194)
    back = LatLng.from_point(ll.to_point())
    assert ll.approx_equals(back, 1e-12)


def test_cellid_matches_vectorized_kernels():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85, 85, 50)
    lng = rng.uniform(-179, 179, 50)
    ref = hilbert.lat_lng_to_cell_id(lat, lng)
    toks = cellops.to_token(ref)
    for la, ln, rid, tok in zip(lat, lng, ref, toks):
        c = CellId.from_lat_lng(LatLng.from_degrees(la, ln))
        assert c.id == int(rid)
        assert c.to_token() == tok
        assert CellId.from_token(tok) == c


def test_cellid_hierarchy_laws():
    c = CellId.from_lat_lng(LatLng.from_degrees(48.8584, 2.2945))
    assert c.is_leaf() and c.is_valid() and c.level() == 30
    p = c.parent(10)
    assert p.level() == 10 and p.contains(c) and p.intersects(c)
    kids = p.children()
    assert len(kids) == 4
    assert sum(k.contains(c) for k in kids) == 1
    for k in kids:
        assert k.parent() == p
    assert p.child_begin().id == kids[0].id
    assert p.child_end() == kids[3].next()
    assert p.range_min().id <= c.id <= p.range_max().id
    assert p.next().prev() == p
    assert not p.intersects(p.next())
    face = p.parent(0)
    assert face.is_face() and face.face() == p.face()


def test_cellid_neighbors_match_kernels():
    c = CellId.from_lat_lng(LatLng.from_degrees(35.0, 139.0)).parent(12)
    got = sorted(n.id for n in c.get_all_neighbors())
    ref = sorted(int(x) for x in cellops.get_all_neighbors(
        np.array([c.id], dtype=np.uint64), 12)[0])
    assert got == ref
    vn = c.get_vertex_neighbors(11)
    ref_vn, has4 = cellops.get_vertex_neighbors(
        np.array([c.id], dtype=np.uint64), 11)
    n = 3 + int(has4[0])
    assert [x.id for x in vn] == [int(v) for v in ref_vn[0][:n]]


def test_cellid_to_lat_lng_center_roundtrip():
    c = CellId.from_lat_lng(LatLng.from_degrees(-33.86, 151.21)).parent(16)
    center = c.to_lat_lng()
    assert CellId.from_lat_lng(center).parent(16) == c
