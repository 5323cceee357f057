"""Spherical area functions (SURVEY.md §2.4 areas row): Girard/
L'Huilier exact areas, metric calibration, CellUnion area stats."""

import math

import numpy as np

from s2spark import metrics as M
from s2spark.coverer import RegionCoverer
from s2spark.geometry import Cap, CellUnion, cid_from_face
from s2spark.kernels import cellops as C
from s2spark.kernels import hilbert as H

RNG = np.random.default_rng(17)


def test_face_areas_sum_to_sphere():
    faces = np.array([cid_from_face(f) for f in range(6)], dtype=np.uint64)
    areas = C.cell_exact_area(faces)
    assert abs(areas.sum() - 4 * math.pi) < 1e-12
    # faces are congruent
    assert np.allclose(areas, areas[0], rtol=1e-12)


def test_children_areas_sum_to_parent():
    leaf = H.lat_lng_to_cell_id(RNG.uniform(-80, 80, 300),
                                RNG.uniform(-180, 180, 300))
    cells = np.unique(C.parent(leaf, 9))
    parents = C.cell_exact_area(cells)
    kids = C.cell_exact_area(C.children(cells).ravel()).reshape(-1, 4)
    np.testing.assert_allclose(kids.sum(axis=1), parents, rtol=1e-10)


def test_areas_within_metric_bounds():
    for lvl in (4, 8, 12):
        leaf = H.lat_lng_to_cell_id(RNG.uniform(-85, 85, 400),
                                    RNG.uniform(-180, 180, 400))
        a = C.cell_exact_area(np.unique(C.parent(leaf, lvl)))
        assert (a >= M.MIN_AREA.get_value(lvl) * (1 - 1e-9)).all()
        assert (a <= M.MAX_AREA.get_value(lvl) * (1 + 1e-9)).all()
        assert abs(C.cell_average_area(lvl) - M.AVG_AREA.get_value(lvl)) == 0


def test_covering_area_brackets_region_area():
    cap = Cap.from_lat_lng_radius(40.0, 10.0, 0.05)
    cov = RegionCoverer(max_cells=128).get_covering(cap)
    interior = RegionCoverer(max_cells=128).get_interior_covering(cap)
    assert interior.exact_area() <= cap.area() <= cov.exact_area()
    # average-based estimate agrees with exact within cell-shape spread
    assert 0.5 < cov.average_based_area() / cov.exact_area() < 2.0


def test_cellunion_area_additivity():
    u1 = CellUnion([cid_from_face(0)])
    u2 = CellUnion([cid_from_face(1)])
    both = CellUnion.get_union(u1, u2)
    assert abs(both.exact_area()
               - (u1.exact_area() + u2.exact_area())) < 1e-12
