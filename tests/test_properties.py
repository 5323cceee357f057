"""Hypothesis property tests over the kernels (SURVEY.md §5.2-1):
machine-generated edge cases beyond the seeded-random suites."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2spark.geometry import (
    CellUnion,
    cid_all_neighbors,
    cid_contains,
    cid_from_lat_lng,
    cid_level,
    cid_parent,
    cid_range_max,
    cid_range_min,
)
from s2spark.kernels import cellops as C
from s2spark.kernels import hilbert as H

lat_st = st.floats(min_value=-90.0, max_value=90.0,
                   allow_nan=False, allow_infinity=False)
lng_st = st.floats(min_value=-180.0, max_value=180.0,
                   allow_nan=False, allow_infinity=False)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=300, deadline=None)
@given(lat_st, lng_st)
def test_encode_decode_fixpoint(lat, lng):
    ids = H.lat_lng_to_cell_id(np.array([lat]), np.array([lng]))
    assert C.is_valid(ids).all()
    la2, ln2 = H.cell_id_to_lat_lng(ids)
    assert (H.lat_lng_to_cell_id(la2, ln2) == ids).all()


@settings(max_examples=300, deadline=None)
@given(lat_st, lng_st, level_st)
def test_parent_range_laws(lat, lng, lvl):
    leaf = cid_from_lat_lng(lat, lng)
    p = cid_parent(leaf, lvl)
    assert cid_level(p) == lvl
    assert cid_contains(p, leaf)
    assert cid_range_min(p) <= leaf <= cid_range_max(p)
    # monotone nesting up the lattice
    for coarser in (0, lvl // 2):
        assert cid_contains(cid_parent(leaf, coarser), p)


@settings(max_examples=150, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=1, max_value=14))
def test_neighbor_symmetry(lat, lng, lvl):
    c = cid_parent(cid_from_lat_lng(lat, lng), lvl)
    for nbr in cid_all_neighbors(c, lvl):
        assert cid_level(nbr) == lvl
        assert c in cid_all_neighbors(nbr, lvl)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(lat_st, lng_st, st.integers(2, 12)),
                min_size=1, max_size=12))
def test_cellunion_normalize_properties(specs):
    ids = [cid_parent(cid_from_lat_lng(la, ln), lvl)
           for la, ln, lvl in specs]
    u = CellUnion(ids)
    # covers every input cell
    for cid in ids:
        assert u.contains_cellid(cid)
    # no cell contains another (normalized)
    for i, a in enumerate(u.ids):
        for b in u.ids[i + 1:]:
            assert not cid_contains(a, b) and not cid_contains(b, a)
    # idempotent + leaf-count conservation under re-normalization
    again = CellUnion(u.ids)
    assert again.ids == u.ids


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st)
def test_token_roundtrip_prop(lat, lng):
    leaf = np.array([cid_from_lat_lng(lat, lng)], dtype=np.uint64)
    for lvl in (0, 7, 15, 30):
        c = C.parent(leaf, lvl)
        assert (C.from_token(C.to_token(c)) == c).all()
