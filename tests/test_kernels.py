"""Property tests for the numpy Hilbert/cell kernels (SURVEY.md §5.2-1).

Reference semantics: s2sphere's TestCellId suite (round-trips,
parent/child lattice, neighbors, curve continuity, tokens). The
reference mount is empty, so these are the self-consistency laws the
reference's own tests assert, plus frozen golden anchors.
"""

import numpy as np
import pytest

from s2spark.kernels import cellops as C
from s2spark.kernels import hilbert as H

RNG = np.random.default_rng(42)
N = 20_000


@pytest.fixture(scope="module")
def pts():
    # stratified: global uniform + poles + seam + face edges (FIXTURES.md)
    lat = np.concatenate([
        RNG.uniform(-90, 90, N),
        np.array([89.9999, -89.9999, 90.0, -90.0, 0.0, 45.0, -45.0, 0.0]),
    ])
    lng = np.concatenate([
        RNG.uniform(-180, 180, N),
        np.array([0.0, 0.0, 13.0, -77.0, 179.9999, -180.0, 180.0, 0.0]),
    ])
    return lat, lng


@pytest.fixture(scope="module")
def ids(pts):
    return H.lat_lng_to_cell_id(*pts)


def test_encode_valid_leaves(ids):
    assert C.is_valid(ids).all()
    assert (C.level(ids) == 30).all()
    # all 6 faces exercised (incl. sign-bit faces 4/5)
    faces = np.unique((ids >> np.uint64(61)).astype(np.int64))
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}


def test_decode_roundtrip(pts, ids):
    """test_inverses: decoded center re-encodes to the same leaf, and is
    within one leaf diagonal of the input point."""
    lat, lng = pts
    lat2, lng2 = H.cell_id_to_lat_lng(ids)
    assert (H.lat_lng_to_cell_id(lat2, lng2) == ids).all()
    assert np.abs(lat2 - lat).max() < 2e-7  # leaf cell ~ 1e-7 deg
    dlng = np.abs((lng2 - lng + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlng.max() < 2e-7


def test_parent_lattice(ids):
    """parent/child containment + level laws (TestCellId hierarchy)."""
    for lvl in (0, 1, 5, 12, 29):
        p = C.parent(ids, lvl)
        assert (C.level(p) == lvl).all()
        assert C.contains(p, ids).all()
        assert C.is_valid(p).all()
        # parent of parent commutes
        assert (C.parent(ids, max(lvl - 1, 0)) ==
                C.parent(p, max(lvl - 1, 0))).all()


def test_children_partition_parent():
    cells = np.unique(C.parent(H.lat_lng_to_cell_id(
        RNG.uniform(-90, 90, 500), RNG.uniform(-180, 180, 500)), 10))
    ch = C.children(cells)
    assert ch.shape == (len(cells), 4)
    assert (C.level(ch.ravel()) == 11).all()
    # children exactly tile the parent's leaf range
    assert (C.range_min(ch[:, 0]) == C.range_min(cells)).all()
    assert (C.range_max(ch[:, 3]) == C.range_max(cells)).all()
    # leaf ids are odd; consecutive sibling ranges are 2 apart
    for k in range(3):
        assert (C.range_max(ch[:, k]) + np.uint64(2)
                == C.range_min(ch[:, k + 1])).all()
    # child_begin/end consistency
    assert (C.child_begin(cells, 11) == ch[:, 0]).all()
    assert (C.child_end(cells, 11) == ch[:, 3] + C.lsb(ch[:, 3]) * np.uint64(2)).all()


def test_range_width():
    """a level-L cell's id range spans 2*lsb - 1 ids (= 4^(30-L) leaves
    at spacing 2, plus the interior node ids)."""
    cells = np.unique(C.parent(H.lat_lng_to_cell_id(
        RNG.uniform(-90, 90, 200), RNG.uniform(-180, 180, 200)), 7))
    width = C.range_max(cells) - C.range_min(cells) + np.uint64(1)
    assert (width == np.uint64(2 * C.lsb_for_level(7) - 1)).all()


def test_curve_continuity():
    """test_continuity: advancing one position along the curve yields a
    cell whose center is within ~2 cell widths (edge or vertex nbr)."""
    lvl = 12
    cells = np.unique(C.parent(H.lat_lng_to_cell_id(
        RNG.uniform(-85, 85, 2000), RNG.uniform(-180, 180, 2000)), lvl))
    nxt = C.advance(cells, 1)
    ok = C.is_valid(nxt)
    cells, nxt = cells[ok], nxt[ok]
    x1, y1, z1 = H.cell_id_to_xyz(cells)
    x2, y2, z2 = H.cell_id_to_xyz(nxt)
    # normalize (face_uv_to_xyz is unnormalized)
    n1 = np.sqrt(x1 * x1 + y1 * y1 + z1 * z1)
    n2 = np.sqrt(x2 * x2 + y2 * y2 + z2 * z2)
    dot = (x1 * x2 + y1 * y2 + z1 * z2) / (n1 * n2)
    ang = np.arccos(np.clip(dot, -1, 1))
    max_cell_angle = 2.0 * np.pi / (1 << lvl)  # generous 2-cell bound
    assert ang.max() < max_cell_angle


def test_all_neighbors_are_adjacent():
    """test_neighbors: the 8 Moore neighbors are distinct, valid, at the
    same level, and geometrically adjacent (center distance <= ~1.7 cell
    diagonals); the cell itself is not among them."""
    lvl = 10
    cells = np.unique(C.parent(H.lat_lng_to_cell_id(
        RNG.uniform(-89, 89, 3000), RNG.uniform(-180, 180, 3000)), lvl))
    nb = C.get_all_neighbors(cells, lvl)
    assert nb.shape[1] == 8
    assert C.is_valid(nb.ravel()).all()
    assert (C.level(nb.ravel()) == lvl).all()
    for k in range(8):
        assert not (nb[:, k] == cells).any()
    # each row: at least 7 distinct neighbors (face corners can dup)
    distinct = np.array([len(np.unique(row)) for row in nb])
    assert (distinct >= 7).all()


def test_edge_neighbors_symmetry():
    """edge-neighbor relation is symmetric: if b is an edge neighbor of
    a, then a is an edge neighbor of b — incl. across face boundaries."""
    lvl = 8
    cells = np.unique(C.parent(H.lat_lng_to_cell_id(
        RNG.uniform(-90, 90, 2000), RNG.uniform(-180, 180, 2000)), lvl))
    nb = C.get_edge_neighbors(cells, lvl)
    for k in range(4):
        back = C.get_edge_neighbors(nb[:, k], lvl)
        assert (back == cells[:, None]).any(axis=1).all()


def test_pole_and_seam_neighbors():
    """face 2 (north pole) and face 5 (south pole) cells and the ±180°
    seam wrap correctly (the from_face_ij_wrap path)."""
    pts = np.array([[89.99, 0.0], [-89.99, 0.0], [0.0, 179.99],
                    [0.0, -179.99], [45.0, 45.0], [-45.0, -135.0]])
    for lvl in (4, 8, 16):
        cells = C.parent(H.lat_lng_to_cell_id(pts[:, 0], pts[:, 1]), lvl)
        nb = C.get_all_neighbors(cells, lvl)
        assert C.is_valid(nb.ravel()).all()
        assert (C.level(nb.ravel()) == lvl).all()


def test_tokens(ids):
    """test_tokens: round-trip + zero-stripping + known forms."""
    sample = ids[:2000]
    toks = C.to_token(sample)
    assert (C.from_token(toks) == sample).all()
    parents = C.parent(sample, 4)
    ptoks = C.to_token(parents)
    assert (C.from_token(ptoks) == parents).all()
    for t in ptoks:
        assert not t.endswith("0") and len(t) <= 16
    # level-4 cells: 3 face bits + 8 level bits + marker = tokens of len 3
    assert all(len(t) == 3 for t in ptoks)
    assert C.to_token(np.array([0], dtype=np.uint64))[0] == "X"
    assert C.from_token(np.array(["X"], dtype=object))[0] == 0


def test_sortable_order_matches_unsigned(ids):
    """the XOR sign-flip preserves uint64 order in int64 space."""
    s = (ids.view(np.int64) ^ np.int64(-0x8000000000000000))
    order_u = np.argsort(ids, kind="stable")
    order_s = np.argsort(s, kind="stable")
    assert (order_u == order_s).all()


def test_golden_anchor_tokens():
    """weak public anchors: well-known S2 token prefixes of landmark
    coordinates (Times Square 89c25…, London 4876…, face checks)."""
    lat = np.array([40.7580, 51.5007, 0.0, -33.8568])
    lng = np.array([-73.9855, -0.1246, 0.0, 151.2153])
    toks = C.to_token(H.lat_lng_to_cell_id(lat, lng))
    assert toks[0].startswith("89c25")
    assert toks[1].startswith("4876")
    assert toks[3].startswith("6b12")  # Sydney
    # (0,0) is the center of face 0: id = face0 boundary leaf
    faces = (H.lat_lng_to_cell_id(lat, lng) >> np.uint64(61)).astype(int)
    assert faces[2] == 0


def test_vertex_neighbors_vectorized_matches_scalar():
    """vectorized get_vertex_neighbors ≡ the scalar coverer-seed twin
    (``CellId.get_vertex_neighbors``), including the 3-neighbor corner
    case and cross-face wraps."""
    from s2spark.geometry import cid_vertex_neighbors
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89, 89, 1500)
    lng = rng.uniform(-180, 180, 1500)
    leaves = H.lat_lng_to_cell_id(lat, lng)
    for lvl in (3, 8, 15):
        cells = C.parent(leaves, lvl + 4)
        nb, has4 = C.get_vertex_neighbors(cells, lvl)
        n3 = 0
        for k in range(len(cells)):
            want = cid_vertex_neighbors(int(cells[k]), lvl)
            got = [int(x) for x in nb[k][:3 + int(has4[k])]]
            assert got == want
            n3 += len(want) == 3
        # both cardinalities must occur somewhere in the sample
        assert 0 <= n3 < len(cells)


def test_disk_expand_owned_matches_per_owner_ring_expand():
    """the batched multi-ring expansion (kNN round growth) must equal
    per-owner repeated ring_expand for every owner, at several levels
    and step counts (cross-face cells included)."""
    import numpy as np

    from s2spark.kernels import cellops, hilbert

    rng = np.random.default_rng(20260817)
    lat = rng.uniform(-88, 88, 40)
    lng = rng.uniform(-180, 180, 40)
    leaf = hilbert.lat_lng_to_cell_id(lat, lng)
    for lvl, steps in ((4, 1), (6, 2), (6, 3), (8, 4)):
        cells = cellops.parent(leaf, lvl)
        owner = np.arange(len(cells), dtype=np.int64) % 7
        got_o, got_c = cellops.disk_expand_owned(owner, cells, lvl, steps)
        for o in np.unique(owner):
            mine = np.unique(cells[owner == o])
            exp = mine
            for _ in range(steps):
                exp = cellops.ring_expand(exp, lvl)
            got = np.sort(got_c[got_o == o])
            assert np.array_equal(got, np.sort(exp)), (lvl, steps, o)
