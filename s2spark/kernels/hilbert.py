"""S2 CellId encode/decode as vectorized numpy kernels.

Semantics: the public S2 cell decomposition as implemented by
``s2sphere/sphere.py`` (symbols ``CellId.from_lat_lng``,
``CellId.from_point``, ``CellId.from_face_ij``, ``_init_lookup_cell``,
``CellId.to_face_ij_orientation``, ``CellId.to_lat_lng``,
``st_to_uv`` / ``uv_to_st`` (quadratic projection variant),
``face_uv_to_xyz`` / ``xyz_to_face_uv``; SURVEY.md §2.1).

Everything here operates on numpy arrays:
- cell ids are ``np.uint64`` (bit pattern identical to the reference's
  unbounded-int ids; the Spark layer views them as signed int64),
- geometry is ``float64``.

The 1024-entry Hilbert lookup tables are generated once at import by
the same recursion the reference uses, so encode/decode are bit-exact
by construction with any faithful S2 implementation.
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL  # 2^30
NUM_FACES = 6

# Hilbert curve orientation tables (public S2 constants).
# POS_TO_IJ[orientation][position] -> ij (2 bits: i<<1 | j)
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
# orientation adjustment for each of the 4 child positions
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

# lookup tables: (ij<<2)+orientation <-> (pos<<2)+orientation over
# LOOKUP_BITS=4 levels at a time.
_TABLE_SIZE = 1 << (2 * LOOKUP_BITS + 2)  # 1024
LOOKUP_POS = np.zeros(_TABLE_SIZE, dtype=np.uint64)
LOOKUP_IJ = np.zeros(_TABLE_SIZE, dtype=np.uint64)


def _init_lookup_cell(level: int, i: int, j: int, orig_orientation: int,
                      pos: int, orientation: int) -> None:
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
    else:
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for index in range(4):
            _init_lookup_cell(level, i + (r[index] >> 1), j + (r[index] & 1),
                              orig_orientation, pos + index,
                              orientation ^ POS_TO_ORIENTATION[index])


for _o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
    _init_lookup_cell(0, 0, 0, _o, 0, _o)

# uint64 scalar constants used in the hot loops
_U = np.uint64


# ---------------------------------------------------------------------------
# ST <-> UV (quadratic projection — must match the reference variant exactly)
# ---------------------------------------------------------------------------

def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Quadratic s∈[0,1] -> u∈[-1,1] (``sphere.py :: st_to_uv``)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Inverse quadratic u∈[-1,1] -> s∈[0,1] (``sphere.py :: uv_to_st``).

    Branch-free: one sqrt over |u| (identical values to the two-branch
    reference form — sqrt(1+3u) for u>=0, mirrored below).
    """
    u = np.asarray(u, dtype=np.float64)
    s = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, s, 1.0 - s)


def st_to_ij(s: np.ndarray) -> np.ndarray:
    """s∈[0,1] -> leaf-cell coordinate i∈[0, 2^30) (``CellId.st_to_ij``)."""
    return np.clip(np.floor(MAX_SIZE * np.asarray(s, dtype=np.float64)),
                   0, MAX_SIZE - 1).astype(np.int64)


# ---------------------------------------------------------------------------
# cube-face projection
# ---------------------------------------------------------------------------

def lat_lng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    """degrees -> unit xyz (``LatLng.to_point``)."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    return np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)


# per-face (u, v) component/sign tables for the gather-based projection
# below: u = USIGN[f] * P[UIDX[f]] / major, v = VSIGN[f] * P[VIDX[f]] / major
_UIDX = np.array([1, 0, 0, 2, 2, 1], dtype=np.int64)
_USGN = np.array([1.0, -1.0, -1.0, 1.0, 1.0, -1.0])
_VIDX = np.array([2, 2, 1, 1, 0, 0], dtype=np.int64)
_VSGN = np.array([1.0, 1.0, -1.0, 1.0, -1.0, -1.0])


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """xyz -> (face∈[0,6), u, v) (``xyz_to_face_uv`` + ``get_face``).

    Gather-based and branch-free: faces are argmax-by-|coord| (x beats
    y beats z on ties, the C++ tie order), u/v numerators are fetched
    with one fancy-index per axis from the per-face tables above —
    value-identical to the reference's per-face formulas.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    f = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    stacked = np.stack([x, y, z])  # (3, N)
    rng = np.arange(x.shape[0] if x.ndim else 1)
    major = stacked[f, rng]
    face = np.where(major < 0, f + 3, f).astype(np.int64)
    u = _USGN[face] * stacked[_UIDX[face], rng] / major
    v = _VSGN[face] * stacked[_VIDX[face], rng] / major
    return face, u, v


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """(face,u,v) -> xyz, unnormalized (``face_uv_to_xyz``)."""
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    specs = (
        (one, u, v),      # face 0: ( 1,  u,  v)
        (-u, one, v),     # face 1: (-u,  1,  v)
        (-u, -v, one),    # face 2: (-u, -v,  1)
        (-one, -v, -u),   # face 3: (-1, -v, -u)
        (v, -one, -u),    # face 4: ( v, -1, -u)
        (v, u, -one),     # face 5: ( v,  u, -1)
    )
    for fc, (xs, ys, zs) in enumerate(specs):
        m = face == fc
        if m.any():
            x[m] = xs[m]
            y[m] = ys[m]
            z[m] = zs[m]
    return x, y, z


# ---------------------------------------------------------------------------
# Hilbert interleave: (face, i, j) <-> cell id
# ---------------------------------------------------------------------------

def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf cell id from face + 30-bit (i, j) (``CellId.from_face_ij``).

    Vectorized: 8 table-lookup rounds of 4 bits each.
    """
    fu = np.asarray(face).astype(np.uint64)
    iu = np.asarray(i).astype(np.uint64)
    ju = np.asarray(j).astype(np.uint64)
    n = fu << _U(POS_BITS - 1)  # face << 60
    bits = fu & _U(SWAP_MASK)
    for k in range(7, -1, -1):
        sh = _U(k * LOOKUP_BITS)
        bits += ((iu >> sh) & _U(15)) << _U(LOOKUP_BITS + 2)
        bits += ((ju >> sh) & _U(15)) << _U(2)
        bits = LOOKUP_POS[bits]
        n |= (bits >> _U(2)) << _U(k * 2 * LOOKUP_BITS)
        bits &= _U(SWAP_MASK | INVERT_MASK)
    return n * _U(2) + _U(1)


def to_face_ij(cell_id: np.ndarray):
    """cell id -> (face, i, j, orientation) (``CellId.to_face_ij_orientation``).

    i, j are the leaf coordinates of the cell's min corner (range_min leaf).
    """
    cid = np.asarray(cell_id).astype(np.uint64)
    face = (cid >> _U(POS_BITS)).astype(np.int64)
    bits = face.astype(np.uint64) & _U(SWAP_MASK)
    i = np.zeros(cid.shape, dtype=np.uint64)
    j = np.zeros(cid.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        bits += ((cid >> _U(k * 2 * LOOKUP_BITS + 1))
                 & _U((1 << (2 * nbits)) - 1)) << _U(2)
        bits = LOOKUP_IJ[bits]
        i += (bits >> _U(LOOKUP_BITS + 2)) << _U(k * LOOKUP_BITS)
        j += ((bits >> _U(2)) & _U(15)) << _U(k * LOOKUP_BITS)
        bits &= _U(SWAP_MASK | INVERT_MASK)
    # orientation fix-up: cells at odd levels had their Hilbert curve
    # position rotated (the lsb test below is the public C++/reference trick)
    lsb = cid & (~cid + _U(1))
    swap = (lsb & _U(0x1111111111111110)) != 0
    orientation = np.where(swap, bits ^ _U(SWAP_MASK), bits).astype(np.int64)
    return face, i.astype(np.int64), j.astype(np.int64), orientation


# ---------------------------------------------------------------------------
# top-level encode / decode
# ---------------------------------------------------------------------------

def xyz_to_cell_id(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """unit xyz -> leaf cell id (``CellId.from_point``)."""
    face, u, v = xyz_to_face_uv(x, y, z)
    return from_face_ij(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))


def lat_lng_to_cell_id(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    """degrees -> leaf (level-30) cell id, uint64 (``CellId.from_lat_lng``)."""
    x, y, z = lat_lng_to_xyz(lat_deg, lng_deg)
    return xyz_to_cell_id(x, y, z)


def cell_id_to_xyz(cell_id: np.ndarray):
    """cell id -> unnormalized center xyz (``CellId.to_point_raw``)."""
    face, i, j, _ = to_face_ij(cell_id)
    cid = np.asarray(cell_id).astype(np.uint64)
    is_leaf = (cid & _U(1)).astype(bool)
    low = (cid >> _U(2)).astype(np.int64)
    # center si/ti: the half-leaf-offset delta trick of get_center_si_ti
    delta = np.where(is_leaf, 1, np.where(((i ^ low) & 1) != 0, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    u = st_to_uv((0.5 / MAX_SIZE) * si)
    v = st_to_uv((0.5 / MAX_SIZE) * ti)
    return face_uv_to_xyz(face, u, v)


def cell_id_to_lat_lng(cell_id: np.ndarray):
    """cell id -> center (lat_deg, lng_deg) (``CellId.to_lat_lng``)."""
    x, y, z = cell_id_to_xyz(cell_id)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng
