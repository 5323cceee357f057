"""User-facing reference-parity value types (VERDICT r4 missing #4).

The engine's columnar paths use raw radian floats and int64 cell ids
throughout — right for Spark. This module is the thin OO sugar a user
of the reference library expects when working driver-side: ``Angle``,
``LatLng`` (with ``normalized()``), and a ``CellId`` wrapper over the
scalar ``geometry.cid_*`` helpers (reference ``sphere.py :: class
Angle / class LatLng / class CellId``). Everything here is per-REGION
/ per-literal driver code; per-row work stays in ``s2spark.kernels``
and ``s2spark.columns``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

from s2spark import geometry as G
# one-stop reference-shaped import surface: the region/coverer types
# live in their own modules; re-export them so `from s2spark.api
# import Cap, RegionCoverer, ...` mirrors `from s2sphere import ...`
from s2spark.coverer import RegionCoverer  # noqa: F401
from s2spark.geometry import (  # noqa: F401
    Cap, Cell, CellUnion, LatLngRect, R1Interval, S1Interval)

__all__ = ["Angle", "LatLng", "CellId", "Cap", "Cell", "CellUnion",
           "LatLngRect", "R1Interval", "S1Interval", "RegionCoverer"]


@dataclass(frozen=True, order=True)
class Angle:
    """an angle stored in radians (reference ``sphere.py :: Angle``:
    ``from_degrees/from_radians``, ``.degrees/.radians``, ordering
    and addition)."""
    radians: float = 0.0

    @classmethod
    def from_degrees(cls, degrees: float) -> "Angle":
        return cls(math.radians(degrees))

    @classmethod
    def from_radians(cls, radians: float) -> "Angle":
        return cls(float(radians))

    @property
    def degrees(self) -> float:
        return math.degrees(self.radians)

    def __add__(self, other: "Angle") -> "Angle":
        return Angle(self.radians + other.radians)

    def __sub__(self, other: "Angle") -> "Angle":
        return Angle(self.radians - other.radians)

    def __abs__(self) -> "Angle":
        return Angle(abs(self.radians))


@dataclass(frozen=True)
class LatLng:
    """a (lat, lng) pair of :class:`Angle`s (reference ``sphere.py ::
    LatLng``). ``normalized()`` clamps lat to ±90° and wraps lng to
    ±180° (IEEE remainder semantics, matching the reference)."""
    lat: Angle
    lng: Angle

    @classmethod
    def from_degrees(cls, lat: float, lng: float) -> "LatLng":
        return cls(Angle.from_degrees(lat), Angle.from_degrees(lng))

    @classmethod
    def from_radians(cls, lat: float, lng: float) -> "LatLng":
        return cls(Angle.from_radians(lat), Angle.from_radians(lng))

    @classmethod
    def from_point(cls, p) -> "LatLng":
        lat, lng = G.point_to_latlng(p)
        return cls.from_degrees(lat, lng)

    def is_valid(self) -> bool:
        return (abs(self.lat.radians) <= math.pi / 2
                and abs(self.lng.radians) <= math.pi)

    def normalized(self) -> "LatLng":
        lat = max(-math.pi / 2, min(math.pi / 2, self.lat.radians))
        lng = math.remainder(self.lng.radians, 2 * math.pi)
        return LatLng(Angle(lat), Angle(lng))

    def to_point(self):
        return G.latlng_to_point(self.lat.degrees, self.lng.degrees)

    def get_distance(self, other: "LatLng") -> Angle:
        """great-circle angle to ``other`` (haversine — numerically
        stable at antipodes and small separations alike)."""
        dlat = math.sin(0.5 * (other.lat.radians - self.lat.radians))
        dlng = math.sin(0.5 * (other.lng.radians - self.lng.radians))
        x = dlat * dlat + dlng * dlng * math.cos(
            self.lat.radians) * math.cos(other.lat.radians)
        return Angle(2 * math.asin(math.sqrt(min(1.0, x))))

    def approx_equals(self, other: "LatLng",
                      max_error: float = 1e-15) -> bool:
        return (abs(self.lat.radians - other.lat.radians) < max_error
                and abs(self.lng.radians - other.lng.radians) < max_error)


@dataclass(frozen=True, order=True)
class CellId:
    """OO wrapper over the scalar ``geometry.cid_*`` helpers
    (reference ``sphere.py :: CellId``). ``id`` is the uint64 bit
    pattern as a non-negative python int, so ordering is naturally
    unsigned (faces 4–5 sort after 0–3, unlike the engine's int64
    sortable space — see ``s2spark.columns.sortable``)."""
    id: int = 0

    @classmethod
    def from_lat_lng(cls, ll: LatLng) -> "CellId":
        return cls(G.cid_from_lat_lng(ll.lat.degrees, ll.lng.degrees))

    @classmethod
    def from_point(cls, p) -> "CellId":
        return cls(G.cid_from_point(p))

    @classmethod
    def from_token(cls, token: str) -> "CellId":
        return cls(int((token + "0" * 16)[:16], 16))

    @classmethod
    def from_face_pos_level(cls, face: int, pos: int,
                            level: int) -> "CellId":
        return cls(G.cid_parent((face << 61) + (pos | 1), level))

    def to_token(self) -> str:
        return format(self.id, "016x").rstrip("0") or "X"

    def is_valid(self) -> bool:
        return (self.id >> 61) < 6 and bool(
            G.cid_lsb(self.id) & 0x1555555555555555)

    def level(self) -> int:
        return G.cid_level(self.id)

    def is_leaf(self) -> bool:
        return bool(self.id & 1)

    def is_face(self) -> bool:
        return G.cid_is_face(self.id)

    def face(self) -> int:
        return self.id >> 61

    def pos(self) -> int:
        return self.id & ((1 << 61) - 1)

    def parent(self, level: int | None = None) -> "CellId":
        lvl = self.level() - 1 if level is None else level
        return CellId(G.cid_parent(self.id, lvl))

    def children(self) -> list["CellId"]:
        return [CellId(c) for c in G.cid_children(self.id)]

    def child_begin(self, level: int | None = None) -> "CellId":
        lvl = self.level() + 1 if level is None else level
        return CellId(G.cid_child_begin(self.id, lvl))

    def child_end(self, level: int | None = None) -> "CellId":
        lvl = self.level() + 1 if level is None else level
        return CellId(G.cid_child_end(self.id, lvl))

    def range_min(self) -> "CellId":
        return CellId(G.cid_range_min(self.id))

    def range_max(self) -> "CellId":
        return CellId(G.cid_range_max(self.id))

    def contains(self, other: "CellId") -> bool:
        return G.cid_contains(self.id, other.id)

    def intersects(self, other: "CellId") -> bool:
        return (G.cid_range_min(self.id) <= G.cid_range_max(other.id)
                and G.cid_range_max(self.id)
                >= G.cid_range_min(other.id))

    def next(self) -> "CellId":
        return CellId((self.id + (G.cid_lsb(self.id) << 1))
                      & ((1 << 64) - 1))

    def prev(self) -> "CellId":
        return CellId((self.id - (G.cid_lsb(self.id) << 1))
                      & ((1 << 64) - 1))

    def get_all_neighbors(self, level: int | None = None
                          ) -> list["CellId"]:
        lvl = self.level() if level is None else level
        return [CellId(c) for c in G.cid_all_neighbors(self.id, lvl)]

    def get_vertex_neighbors(self, level: int) -> list["CellId"]:
        return [CellId(c) for c in G.cid_vertex_neighbors(self.id,
                                                          level)]

    def to_lat_lng(self) -> LatLng:
        import numpy as np

        from s2spark.kernels import hilbert
        lat, lng = hilbert.cell_id_to_lat_lng(
            np.array([self.id], dtype=np.uint64))
        return LatLng.from_degrees(float(lat[0]), float(lng[0]))
