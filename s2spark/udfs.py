"""Arrow-batched pandas UDFs wrapping the numpy kernels.

The only JVM→Python crossings in the engine (SURVEY.md §3.1): encode,
decode, neighbor expansion, and exact-verify predicates. Each is a
scalar pandas UDF — one Arrow batch in, one numpy kernel call, one
Arrow batch out; no per-row Python anywhere (BASELINE.json north_star).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from s2spark.kernels import cellops, hilbert


def _u64_to_i64(a: np.ndarray) -> np.ndarray:
    return a.view(np.int64) if a.dtype == np.uint64 else a.astype(np.int64)


@F.pandas_udf(LongType())
def s2_cell_id(lat: pd.Series, lng: pd.Series) -> pd.Series:
    """leaf (level-30) cell id from degrees (``CellId.from_lat_lng``)."""
    ids = hilbert.lat_lng_to_cell_id(lat.to_numpy(np.float64),
                                     lng.to_numpy(np.float64))
    return pd.Series(_u64_to_i64(ids))


@F.pandas_udf(StructType([StructField("lat", DoubleType()),
                          StructField("lng", DoubleType())]))
def s2_to_lat_lng(cell_id: pd.Series) -> pd.DataFrame:
    """cell center in degrees (``CellId.to_lat_lng``)."""
    lat, lng = hilbert.cell_id_to_lat_lng(
        cell_id.to_numpy(np.int64).view(np.uint64))
    return pd.DataFrame({"lat": lat, "lng": lng})


def s2_neighbors_udf(lvl: int):
    """UDF factory: array of the 8 Moore neighbors at level ``lvl``
    (``CellId.get_all_neighbors``). Input ids must be at ``lvl``."""

    @F.pandas_udf(ArrayType(LongType()))
    def _nbrs(cell_id: pd.Series) -> pd.Series:
        ids = cell_id.to_numpy(np.int64).view(np.uint64)
        nb = cellops.get_all_neighbors(ids, lvl)  # (N, 8) uint64
        nb_i64 = nb.view(np.int64)
        return pd.Series(list(nb_i64))

    return _nbrs


def s2_disk_expand_udf(lvl: int, steps: int):
    """UDF factory: expand each row's ARRAY of level-``lvl`` cell ids by
    ``steps`` Moore rings in one batch (the kNN exponential-growth step
    — VERDICT r3 item 1: one shuffle per round instead of one per
    ring). Rows are flattened into (row, cell) parallel arrays, the
    whole batch expands through ``cellops.disk_expand_owned`` (one
    vectorized neighbors + dedupe pass per ring), and the result splits
    back per row — no per-row Python in the expansion itself."""

    @F.pandas_udf(ArrayType(LongType()))
    def _disk(tiles: pd.Series) -> pd.Series:
        lens = np.fromiter((len(t) for t in tiles), dtype=np.int64,
                           count=len(tiles))
        if lens.sum() == 0:
            return pd.Series([[] for _ in range(len(tiles))])
        owner = np.repeat(np.arange(len(tiles), dtype=np.int64), lens)
        cells = np.concatenate([np.asarray(t, dtype=np.int64)
                                for t in tiles]).view(np.uint64)
        owner, cells = cellops.disk_expand_owned(owner, cells, lvl, steps)
        # owner comes back sorted (np.unique) -> split at boundaries
        bounds = np.searchsorted(owner, np.arange(1, len(tiles)))
        return pd.Series([c.tolist()
                          for c in np.split(cells.view(np.int64), bounds)])

    return _disk


def s2_disk_expand_var_udf(lvl: int):
    """UDF factory: like :func:`s2_disk_expand_udf` but with a PER-ROW
    ring count column (the bounded kNN straggler fallback — VERDICT r4
    item 3: each straggler expands to the disk covering its own proven
    max feasible radius, not to every occupied tile). Rows are grouped
    by their step value so each distinct count pays one vectorized
    ``disk_expand_owned`` pass; straggler sets are small and their
    distinct ring counts few."""

    @F.pandas_udf(ArrayType(LongType()))
    def _disk(tiles: pd.Series, steps: pd.Series) -> pd.Series:
        res: list = [None] * len(tiles)
        st = steps.to_numpy(np.int64)
        for s in np.unique(st):
            idx = np.nonzero(st == s)[0]
            sub = tiles.iloc[idx]
            lens = np.fromiter((len(t) for t in sub), dtype=np.int64,
                               count=len(idx))
            if lens.sum() == 0:
                for i in idx:
                    res[i] = []
                continue
            owner = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
            cells = np.concatenate([np.asarray(t, dtype=np.int64)
                                    for t in sub]).view(np.uint64)
            owner, cells = cellops.disk_expand_owned(owner, cells, lvl,
                                                     int(s))
            bounds = np.searchsorted(owner, np.arange(1, len(idx)))
            for i, chunk in zip(idx,
                                np.split(cells.view(np.int64), bounds)):
                res[i] = chunk.tolist()
        return pd.Series(res)

    return _disk


def s2_vertex_neighbors_udf(lvl: int):
    """UDF factory: array of the 3-4 vertex neighbors at the coarser
    level ``lvl`` (``CellId.get_vertex_neighbors``) — reference order
    [parent, i-offset, j-offset(, diagonal)]."""

    @F.pandas_udf(ArrayType(LongType()))
    def _vn(cell_id: pd.Series) -> pd.Series:
        ids = cell_id.to_numpy(np.int64).view(np.uint64)
        nb, has4 = cellops.get_vertex_neighbors(ids, lvl)
        nb_i64 = nb.view(np.int64)
        return pd.Series([row[:3 + int(v)].tolist()
                          for row, v in zip(nb_i64, has4)])

    return _vn


def s2_edge_neighbors_udf(lvl: int):
    """UDF factory: array of the 4 edge neighbors at level ``lvl``
    (``CellId.get_edge_neighbors``)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _nbrs(cell_id: pd.Series) -> pd.Series:
        ids = cell_id.to_numpy(np.int64).view(np.uint64)
        nb = cellops.get_edge_neighbors(ids, lvl).view(np.int64)
        return pd.Series(list(nb))

    return _nbrs


@F.pandas_udf(DoubleType())
def s2_chord_dist2(lat1: pd.Series, lng1: pd.Series,
                   lat2: pd.Series, lng2: pd.Series) -> pd.Series:
    """squared chord distance |p1 - p2|² between two lat/lng points —
    monotone in angle, exact-arithmetic-friendly (kNN ranking metric)."""
    x1, y1, z1 = hilbert.lat_lng_to_xyz(lat1.to_numpy(np.float64),
                                        lng1.to_numpy(np.float64))
    x2, y2, z2 = hilbert.lat_lng_to_xyz(lat2.to_numpy(np.float64),
                                        lng2.to_numpy(np.float64))
    dx, dy, dz = x1 - x2, y1 - y2, z1 - z2
    return pd.Series(dx * dx + dy * dy + dz * dz)
