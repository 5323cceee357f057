"""Spatial join strategies (SURVEY.md §2.5) — the heart of the engine.

The reference expresses containment as scalar predicates
(``CellUnion.contains``, ``Cap/LatLngRect.contains``); here each
becomes a distributed join over covering cells with an exact verify
stage:

- :func:`pip_join_broadcast` — zero-shuffle map-side join: the covering
  intervals (all regions) are compiled into a CSR stabbing index
  (``kernels.regions.IntervalIndex``) captured by a ``mapInPandas``
  closure; each Arrow batch of points does searchsorted + gather +
  vectorized exact verify. The Spark form of the reference's
  sorted-id bisect, amortized over batches.
- :func:`pip_join_salted` — shuffle equi-join for covering sets too
  large to broadcast: both sides keyed by a fixed coarse bucket level
  (cell-id prefix) plus an explicit salt (covering side exploded ×S,
  point side hashed), BETWEEN range filter, then the same exact verify.
  AQE still splits residual skew; the salt handles single hot keys.

Both variants return identical (region_id, point_id) sets; the tests
assert it and the DuckDB oracle checks both against brute-force
exact geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from s2spark import columns as CC
from s2spark import metrics
from s2spark.coverer import RegionCoverer
from s2spark.geometry import (
    Cell,
    CellUnion,
    cid_child_begin,
    cid_child_end,
    cid_level,
    cid_lsb_for_level,
    cid_parent,
    cid_range_max,
    cid_range_min,
)
from s2spark.kernels import hilbert
from s2spark.kernels import regions as RK

SIGN = 1 << 63
BUCKET_LEVEL = 4  # coarse prefix level for the shuffle variant
DEFAULT_SALT = 8


def _sortable(u: int) -> int:
    """uint64 python int -> order-preserving signed int64.

    XOR with the sign bit, reinterpreted signed, is u - 2^63 for all u.
    """
    return u - SIGN


# ---------------------------------------------------------------------------
# covering construction
# ---------------------------------------------------------------------------

def compute_coverings(regions: dict[int, object], max_cells: int = 256,
                      max_level: int = 30) -> list[tuple]:
    """(region_id, cell_id, interior) rows for every covering cell.

    ``interior`` is exact (``region.contains(cell)``): matches on
    interior cells skip the verify stage (the reference's
    interior-covering optimization, SURVEY.md §2.6). A larger
    max_cells budget tightens boundaries — fewer exact verifies per
    matched row — while the exploded covering stays broadcastable.
    """
    coverer = RegionCoverer(max_cells=max_cells, max_level=max_level)
    rows = []
    for rid, region in regions.items():
        for cid in coverer.get_covering(region).ids:
            rows.append((rid, cid, region.contains(Cell(cid))))
    return rows


def build_interval_index(covering_rows: list[tuple]) -> RK.IntervalIndex:
    """covering rows -> CSR stabbing index over sortable leaf ranges."""
    starts = [_sortable(cid_range_min(cid)) for _, cid, _ in covering_rows]
    ends = [_sortable(cid_range_max(cid)) for _, cid, _ in covering_rows]
    rids = [rid for rid, _, _ in covering_rows]
    interior = [i for _, _, i in covering_rows]
    return RK.IntervalIndex(starts, ends, rids, interior)


_COVDF_CACHE: dict = {}


def coverings_df(spark: SparkSession, covering_rows: list[tuple],
                 bucket_level: int = BUCKET_LEVEL) -> DataFrame:
    """covering rows -> DataFrame keyed by coarse bucket for the
    shuffle join: (region_id, cell_id, range_min_s, range_max_s,
    interior, bucket). Cells coarser than the bucket level are exploded
    into their bucket-level descendants.

    Memoized per (session, rows content, level) — r6: the ~24k-row
    bucket explosion plus createDataFrame's row-by-row pickling cost
    ~0.3s per CALL inside every PIP query; the covering is a pure
    function of fixture constants, so repeat calls in one process
    reuse the same local-relation DataFrame (the _COV_CACHE
    precedent — a side-input constant, not a result)."""
    # applicationId, not id(sc): a stopped context's id() can be
    # reused by a later session in the same process, and handing that
    # session a dead DataFrame would crash — appIds are per-app unique
    key = (spark.sparkContext.applicationId, bucket_level,
           hash(tuple(covering_rows)))
    hit = _COVDF_CACHE.get(key)
    if hit is not None:
        return hit
    out = []
    for rid, cid, interior in covering_rows:
        rmin_s = _sortable(cid_range_min(cid))
        rmax_s = _sortable(cid_range_max(cid))
        cid_s = (cid ^ SIGN) - SIGN if cid & SIGN else cid
        if cid_level(cid) >= bucket_level:
            buckets = [cid_parent(cid, bucket_level)]
        else:
            step = 2 * cid_lsb_for_level(bucket_level)
            b = cid_child_begin(cid, bucket_level)
            end = cid_child_end(cid, bucket_level)
            buckets = []
            while b != end:
                buckets.append(b)
                b += step
        for b in buckets:
            b_s = (b ^ SIGN) - SIGN if b & SIGN else b
            out.append((rid, cid_s, rmin_s, rmax_s, bool(interior), b_s))
    schema = ("region_id long, cell_id long, range_min_s long, "
              "range_max_s long, interior boolean, bucket long")
    df = spark.createDataFrame(out, schema)
    _COVDF_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# exact verify (shared by all variants)
# ---------------------------------------------------------------------------

def verify_matches(lat: np.ndarray, lng: np.ndarray,
                   region_ids: np.ndarray,
                   params_by_region: dict[int, tuple[str, list[float]]]
                   ) -> np.ndarray:
    """vectorized exact containment for candidate (point, region) rows,
    grouped by region (<= a few dozen kernel calls per batch)."""
    ok = np.zeros(len(lat), dtype=bool)
    for rid in np.unique(region_ids):
        m = region_ids == rid
        kind, params = params_by_region[int(rid)]
        if kind == "cap":
            ok[m] = RK.cap_contains(lat[m], lng[m], *params)
        elif kind == "rect":
            ok[m] = RK.rect_contains(lat[m], lng[m], *params)
        elif kind == "star":
            ok[m] = RK.starpoly_contains(lat[m], lng[m], params)
        elif kind == "spoly":
            ok[m] = RK.simplepoly_contains(lat[m], lng[m], params)
        else:
            normals = [tuple(params[i:i + 3])
                       for i in range(0, len(params), 3)]
            ok[m] = RK.poly_contains(lat[m], lng[m], normals)
    return ok


def make_verify_udf(params_by_region: dict[int, tuple[str, list[float]]],
                    with_interior: bool = False):
    """pandas UDF (region_id, lat, lng[, interior]) -> contained.

    Exact verify for the join variants; params ride in the closure.
    With ``with_interior``, rows flagged as interior-cell hits are
    accepted without exact-geometry work (kernel-level mask)."""

    if not with_interior:
        @F.pandas_udf(BooleanType())
        def _verify(region_id: pd.Series, lat: pd.Series,
                    lng: pd.Series) -> pd.Series:
            return pd.Series(verify_matches(lat.to_numpy(np.float64),
                                            lng.to_numpy(np.float64),
                                            region_id.to_numpy(np.int64),
                                            params_by_region))
        return _verify

    @F.pandas_udf(BooleanType())
    def _verify_i(region_id: pd.Series, lat: pd.Series, lng: pd.Series,
                  interior: pd.Series) -> pd.Series:
        ok = interior.to_numpy(bool).copy()
        b = ~ok
        if b.any():
            ok[b] = verify_matches(lat.to_numpy(np.float64)[b],
                                   lng.to_numpy(np.float64)[b],
                                   region_id.to_numpy(np.int64)[b],
                                   params_by_region)
        return pd.Series(ok)

    return _verify_i


# ---------------------------------------------------------------------------
# variant (a): broadcast interval-stab join (zero shuffle)
# ---------------------------------------------------------------------------

def pip_join_broadcast(points: DataFrame,
                       covering_rows: list[tuple],
                       params_by_region: dict[int, tuple[str, list[float]]],
                       extra_cols: tuple[str, ...] = (),
                       emit_cell_id: bool = False) -> DataFrame:
    """point-in-region join, map-side: encode + stab + verify fused in
    one ``mapInPandas`` pass. Output: (region_id, point_id,
    *extra_cols[, cell_id]).

    ``points`` needs (point_id, lat, lng). Scales linearly in points
    with NO shuffle; covering side bounded by driver/broadcast memory.
    ``emit_cell_id`` passes the leaf id computed in-kernel through, so
    downstream tiling needs no second encode pass.
    """
    index = build_interval_index(covering_rows)
    fields = ([StructField("region_id", LongType()),
               StructField("point_id", LongType())]
              + [points.schema[c] for c in extra_cols])
    if emit_cell_id:
        fields.append(StructField("cell_id", LongType()))
    out_schema = StructType(fields)

    def _map(batches):
        for pdf in batches:
            lat = pdf["lat"].to_numpy(np.float64)
            lng = pdf["lng"].to_numpy(np.float64)
            leaf = hilbert.lat_lng_to_cell_id(lat, lng)
            leaf_s = (leaf ^ np.uint64(SIGN)).view(np.int64)
            rows, rids, interior = index.stab(leaf_s)
            if len(rids) == 0:
                continue
            keep = interior.copy()
            boundary = ~interior
            if boundary.any():
                keep[boundary] = verify_matches(
                    lat[rows[boundary]], lng[rows[boundary]],
                    rids[boundary], params_by_region)
            rows, rids = rows[keep], rids[keep]
            out = {"region_id": rids,
                   "point_id": pdf["point_id"].to_numpy(np.int64)[rows]}
            for c in extra_cols:
                out[c] = pdf[c].to_numpy()[rows]
            if emit_cell_id:
                out["cell_id"] = leaf.view(np.int64)[rows]
            yield pd.DataFrame(out)

    return points.mapInPandas(_map, out_schema)


# ---------------------------------------------------------------------------
# variant (b): salted shuffle equi-join on bucket prefix
# ---------------------------------------------------------------------------

def with_cell_id(points: DataFrame) -> DataFrame:
    """encode once; downstream stays JVM-side bit math."""
    from s2spark.udfs import s2_cell_id
    return points.withColumn("cell_id", s2_cell_id("lat", "lng"))


def pip_join_salted(points: DataFrame, cov_df: DataFrame,
                    params_by_region: dict[int, tuple[str, list[float]]],
                    num_salts: int = DEFAULT_SALT,
                    bucket_level: int = BUCKET_LEVEL,
                    broadcast_covering: bool = False) -> DataFrame:
    """point-in-region join as a salted hash equi-join.

    points side: bucket = parent(cell_id, bucket_level) (pure codegen),
    salt = hash(point_id) % S. covering side: exploded ×S so every
    (bucket, salt) partition holds the full covering slice — a hot
    bucket (city) spreads over S reducers. BETWEEN on sortable leaf
    ranges prunes to true covering cells, exact verify confirms.
    """
    pts = points if "cell_id" in points.columns else with_cell_id(points)
    pts = pts.withColumn("bucket", CC.parent("cell_id", bucket_level)) \
             .withColumn("leaf_s", CC.sortable("cell_id")) \
             .withColumn("salt",
                         F.pmod(F.hash("point_id"), F.lit(num_salts)))
    cov = cov_df.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(num_salts)])))
    if broadcast_covering:
        cov = F.broadcast(cov)
    joined = pts.join(
        cov,
        (pts["bucket"] == cov["bucket"]) & (pts["salt"] == cov["salt"])
        & pts["leaf_s"].between(cov["range_min_s"], cov["range_max_s"]),
        "inner")
    verify = make_verify_udf(params_by_region)
    accepted = joined.where(
        F.col("interior") | verify("region_id", "lat", "lng"))
    return accepted.select("region_id", "point_id")


def pip_join_bucketed(points: DataFrame, cov_df: DataFrame,
                      params_by_region: dict[int, tuple[str, list[float]]],
                      bucket_level: int = 6,
                      broadcast_covering: bool = True,
                      extra_cols: tuple[str, ...] = (),
                      emit_cell_id: bool = False) -> DataFrame:
    """point-in-region as a Catalyst-native broadcast hash equi-join.

    The fastest variant on the 100 TB side: one scalar-UDF encode pass
    (narrow columns through Arrow), then everything JVM-side — bucket
    prefix via codegen bit math, broadcast hash join against the
    bucket-exploded covering table, BETWEEN range filter — and the
    exact-verify scalar UDF only on non-interior candidates. Points in
    no covering bucket fall out of the hash probe immediately, so the
    verify UDF sees only true candidates.

    ``cov_df`` must be built with the same ``bucket_level``
    (:func:`coverings_df`).
    """
    pts = points if "cell_id" in points.columns else with_cell_id(points)
    pts = pts.withColumn("_bucket", CC.parent("cell_id", bucket_level)) \
             .withColumn("_leaf_s", CC.sortable("cell_id"))
    cov = F.broadcast(cov_df) if broadcast_covering else cov_df
    joined = pts.join(
        cov, (pts["_bucket"] == cov["bucket"])
        & pts["_leaf_s"].between(cov["range_min_s"], cov["range_max_s"]),
        "inner")
    # single filter pass; the kernel skips exact-geometry work for
    # interior-cell hits (the reference's interior-covering
    # optimization) — branching in the plan would re-evaluate the
    # whole join+encode subtree per branch
    verify = make_verify_udf(params_by_region, with_interior=True)
    accepted = joined.where(
        verify("region_id", "lat", "lng", "interior"))
    cols = [F.col("region_id"), pts["point_id"]]
    cols += [pts[c] for c in extra_cols]
    if emit_cell_id:
        cols.append(pts["cell_id"])
    return accepted.select(*cols)


def pip_semi(points: DataFrame, covering_rows, params_by_region,
             negate: bool = False) -> DataFrame:
    """LEFT SEMI / ANTI forms: points in (not in) ANY region."""
    matches = pip_join_broadcast(points, covering_rows, params_by_region) \
        .select("point_id").distinct()
    how = "left_anti" if negate else "left_semi"
    return points.join(matches, "point_id", how)


def cell_containment_join(cells: DataFrame, container: DataFrame,
                          container_levels: list[int] | None = None,
                          how: str = "left_semi") -> DataFrame:
    """rows of ``cells`` whose cell_id is contained in ANY cell of
    ``container`` — the distributed ``CellUnion.contains`` /
    covering∩covering primitive (SURVEY §2.5 cell-interval joins,
    §2.7 intersection).

    S2 cells are nested-or-disjoint, so containment is pure equality
    after snapping: cell a ⊆ cell b  ⇔  parent(a, level(b)) == b.
    The join is a UNION of plain hash equi-joins, one per distinct
    container level (bounded by 31) — no range join, no nested loop,
    scales like any equi-join and broadcasts when small.

    Multiplicity: with a NORMALIZED container set (disjoint cells, the
    CellUnion invariant) each contained cell matches exactly one level.
    For arbitrary containers holding nested cells at several levels, a
    cell could match more than one union arm, so the left_semi form
    dedupes across arms (``distinct``) to keep "contained in ANY"
    set semantics; callers needing input multiplicity must pass
    normalized containers. ``container_levels=None`` triggers a small
    driver collect of the distinct levels (bounded ≤ 31) — pass it
    explicitly on the hot path.
    """
    if container_levels is None:
        container_levels = [r["lvl"] for r in container.select(
            CC.level("cell_id").alias("lvl")).distinct().collect()]
    out = None
    for lvl in sorted(container_levels):
        side = container.where(CC.level("cell_id") == lvl) \
            .select(F.col("cell_id").alias("_container"))
        snapped = cells.where(CC.level("cell_id") >= lvl).join(
            F.broadcast(side),
            CC.parent(cells["cell_id"], lvl) == F.col("_container"),
            how)
        out = snapped if out is None else out.unionAll(snapped)
    if out is None:
        return cells.limit(0)
    if how == "left_semi" and len(container_levels) > 1:
        out = out.distinct()
    return out


# ---------------------------------------------------------------------------
# kNN via progressive neighbor rings (SURVEY.md §2.5 row kNN)
# ---------------------------------------------------------------------------

FB_RING_CAP = 32   # max rings a bounded kNN-fallback straggler may
#                    expand to ((2·32+1)² ≈ 4.2k tiles per query);
#                    wider proven bounds take the all-tiles path

LAST_KNN_FALLBACK: dict | None = None   # which fallback arms the most
#                    recent knn_join_df run took (None: no fallback) —
#                    test observability, set from already-computed
#                    isEmpty probes at no extra cost


def knn_auto_level(n_points: int, k_max: int) -> int:
    """ring level from global density: aim for ~k_max/2 points per
    cell. Exactness never depends on the level — only work does: the
    round-1 over-fetch is |disk| ≈ 9·ppt candidates per query, so a
    FINER grid (fewer points per tile, occasionally one more ring
    round) beats a coarse one — measured at 600k pts / 9.8k queries /
    k=3: level 6 (ppt≈35) 19.6 s, level 7 12.0 s, level 8 (ppt≈2.4,
    3 rounds) 9.2 s. The r1 4·k_max calibration optimized round
    count; candidate volume is what actually costs."""
    density = max(n_points, 1) / (4.0 * np.pi)  # points per steradian
    target_area = max(k_max, 1) / 2.0 / density
    return max(2, min(18, metrics.AVG_AREA.get_max_level(target_area)))


def knn_join(spark: SparkSession, points: DataFrame,
             queries: list[tuple[int, float, float, int]],
             level: int | None = 6, max_rings: int = 64) -> DataFrame:
    """exact k nearest points per query — small-list convenience API.

    Thin shim over :func:`knn_join_df` (VERDICT r2 item 5: one ring
    implementation, no per-ring driver ``collect()``): the query list
    becomes a 4-column DataFrame (query_id, lat, lng, k) and the
    DataFrame path does the certified ring growth, honoring the
    per-query ``k`` column. Output: (query_id, point_id, rnk) with
    (dist2, point_id) ties — identical contract and oracle as before.
    """
    if level is None:
        level = knn_auto_level(points.count(),
                               max(k for _, _, _, k in queries))
    q = spark.createDataFrame(
        [(int(qid), float(la), float(ln), int(k))
         for qid, la, ln, k in queries],
        "query_id long, lat double, lng double, k int")
    # small query set -> driver-ROUND latency dominates, so open with
    # 3 rings and certify in one round. (The DataFrame path's default
    # stays init_rings=1, but since the r4 exponential-growth +
    # certified-emission restructure a 3-ring opening also wins for
    # large query sets — r5 measured 8.25s -> 7.32s at 6k queries x
    # 600k points; the old ~5x-wall warning predates the restructure)
    return knn_join_df(points, q, level=level, max_rounds=max_rings,
                       init_rings=3)


def knn_join_df(points: DataFrame, queries: DataFrame,
                level: int | None = 6, k: int = 10,
                max_rounds: int = 16, init_rings: int = 1) -> DataFrame:
    """exact kNN with the QUERY SET AS A DATAFRAME — the scale path
    for large query tables (VERDICT r1 item 5): no per-query driver
    state, no per-ring ``collect()`` of stats. Ring state lives in
    DataFrames; each round does one neighbors-UDF + explode expansion,
    one candidate stats pass, and one satisfied-query anti-join. The
    driver only checks "any queries left?" per round (a scalar).

    ``queries``: (query_id, lat, lng[, k]) — an optional per-query
    integer ``k`` column overrides the global ``k`` argument (the
    small-list :func:`knn_join` shim uses this). Output (query_id,
    point_id, rnk) — ties by (dist2, point_id). Exactness: a query is
    certified once it has >= k candidates with k-th chord² <= the safe
    chord² of its ring radius (everything outside is provably
    farther); rounds exhaust → remaining queries fall back to all
    occupied tiles (brute force).
    """
    from s2spark.udfs import s2_disk_expand_udf
    import os as _os, time as _time
    _dbg = _os.environ.get("S2_KNN_DEBUG")
    _te = _time.time()
    global LAST_KNN_FALLBACK
    LAST_KNN_FALLBACK = None

    spark = points.sparkSession
    if level is None:
        # density calibration (perf-only — output is exact at ANY
        # level): aim for ~4k points per tile so ring 1 usually
        # certifies; one count() of the point table
        level = knn_auto_level(points.count(), int(k))
    pts = points if "cell_id" in points.columns else with_cell_id(points)
    pts = pts.withColumn("tile", CC.parent("cell_id", level)) \
        .select("point_id", "lat", "lng", "tile").persist()
    min_width = metrics.MIN_WIDTH.get_value(level)

    def safe_chord2(r: int) -> float:
        theta = r * min_width
        if theta >= np.pi:
            return 4.0
        s = 2.0 * np.sin(0.5 * theta)
        return s * s

    from s2spark.udfs import s2_cell_id
    k_col = (F.col("k").cast("int") if "k" in queries.columns
             else F.lit(int(k)))
    # encode the query coordinates in the SAME projection (r6): the
    # old enc-then-join-back shape recomputed the query derivation
    # twice and paid a 9.8k-row shuffle join for nothing
    q = queries.select("query_id",
                       F.col("lat").alias("qlat"),
                       F.col("lng").alias("qlng"),
                       k_col.alias("kq"),
                       CC.parent(s2_cell_id(F.col("lat"), F.col("lng")),
                                 level).alias("tile")).persist()

    # no checkpoint pre-loop: lineage is one persisted join deep, and
    # each localCheckpoint call costs real driver-side planning time
    seen = q.select("query_id", "tile")
    frontier = seen
    active = q.select("query_id")

    @F.pandas_udf("double")
    def _chord2(qlat: pd.Series, qlng: pd.Series,
                lat: pd.Series, lng: pd.Series) -> pd.Series:
        return pd.Series(RK.chord_dist2(qlat.to_numpy(np.float64),
                                        qlng.to_numpy(np.float64),
                                        lat.to_numpy(np.float64),
                                        lng.to_numpy(np.float64)))

    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy("dist2", "point_id")

    def _ranked(cand_tiles: DataFrame, hint: bool = True) -> DataFrame:
        """every (query, candidate point) with chord² + per-query rank
        — one pass per round serves BOTH the certification stats and
        the emitted top-k of the queries that certify that round, so
        candidate distances are never recomputed.

        The (query, tile) set is explicitly BROADCAST: it is bounded
        by |queries| x disk area (tens of rows per query), but it
        arrives as a checkpoint-backed plan with unknown stats, so
        without the hint Catalyst sort-merge-joins and re-shuffles the
        ENTIRE point table every round (``hint=False`` only for the
        rare brute-force fallback, whose tile set is all of them). The
        projection is slimmed to (query_id, point_id, kq, dist2)
        BEFORE the window so the rank shuffle and the round's cache
        hold 4 narrow columns, not the full coordinate set."""
        ct = F.broadcast(cand_tiles) if hint else cand_tiles
        return pts.join(ct, "tile") \
            .join(F.broadcast(q.select("query_id", "qlat", "qlng",
                                       "kq")), "query_id") \
            .withColumn("dist2", _chord2("qlat", "qlng", "lat", "lng")) \
            .select("query_id", "point_id", "kq", "dist2") \
            .withColumn("rnk", F.row_number().over(w))

    def _topk(ranked: DataFrame, only: DataFrame | None = None
              ) -> DataFrame:
        s = ranked if only is None else \
            ranked.join(F.broadcast(only), "query_id", "left_semi")
        return s.where(F.col("rnk") <= F.col("kq")) \
            .select("query_id", "point_id",
                    F.col("rnk").cast("int").alias("rnk"))

    def _ranked_brute(only: DataFrame | None = None) -> DataFrame:
        """brute-force rank of a (small) query slice against EVERY
        point: broadcast the queries, stream the point table once —
        candidate set identical to the old crossJoin(all occupied
        tiles) arm but without its tile `distinct` pass and without
        the un-broadcast sort-merge join that re-shuffled the whole
        point table (r6: 3.5 s → ~1 s on the sf0.1 straggler set)."""
        qq = q if only is None else q.join(F.broadcast(only), "query_id")
        cand = pts.crossJoin(
            F.broadcast(qq.select("query_id", "qlat", "qlng", "kq")))
        return cand \
            .withColumn("dist2", _chord2("qlat", "qlng", "lat", "lng")) \
            .select("query_id", "point_id", "kq", "dist2") \
            .withColumn("rnk", F.row_number().over(w))

    # exponential ring growth: round g expands the frontier by
    # min(2^(g-1), 8) rings IN ONE vectorized pass (per-query tiles
    # collect_list -> one multi-ring disk-expand UDF -> one explode; a
    # single shuffle per round regardless of step — VERDICT r3 item 1,
    # replacing the per-ring explode+distinct chain). A sparse-area
    # query needing radius R is certified in O(log R) driver rounds
    # instead of R. Exactness is untouched: `seen` stays exactly
    # disk(center, r_cum) (expanding the outer annulus by s rings
    # covers the full next annulus — every tile at Chebyshev distance
    # r_cum + k, k <= s, is within k of an annulus tile), and the
    # certification bound uses the cumulative radius r_cum. Extra
    # candidates can never change the exact final top-k ranking, only
    # ring tightness. Checkpoints are LAZY (eager=False): lineage still
    # truncates, but the round's single action (`active.isEmpty()`)
    # materializes all three — one Spark job per round, not four.
    if _dbg:
        print(f"[knn] setup sec={_time.time()-_te:.2f}", flush=True)
    r = 0          # cumulative ring radius (certification bound)
    g = 0          # driver round counter
    certified_all = False  # last round's isEmpty said no stragglers
    deferred = False       # last possible round: isEmpty SKIPPED, the
    #                        fallback resolves (possibly zero)
    #                        stragglers lazily in its own single action
    cached = []    # per-round persisted ranked sets (released at end)
    out_parts = [] # top-k slices, EMITTED the round a query certifies:
    #                a certified query's seen disk never grows again,
    #                so its ranking that round is final — later rounds
    #                rank ONLY still-active queries instead of everyone
    ranked = None
    while r < max_rounds:
        _t0 = _time.time()
        g += 1
        # round 1 opens with `init_rings` rings (a dense workload whose
        # per-tile population is calibrated by `knn_auto_level` almost
        # always certifies within 2-3 rings — paying ONE stats pass at
        # r=3 beats two passes at r=1 and r=3); later rounds grow
        # exponentially as before
        step = min(init_rings if g == 1 else 2 ** (g - 1), 8,
                   max_rounds - r)
        r += step
        if g == 1:
            # each query owns exactly ONE tile pre-expansion: skip the
            # collect_list shuffle AND the anti-join/union — the round-1
            # disk (which includes the center) simply BECOMES `seen`
            grown = q.select(
                "query_id",
                F.explode(s2_disk_expand_udf(level, step)
                          (F.array("tile"))).alias("tile"))
            new_tiles = grown
            seen = grown
            act_seen = seen
        else:
            grown = frontier.groupBy("query_id") \
                .agg(F.collect_list("tile").alias("tiles")) \
                .select("query_id",
                        F.explode(s2_disk_expand_udf(level, step)("tiles"))
                        .alias("tile"))
            new_tiles = grown.join(seen, ["query_id", "tile"],
                                   "left_anti") \
                .localCheckpoint(eager=False)
            seen = seen.unionAll(new_tiles).localCheckpoint(eager=False)
            act_seen = seen.join(active, "query_id", "left_semi")
        ranked = _ranked(act_seen).persist()
        cached.append(ranked)
        st = ranked.groupBy("query_id", "kq") \
            .agg(F.count("*").alias("cnt"),
                 F.min(F.when(F.col("rnk") == F.col("kq"),
                              F.col("dist2"))).alias("kth"))
        bound = float(safe_chord2(r))
        satisfied = st.where((F.col("cnt") >= F.col("kq"))
                             & F.col("kth").isNotNull()
                             & (F.col("kth") <= F.lit(bound))) \
            .select("query_id")
        out_parts.append(_topk(ranked, satisfied))
        # the checkpoint stays even on the last possible round:
        # dropping it moves (and grows) the physical-planning cost
        # into the fallback's own plan/broadcast compilation —
        # measured 6.08 vs 5.71 s min (quiet interleaved A/B)
        active = active.join(satisfied, "query_id", "left_anti") \
            .localCheckpoint(eager=False)
        if bound >= 4.0:
            done = True
        elif r >= max_rounds:
            # the loop must exit after this round either way, so the
            # per-round isEmpty action is pure driver latency: skip it
            # (and the post-loop straggler probe) and let the fallback
            # resolve a possibly-EMPTY straggler set lazily — for the
            # max_rounds=1 configuration (knn_many) this folds round-1
            # materialization, the fallback ranking and the flags
            # probe into ONE driver action (4 actions -> 2; A/B'd)
            done = True
            deferred = True
        else:
            done = active.isEmpty()
            certified_all = done
        if _dbg:
            print(f"[knn] round g={g} r={r} step={step} "
                  f"sec={_time.time()-_t0:.2f} done={done} "
                  f"deferred={deferred}", flush=True)
        if done:
            break
        frontier = new_tiles.join(active, "query_id", "left_semi")

    if g == 0 or (not certified_all
                  and (deferred or not active.isEmpty())):
        # stragglers that never certified. bound >= pi: their last
        # ranked set already held every reachable point — emit it.
        if g > 0 and safe_chord2(r) >= 4.0:
            out_parts.append(_topk(ranked, active))
        elif g == 0:
            # max_rounds == 0 degenerate: no ring stats exist — brute
            # force every query against every point.
            fb = _ranked_brute().persist()
            cached.append(fb)
            out_parts.append(_topk(fb))
        else:
            # Straggler resolution in ONE var-ring pass (r6 restructure
            # of the VERDICT r4 bounded fallback + VERDICT r5 item 7):
            #
            # * a straggler with >= kq candidates has a PROVEN upper
            #   bound on its true k-th distance — its current kth
            #   chord² can only improve with more candidates — so its
            #   whole top-k lies inside the covering disk of
            #   ceil(theta_ub/min_width)+1 rings (outside disk(ρ) ⇒
            #   dist > (ρ-1)·min_width; the +1 absorbs that and float
            #   rounding). Emitted UNCONDITIONALLY from that disk.
            # * a straggler with < kq candidates gets one ESCALATION
            #   disk (max(2r, 8) rings, capped) ranked in the same
            #   pass; it emits only if it certifies (per-query bound
            #   column, same chord formula as safe_chord2).
            # * whatever remains — still < kq in the escalated disk,
            #   a proven bound wider than FB_RING_CAP, or an
            #   escalated-but-uncertified query — is brute-force
            #   ranked against every point via a broadcast of those
            #   few query rows (never a shuffle of the point table).
            from s2spark.udfs import s2_disk_expand_var_udf
            _tf = _time.time()
            theta = 2.0 * F.asin(F.least(F.sqrt("kth") / F.lit(2.0),
                                         F.lit(1.0)))
            rings_b = (F.ceil(theta / F.lit(float(min_width)))
                       + F.lit(1)).cast("int")
            esc = int(min(max(2 * r, 8), FB_RING_CAP))
            stg = st.join(F.broadcast(active), "query_id", "left_semi")
            proven = F.col("kth").isNotNull() \
                & (rings_b <= F.lit(FB_RING_CAP))
            plan = stg.select(
                "query_id",
                F.when(proven, F.least(rings_b, F.lit(FB_RING_CAP)))
                .otherwise(F.lit(esc)).alias("rings"),
                proven.alias("proven")) \
                .localCheckpoint(eager=False)
            bq = q.join(F.broadcast(plan), "query_id")
            cand = bq.select(
                "query_id", "proven",
                F.explode(s2_disk_expand_var_udf(level)
                          (F.array("tile"), F.col("rings")))
                .alias("tile"))
            fb = _ranked(cand.drop("proven")).persist()
            cached.append(fb)
            # per-query certification bound for the escalated disks:
            # chord²(rings·min_width), clamped at pi (== 4.0 exactly)
            th_r = F.least(F.col("rings") * F.lit(float(min_width)),
                           F.lit(float(np.pi)))
            bound_c = F.pow(F.lit(2.0) * F.sin(th_r / F.lit(2.0)),
                            F.lit(2.0))
            st_fb = fb.groupBy("query_id", "kq").agg(
                F.count("*").alias("cnt"),
                F.min(F.when(F.col("rnk") == F.col("kq"),
                             F.col("dist2"))).alias("kth")) \
                .join(F.broadcast(plan), "query_id")
            done_fb = st_fb.where(
                F.col("proven")
                | ((F.col("cnt") >= F.col("kq"))
                   & F.col("kth").isNotNull()
                   & (F.col("kth") <= bound_c))).select("query_id")
            out_parts.append(_topk(fb, done_fb))
            rem = active.join(F.broadcast(done_fb), "query_id",
                              "left_anti")
            # BOTH fallback flags in ONE action (r6): the any-proven
            # scalar and the any-remainder scalar ride one unioned
            # agg, so the pass costs a single driver job instead of
            # two isEmpty probes (the job also materializes fb's
            # persist)
            probe = plan.select(
                F.lit(0).alias("k"),
                F.col("proven").cast("int").alias("v")) \
                .unionAll(rem.select(F.lit(1).alias("k"),
                                     F.lit(1).alias("v"))) \
                .groupBy("k").agg(F.max("v").alias("m")).collect()
            fl = {row["k"]: row["m"] for row in probe}
            has_bounded = fl.get(0, 0) == 1
            has_unb = 1 in fl
            LAST_KNN_FALLBACK = {
                "bounded": has_bounded, "unbounded": has_unb}
            if _dbg:
                print(f"[knn] fallback bounded={has_bounded} "
                      f"unbounded={has_unb} "
                      f"sec={_time.time()-_tf:.2f}", flush=True)
            if has_unb:
                fb_u = _ranked_brute(rem).persist()
                cached.append(fb_u)
                out_parts.append(_topk(fb_u))

    # eagerly checkpoint the SMALL result (<= sum of k) so every
    # intermediate cache can be released before returning — no persist
    # outlives the call (ADVICE r3 cache-leak discipline). Each round's
    # emitted slice reads that round's still-persisted ranked set.
    _t0 = _time.time()
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionAll(p)
    out = out.localCheckpoint()
    if _dbg:
        print(f"[knn] final checkpoint sec={_time.time()-_t0:.2f}",
              flush=True)
    for c in cached:
        c.unpersist()
    pts.unpersist()
    q.unpersist()
    return out


def distance_join(points: DataFrame, radius_rad: float,
                  level: int | None = None) -> DataFrame:
    """within-distance SELF-join: all pairs (p1 < p2) of points within
    great-circle angle ``radius_rad`` — the co-location primitive.

    Scale shape (the standard grid join): pick the deepest level whose
    MIN cell width >= radius, so any qualifying pair lies in the same
    tile or a Moore neighbor; side a explodes to its tile + 8
    neighbors ("zones"), side b keeps its tile, and the candidate join
    is a plain hash EQUI-join on zone == tile (each ordered pair
    matched at most once — a's zone set hits b's tile once). Exact
    chord² verify on candidates only. Output (p1, p2, dist2) with
    dist2 in the oracle's op order, rounded once.
    """
    from s2spark.udfs import s2_neighbors_udf

    if level is None:
        level = max(0, min(30, metrics.MIN_WIDTH.get_max_level(radius_rad)))
    thresh = 2.0 * np.sin(0.5 * radius_rad)
    thresh2 = thresh * thresh
    pts = points if "cell_id" in points.columns else with_cell_id(points)
    pts = pts.withColumn("tile", CC.parent("cell_id", level))
    nbrs = s2_neighbors_udf(level)
    a = pts.withColumn(
        "zone", F.explode(F.array_union(nbrs("tile"),
                                        F.array(F.col("tile"))))) \
        .select(F.col("point_id").alias("p1"),
                F.col("lat").alias("lat1"),
                F.col("lng").alias("lng1"), "zone")
    b = pts.select(F.col("point_id").alias("p2"),
                   F.col("lat").alias("lat2"),
                   F.col("lng").alias("lng2"), "tile")
    cand = a.join(b, (a["zone"] == b["tile"]) & (a["p1"] < b["p2"]))

    @F.pandas_udf("double")
    def _chord2(lat1: pd.Series, lng1: pd.Series,
                lat2: pd.Series, lng2: pd.Series) -> pd.Series:
        return pd.Series(RK.chord_dist2(lat1.to_numpy(np.float64),
                                        lng1.to_numpy(np.float64),
                                        lat2.to_numpy(np.float64),
                                        lng2.to_numpy(np.float64)))

    return cand \
        .withColumn("dist2", _chord2("lat1", "lng1", "lat2", "lng2")) \
        .where(F.col("dist2") <= F.lit(thresh2)) \
        .select("p1", "p2", F.round("dist2", 12).alias("dist2"))


# ---------------------------------------------------------------------------
# raster <-> vector alignment (SURVEY.md §2.5 row raster)
# ---------------------------------------------------------------------------

def raster_vector_align(points: DataFrame, covering_rows: list[tuple],
                        params_by_region: dict,
                        level: int = 8) -> DataFrame:
    """per-(region, raster-tile) statistics: raster tiles are the
    points' level-``level`` cells; vector regions arrive as coverings.
    Pure Column-expr tiling on top of the bucketed broadcast PIP join
    (one scalar-UDF encode, the rest JVM)."""
    cov_df = coverings_df(points.sparkSession, covering_rows,
                          bucket_level=8)
    pts = pip_join_bucketed(points, cov_df, params_by_region,
                            bucket_level=8, extra_cols=("lat", "lng"),
                            emit_cell_id=True)
    return pts.withColumn("tile_id", CC.parent("cell_id", level)) \
        .groupBy("region_id", "tile_id") \
        .agg(F.count("*").alias("n_points"),
             F.round(F.avg("lat"), 6).alias("avg_lat"),
             F.round(F.avg("lng"), 6).alias("avg_lng")) \
        .withColumn("tile_token", CC.token("tile_id")) \
        .drop("tile_id")
