"""kNN ring-join edge paths: brute-force fallback when rounds run
out, the max_rounds=0 degenerate, per-query k, and exactness of the
certified-emission restructure vs a python brute force."""

import math

import numpy as np
import pytest

from s2spark import joins as J


def _brute(points, queries):
    """exact (query_id, point_id, rnk) via chord distance in python."""
    out = []
    for qid, qlat, qlng, k in queries:
        def xyz(lat, lng):
            phi, lam = math.radians(lat), math.radians(lng)
            return (math.cos(phi) * math.cos(lam),
                    math.cos(phi) * math.sin(lam), math.sin(phi))
        qx = xyz(qlat, qlng)
        d = []
        for pid, lat, lng in points:
            px = xyz(lat, lng)
            d2 = sum((a - b) ** 2 for a, b in zip(qx, px))
            d.append((d2, pid))
        d.sort()
        out.extend((qid, pid, r + 1) for r, (_, pid) in enumerate(d[:k]))
    return sorted(out)


@pytest.fixture(scope="module")
def sparse_points(spark):
    """40 points spread worldwide — sparse at level 6, so small
    max_rounds forces the fallback paths."""
    rng = np.random.default_rng(7)
    rows = [(int(i), float(lat), float(lng))
            for i, (lat, lng) in enumerate(
                zip(rng.uniform(-80, 80, 40), rng.uniform(-179, 179, 40)))]
    return rows, spark.createDataFrame(
        rows, "point_id long, lat double, lng double")


QUERIES = [(0, 10.0, 20.0, 3), (1, -45.0, 170.0, 5), (2, 80.0, -10.0, 2)]


def test_knn_normal_rounds_exact(spark, sparse_points):
    rows, df = sparse_points
    got = sorted(map(tuple, J.knn_join(spark, df, QUERIES,
                                       level=6).collect()))
    assert got == _brute(rows, QUERIES)


def test_knn_fallback_rounds_exhausted(spark, sparse_points):
    """max_rings=1 on sparse data: most queries cannot certify at one
    ring -> brute-force fallback branch, still exact."""
    rows, df = sparse_points
    got = sorted(map(tuple, J.knn_join(spark, df, QUERIES, level=10,
                                       max_rings=1).collect()))
    assert got == _brute(rows, QUERIES)


def test_knn_max_rounds_zero_brute_force(spark, sparse_points):
    """max_rounds=0 degenerate goes straight to the brute-force path
    (it used to return the UNCERTIFIED own-tile ranking)."""
    rows, df = sparse_points
    q = spark.createDataFrame(
        [(qid, lat, lng, k) for qid, lat, lng, k in QUERIES],
        "query_id long, lat double, lng double, k int")
    got = sorted(map(tuple, J.knn_join_df(df, q, level=6,
                                          max_rounds=0).collect()))
    assert got == _brute(rows, QUERIES)


def test_knn_fallback_bounded_no_crossjoin(spark, monkeypatch):
    """a ring of points past the 1-ring certification bound with
    max_rings=1: the query finds >= k candidates but cannot certify,
    so it takes the BOUNDED fallback — a covering-disk EQUI-join
    sized by its proven kth upper bound, not a cross join against
    all occupied tiles (VERDICT r4 item 3). crossJoin is patched on
    the concrete (classic) DataFrame class to fail loudly."""
    import math

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    delta = 0.03
    rows = [(int(i), float(10.2 + delta * math.sin(a)),
             float(20.2 + delta * math.cos(a)))
            for i, a in enumerate(
                np.linspace(0, 2 * np.pi, 12, endpoint=False))]
    rows += [(100 + i, float(12.0 + 0.1 * i), float(22.0 + 0.07 * i))
             for i in range(40)]
    df = spark.createDataFrame(
        rows, "point_id long, lat double, lng double")
    queries = [(0, 10.2, 20.2, 3)]

    def _no_cross(self, other):
        raise AssertionError("bounded kNN fallback must not crossJoin")

    monkeypatch.setattr(CDF, "crossJoin", _no_cross)
    got = sorted(map(tuple, J.knn_join(spark, df, queries, level=11,
                                       max_rings=1).collect()))
    assert J.LAST_KNN_FALLBACK == {"bounded": True, "unbounded": False}
    assert got == _brute(rows, queries)


def test_knn_fallback_unbounded_arm_still_exact(spark, sparse_points):
    """worldwide-sparse at a fine level: ring-1 disks hold < k
    candidates, so no kth upper bound exists and the stragglers take
    the (rare) all-tiles arm — still exact."""
    rows, df = sparse_points
    got = sorted(map(tuple, J.knn_join(spark, df, QUERIES, level=13,
                                       max_rings=1).collect()))
    assert J.LAST_KNN_FALLBACK == {"bounded": False, "unbounded": True}
    assert got == _brute(rows, QUERIES)


def test_knn_per_query_k(spark, sparse_points):
    rows, df = sparse_points
    got = J.knn_join(spark, df, QUERIES, level=4).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert {q: sorted(v) for q, v in per_q.items()} == {
        0: [1, 2, 3], 1: [1, 2, 3, 4, 5], 2: [1, 2]}
