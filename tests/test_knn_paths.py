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


def test_knn_per_query_k(spark, sparse_points):
    rows, df = sparse_points
    got = J.knn_join(spark, df, QUERIES, level=4).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert {q: sorted(v) for q, v in per_q.items()} == {
        0: [1, 2, 3], 1: [1, 2, 3, 4, 5], 2: [1, 2]}
