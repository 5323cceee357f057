"""HLL tile sketch rollup: the approximate op is gated by its exact
twin (the image_tile_stats pattern) — per-tile relative error bound
plus structural consistency between the two levels."""

from pyspark.sql import functions as F

from s2spark import sketches as SK
from s2spark import synth


def _frames(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select(synth.synth_cell_col().alias("cell_id"),
                   F.col("l_partkey"))
    approx = SK.tile_distinct_rollup(df, "cell_id", "l_partkey")
    exact = SK.tile_distinct_rollup_exact(df, "cell_id", "l_partkey")
    return approx, exact


def test_sketch_tracks_exact(spark, sf_dir):
    approx, exact = _frames(spark, sf_dir)
    a = {(r["level"], r["tile_token"]): r for r in approx.collect()}
    e = {(r["level"], r["tile_token"]): r for r in exact.collect()}
    assert a.keys() == e.keys() and a
    for k in e:
        assert a[k]["n_rows"] == e[k]["n_rows"]       # counts are exact
        err = abs(a[k]["distinct_est"] - e[k]["distinct_est"]) \
            / max(1, e[k]["distinct_est"])
        assert err <= 0.05, (k, a[k]["distinct_est"],
                             e[k]["distinct_est"])


def test_sketch_union_levels_consistent(spark, sf_dir):
    """each coarse tile's n_rows equals the sum of its fine children
    (the union consumed exactly the per-fine-tile sketches)."""
    approx, _ = _frames(spark, sf_dir)
    rows = approx.collect()
    fine = [r for r in rows if r["level"] == 8]
    coarse = [r for r in rows if r["level"] == 4]
    assert fine and coarse
    assert sum(r["n_rows"] for r in fine) == \
        sum(r["n_rows"] for r in coarse)
    # distinct can only shrink or hold under union of overlapping sets
    for c in coarse:
        assert c["distinct_est"] <= sum(r["n_rows"] for r in fine)


def test_sketch_single_fact_scan(spark, sf_dir):
    """the union's two level outputs must read the PERSISTED fine-
    sketch table, not rescan the fact table per level: both union
    branches are InMemoryTableScans (the cached relation's printed
    description contains the FileScan, so every textual FileScan
    occurrence must be accounted for by a cache hit — no bare,
    uncached fact scan in the plan)."""
    approx, _ = _frames(spark, sf_dir)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") == 2
