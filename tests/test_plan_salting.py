"""Targeted hot-tile salting: identical join output to the unsalted
variants, hot buckets detected from the Zipfian fixture."""

from s2spark import fixtures as FX
from s2spark import joins as J
from s2spark import plan as P


def test_targeted_salting_equivalence(spark, sf_dir):
    cov_rows = J.compute_coverings(FX.region_objects())
    params = FX.region_params()
    pts = FX.points_df(spark, sf_dir)
    cov_df = J.coverings_df(spark, cov_rows, bucket_level=4)

    counts = P.bucket_counts(pts, bucket_level=4, sample_fraction=None)
    salts = P.hot_bucket_salts(counts)
    got = sorted((r[0], r[1]) for r in P.pip_join_salted_targeted(
        pts, cov_df, params, salts, bucket_level=4).collect())
    ref = sorted((r[0], r[1]) for r in J.pip_join_broadcast(
        pts, cov_rows, params).collect())
    assert got == ref

    # with NO salts at all the join still matches
    got0 = sorted((r[0], r[1]) for r in P.pip_join_salted_targeted(
        pts, cov_df, params, {}, bucket_level=4).collect())
    assert got0 == ref


def test_targeted_salting_df_salt_map(spark, sf_dir):
    """the DataFrame salt-map form (scale path, no driver dict —
    VERDICT r5 item 6) must produce the identical join output."""
    cov_rows = J.compute_coverings(FX.region_objects())
    params = FX.region_params()
    pts = FX.points_df(spark, sf_dir)
    cov_df = J.coverings_df(spark, cov_rows, bucket_level=4)
    hot = P.hot_bucket_salts_df(pts, bucket_level=4,
                                sample_fraction=None)
    got = sorted((r[0], r[1]) for r in P.pip_join_salted_targeted(
        pts, cov_df, params, hot, bucket_level=4).collect())
    ref = sorted((r[0], r[1]) for r in J.pip_join_broadcast(
        pts, cov_rows, params).collect())
    assert got == ref


def test_hot_bucket_detection_on_skewed_points(spark):
    """the bench generator's hot-city mix must trip the detector."""
    import bench
    pts = bench.synthetic_points(spark, 200_000)
    counts = P.bucket_counts(pts, bucket_level=4, sample_fraction=0.2)
    salts = P.hot_bucket_salts(counts)
    assert salts, "hot-city fixture should produce skewed buckets"
    assert all(2 <= s <= 16 for s in salts.values())


def test_strategy_choice():
    assert P.choose_pip_strategy(1000, {}) == "bucketed"
    assert P.choose_pip_strategy(10_000_000, {}) == "salted"
    assert P.choose_pip_strategy(10_000_000, {5: 4}) == "salted_targeted"
