"""Physical-plan assertions (SURVEY.md §7.3-3): the join strategies
must compile to the plans they were designed for — a silent fallback
to BroadcastNestedLoopJoin is the range-join performance cliff."""

import pytest
from pyspark.sql import functions as F

from s2spark import fixtures as FX
from s2spark import joins as J


@pytest.fixture(scope="module")
def pieces(spark):
    cov_rows = J.compute_coverings(FX.region_objects())
    params = FX.region_params()
    return cov_rows, params


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_broadcast_hash(spark, sf_dir, pieces):
    cov_rows, params = pieces
    cov_df = J.coverings_df(spark, cov_rows, bucket_level=8)
    df = J.pip_join_bucketed(FX.points_df(spark, sf_dir), cov_df, params,
                             bucket_level=8)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_single_encode_pass(spark, sf_dir, pieces):
    """constraint propagation must not duplicate the encode UDF
    (one ArrowEvalPython for encode + one for verify)."""
    old = spark.conf.get("spark.sql.constraintPropagation.enabled")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        cov_rows, params = pieces
        cov_df = J.coverings_df(spark, cov_rows, bucket_level=8)
        df = J.pip_join_bucketed(FX.points_df(spark, sf_dir), cov_df,
                                 params, bucket_level=8)
        assert _plan(df).count("ArrowEvalPython") == 2
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", old)


def test_salted_join_no_nested_loop(spark, sf_dir, pieces):
    cov_rows, params = pieces
    cov_df = J.coverings_df(spark, cov_rows)
    df = J.pip_join_salted(FX.points_df(spark, sf_dir), cov_df, params)
    assert "BroadcastNestedLoopJoin" not in _plan(df)


def test_mapside_join_has_no_shuffle(spark, sf_dir, pieces):
    """the interval-stab variant is a pure map-side pass — zero
    Exchange nodes before the output."""
    cov_rows, params = pieces
    df = J.pip_join_broadcast(FX.points_df(spark, sf_dir), cov_rows, params)
    assert "Exchange" not in _plan(df)


def test_tile_path_is_whole_stage_codegen(spark, sf_dir):
    """parent/token tiling on an existing cell-id column stays inside
    WholeStageCodegen (no Python, no shuffle)."""
    from s2spark import columns as CC
    from s2spark import synth
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select(synth.synth_cell_col().alias("cell_id")) \
        .select(CC.token(CC.parent("cell_id", 8)).alias("t"))
    plan = _plan(df)
    # "*(1)" prefixes mark WholeStageCodegen stages in the plan string
    assert "WholeStageCodegen" in plan or "*(1)" in plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Exchange"):
        assert bad not in plan


def test_parquet_filter_pushdown(spark, sf_dir):
    """non-geo predicates reach the parquet scan (PushedFilters)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.where(F.col("l_orderkey") > 1000).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), GreaterThan(l_orderkey" \
        in plan or "GreaterThan(l_orderkey,1000)" in plan
