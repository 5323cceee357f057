"""SQL-function surface: the s2_* SQL scalar functions must agree
EXACTLY with the s2spark.columns Column exprs over all six faces
(signedness discipline — faces 4-5 set bit 63), and a pure-SQL
pipeline must reproduce the DataFrame tile assignment."""

import pyspark.sql.functions as F
import pytest

from s2spark import columns as CC
from s2spark import synth
from s2spark.sqlfns import register_s2_sql


@pytest.fixture(scope="module")
def cells(spark, sf_dir):
    register_s2_sql(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select(synth.synth_cell_col().alias("c")).limit(20000)
    df.createOrReplaceTempView("sql_cells")
    assert df.select(CC.face("c").alias("f")).distinct().count() == 6
    return df


def test_sql_fns_match_column_exprs(spark, cells):
    got = spark.sql("""
        SELECT c, s2_lsb(c) AS lsb, s2_level(c) AS lvl,
               s2_is_leaf(c) AS leaf, s2_face(c) AS face,
               s2_sortable(c) AS srt, s2_parent(c, 8) AS p8,
               s2_parent(c, 12) AS p12, s2_range_min(c) AS rmin,
               s2_range_max(c) AS rmax, s2_token(c) AS tok,
               s2_contains(s2_parent(c, 8), c) AS cont,
               s2_contains(c, s2_parent(c, 8)) AS cont_rev,
               s2_intersects(s2_parent(c, 8), c) AS inter
        FROM sql_cells""")
    exp = cells.select(
        "c", CC.lsb("c").alias("lsb"), CC.level("c").alias("lvl"),
        (CC.lsb("c") == F.lit(1)).alias("leaf"),
        CC.face("c").alias("face"), CC.sortable("c").alias("srt"),
        CC.parent("c", 8).alias("p8"), CC.parent("c", 12).alias("p12"),
        CC.range_min("c").alias("rmin"), CC.range_max("c").alias("rmax"),
        CC.token("c").alias("tok"),
        CC.contains(CC.parent("c", 8), F.col("c")).alias("cont"),
        CC.contains(F.col("c"), CC.parent("c", 8)).alias("cont_rev"),
        (CC.sortable(CC.range_min(CC.parent("c", 8)))
         <= CC.sortable(CC.range_max("c"))).alias("inter"))
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exp.collect()))
    assert g == e


def test_sql_fns_face3_boundary(spark, cells):
    """ANSI-overflow regression (ADVICE r5 item 1): range_max on a
    face-3 last-branch cell (id + lsb crosses the sign bit) must not
    raise and must equal columns.py. Covers the level-0 face-3 cell
    0x7000000000000000, its leaf range end 0x7fffffffffffffff, and the
    face-5 twins on the signed side."""
    ids = [0x7000000000000000, 0x7FFFFFFFFFFFFFFF,
           0x3000000000000000,
           0xB000000000000000 - (1 << 64),   # face 5 level 0 (signed)
           0xBFFFFFFFFFFFFFFF - (1 << 64)]
    df = spark.createDataFrame([(i,) for i in ids], "c long")
    df.createOrReplaceTempView("sql_edge_cells")
    got = spark.sql("""
        SELECT c, s2_range_min(c) AS rmin, s2_range_max(c) AS rmax,
               s2_contains(c, c) AS cont_self,
               s2_intersects(c, c) AS inter_self
        FROM sql_edge_cells""")
    exp = df.select(
        "c", CC.range_min("c").alias("rmin"),
        CC.range_max("c").alias("rmax"),
        CC.contains(F.col("c"), F.col("c")).alias("cont_self"),
        F.lit(True).alias("inter_self"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_sql_fns_are_inlined_not_python(spark, cells):
    """the SQL-function bodies must inline into codegen — no
    BatchEvalPython / ArrowEvalPython node in the plan."""
    df = spark.sql("SELECT s2_token(s2_parent(c, 8)) AS t FROM sql_cells")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_pure_sql_tile_pipeline(spark, sf_dir, cells):
    """encode -> parent -> token -> group, written ONLY in SQL,
    equals the DataFrame pipeline."""
    pts = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.pmod("l_orderkey", F.lit(170)) - 85
         + F.col("l_partkey") / 10000.0).alias("lat"),
        (F.pmod("l_partkey", F.lit(360)) - 180).cast("double")
        .alias("lng")).limit(5000)
    pts.createOrReplaceTempView("sql_pts")
    sql = spark.sql("""
        SELECT s2_token(s2_parent(s2_cell_id(lat, lng), 6)) AS tile,
               count(*) AS n
        FROM sql_pts GROUP BY 1""")
    from s2spark.udfs import s2_cell_id
    exp = pts.select(CC.token(CC.parent(s2_cell_id("lat", "lng"), 6))
                     .alias("tile")) \
        .groupBy("tile").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, sql.collect())) == \
        sorted(map(tuple, exp.collect()))
