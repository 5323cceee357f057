"""Skew-safe window de-skew (VERDICT r4 item 2): the per-key
row_number windows in multimodal_dedup and dedup_keep_best must not
funnel a hot key (spam caption template, giant near-dup cluster)
onto one reducer — and the two-stage replacements must be EXACTLY
equal to the single-window semantics."""

import re

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from s2spark import images as IM
from s2spark import text as T
from s2spark.windows import bucketed_row_number


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_row_number_matches_plain_window(spark):
    """hot key (5000 rows) + small keys: exact rank equality against
    the single-window reference at test scale."""
    rows = [("hot", int(v)) for v in
            np.random.default_rng(3).permutation(5000)]
    rows += [(f"k{i}", int(v)) for i in range(7) for v in range(i + 1)]
    df = spark.createDataFrame(rows, "key string, v long")
    got = sorted(map(tuple, bucketed_row_number(
        df, ["key"], F.col("v"), ["v"], n_buckets=8).collect()))
    w = Window.partitionBy("key").orderBy("v")
    exp = sorted(map(tuple, df.withColumn(
        "rnk", F.row_number().over(w).cast("int")).collect()))
    assert got == exp


def test_bucketed_row_number_bounds_and_empty(spark):
    df = spark.createDataFrame([("a", 5), ("a", 9), ("b", 7)],
                               "key string, v long")
    got = sorted(map(tuple, bucketed_row_number(
        df, ["key"], F.col("v"), ["v"], n_buckets=4,
        bounds=(0, 10)).collect()))
    assert got == [("a", 5, 1), ("a", 9, 2), ("b", 7, 1)]
    empty = bucketed_row_number(df.where("v > 100"), ["key"],
                                F.col("v"), ["v"]).collect()
    assert empty == []


def _images(spark, n_spam=120, n_other=15):
    """spam template (n_spam rows, one digit-normalized caption) +
    distinct captions; random phashes are pairwise-far (P(ham<=7)
    ~ 3e-11) so every visual cluster is a singleton."""
    rng = np.random.default_rng(11)
    ph = rng.integers(-2**63, 2**63, n_spam + n_other, dtype=np.int64)
    rows = [(f"img{i:012d}", f"spam {i} wow", int(ph[i]))
            for i in range(n_spam)]
    rows += [(f"img{n_spam + i:012d}", f"unique caption number-{chr(97 + i)}",
              int(ph[n_spam + i])) for i in range(n_other)]
    return rows, spark.createDataFrame(
        rows, "image_id string, caption string, phash long")


def test_multimodal_dedup_hot_template_exact(spark):
    rows, df = _images(spark)
    got = {r["image_id"]: (r["canonical_id"], r["tpl_rank"], r["keep"])
           for r in IM.multimodal_dedup(df).collect()}
    spam_ids = sorted(i for i, c, _ in rows if c.startswith("spam"))
    assert len(got) == len(rows)
    for i, c, _ in rows:
        canon, rank, keep = got[i]
        assert canon == i          # singleton visual clusters
        exp_rank = spam_ids.index(i) + 1 if c.startswith("spam") else 1
        assert rank == exp_rank
        assert keep == (exp_rank <= IM.MM_TEMPLATE_CAP)


def test_multimodal_dedup_window_is_bucketed(spark):
    """the template-rank window's partition spec must include the
    order-preserving bucket — a bare PARTITION BY tpl_hash window is
    the single-reducer hot-key plan this test pins out."""
    _, df = _images(spark, n_spam=30, n_other=5)
    plan = _plan(IM.multimodal_dedup(df))
    assert re.search(r"windowspecdefinition\(tpl_hash#\d+L?, _bkt#", plan)
    bare = re.findall(r"windowspecdefinition\(tpl_hash#\d+L?,\s*image_id",
                      plan)
    assert not bare


def test_dedup_keep_best_first_stage_salted(spark, sf_dir):
    """stage-1 shuffle key must include the salt (hot-cluster
    spread); stage 2 may partition by canonical_id alone — its input
    is bounded at KEEP_BEST_SALT rows per cluster."""
    plan = _plan(T.dedup_keep_best(spark, sf_dir))
    assert re.search(
        r"windowspecdefinition\(canonical_id#\d+L?, salt#", plan)
    # the winner join-back must be the hinted shuffle-hash join (the
    # stats-less best table would otherwise sort-merge; broadcast
    # would not be scale-safe at one-row-per-cluster cardinality)
    assert "ShuffledHashJoin" in plan


def test_bucketed_row_number_stale_bounds_still_exact(spark):
    """caller-supplied bounds narrower than the data (stale stats at
    scale): width_bucket clamps out-of-range values to buckets 0 and
    n+1, which is still MONOTONE wrt the order — ranks must remain
    exact, only the spread degrades."""
    rows = [("k", int(v)) for v in
            np.random.default_rng(9).permutation(2000)]
    df = spark.createDataFrame(rows, "key string, v long")
    got = sorted(map(tuple, bucketed_row_number(
        df, ["key"], F.col("v"), ["v"], n_buckets=8,
        bounds=(500, 1000)).collect()))
    w = Window.partitionBy("key").orderBy("v")
    exp = sorted(map(tuple, df.withColumn(
        "rnk", F.row_number().over(w).cast("int")).collect()))
    assert got == exp
