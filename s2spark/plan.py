"""Join-strategy planner + hot-tile skew handling (SURVEY.md §4.3).

Geo data is Zipfian (hot cities): a uniform salt wastes S× covering
replication on cold buckets, while AQE can split skewed shuffle
partitions but not a single hot *key* on a replicated build side. So:

1. :func:`hot_bucket_salts` — estimate per-bucket point counts from a
   cheap sample, return {bucket: salt_factor} for buckets above the
   skew threshold (salt factor scales with the bucket's share);
2. :func:`pip_join_salted_targeted` — the salted shuffle join with
   covering rows replicated ONLY for hot buckets (cold buckets keep a
   single salt), point salt = hash % factor per bucket;
3. :func:`choose_pip_strategy` — picks broadcast / bucketed / salted
   by covering size and skew stats (the "planner-in-Python" of
   SURVEY.md §4.3: no custom Catalyst rule needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2spark import columns as CC
from s2spark.joins import make_verify_udf, with_cell_id

# above ~this many exploded covering rows, a broadcast stops being free
BROADCAST_COVERING_LIMIT = 5_000_000


def bucket_counts(points: DataFrame, bucket_level: int,
                  sample_fraction: float | None = 0.05) -> dict[int, int]:
    """sampled per-bucket point counts (one cheap pass)."""
    pts = points if "cell_id" in points.columns else with_cell_id(points)
    if sample_fraction is not None and sample_fraction < 1.0:
        pts = pts.sample(fraction=sample_fraction, seed=42)
    rows = pts.groupBy(CC.parent("cell_id", bucket_level).alias("b")) \
        .count().collect()
    scale = 1.0 / (sample_fraction or 1.0)
    return {r["b"]: int(r["count"] * scale) for r in rows}


def hot_bucket_salts(counts: dict[int, int], max_salt: int = 16,
                     skew_ratio: float = 4.0) -> dict[int, int]:
    """salt factors for buckets holding more than ``skew_ratio``× the
    mean bucket load; factor grows with the bucket's excess share."""
    if not counts:
        return {}
    mean = sum(counts.values()) / len(counts)
    salts = {}
    for b, c in counts.items():
        if c > skew_ratio * mean:
            salts[b] = min(max_salt, max(2, round(c / mean)))
    return salts


def hot_bucket_salts_df(points: DataFrame, bucket_level: int,
                        sample_fraction: float | None = 0.05,
                        max_salt: int = 16,
                        skew_ratio: float = 4.0) -> DataFrame:
    """the SCALE form of bucket_counts + hot_bucket_salts (VERDICT r5
    item 6): the per-bucket histogram, the mean, and the salt factors
    stay DataFrames end to end — no driver-side dict, so a deep
    bucket level on a 100 TB table costs one sampled partial-agg
    shuffle instead of a driver collect. Output (sb, factor) rows for
    hot buckets only (broadcast-join it into the salted join). The
    sampling scale factor cancels in both the ratio test and the
    factor (c/mean), so the sampled counts are used raw; factor
    rounding is HALF_UP here vs python banker's rounding in the dict
    form — a perf-only difference in salt width, never in join
    output."""
    from s2spark.joins import with_cell_id
    pts = points if "cell_id" in points.columns else with_cell_id(points)
    if sample_fraction is not None and sample_fraction < 1.0:
        pts = pts.sample(fraction=sample_fraction, seed=42)
    counts = pts.groupBy(
        CC.parent("cell_id", bucket_level).alias("sb")) \
        .agg(F.count("*").alias("c"))
    mean = counts.agg(F.avg("c").alias("mean"))
    return counts.crossJoin(F.broadcast(mean)) \
        .where(F.col("c") > F.lit(skew_ratio) * F.col("mean")) \
        .select("sb", F.least(
            F.lit(max_salt),
            F.greatest(F.lit(2), F.round(F.col("c") / F.col("mean"))
                       .cast("int"))).cast("int").alias("factor"))


def pip_join_salted_targeted(points: DataFrame, cov_df: DataFrame,
                             params_by_region: dict,
                             salt_map,
                             bucket_level: int) -> DataFrame:
    """salted shuffle PIP join replicating covering rows only for hot
    buckets. ``cov_df`` from :func:`s2spark.joins.coverings_df` with
    the same ``bucket_level``. ``salt_map`` is either the dict form
    ({bucket: factor}) or a (sb, factor) DataFrame from
    :func:`hot_bucket_salts_df` (the scale path — broadcast as-is,
    nothing ever collected). Output: (region_id, point_id)."""
    spark = points.sparkSession
    if isinstance(salt_map, DataFrame):
        salt_df = F.broadcast(salt_map)
    elif salt_map:
        salt_df = F.broadcast(spark.createDataFrame(
            [(b, s) for b, s in salt_map.items()], "sb long, factor int"))
    else:
        salt_df = F.broadcast(spark.createDataFrame(
            [(0, 1)], "sb long, factor int").limit(0))

    pts = points if "cell_id" in points.columns else with_cell_id(points)
    pts = pts.withColumn("bucket", CC.parent("cell_id", bucket_level)) \
             .withColumn("leaf_s", CC.sortable("cell_id"))
    # point side: salt = hash % factor for hot buckets, else 0
    pts = pts.join(salt_df, pts["bucket"] == salt_df["sb"], "left") \
        .withColumn("salt",
                    F.when(F.col("factor").isNotNull(),
                           F.pmod(F.hash("point_id"), F.col("factor")))
                    .otherwise(F.lit(0))) \
        .drop("sb", "factor")
    # covering side: explode hot buckets ×factor, cold keep salt 0
    cov = cov_df.join(salt_df, cov_df["bucket"] == salt_df["sb"], "left") \
        .withColumn("salt",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.coalesce(F.col("factor"), F.lit(1)) - F.lit(1)))) \
        .drop("sb", "factor")
    joined = pts.join(
        cov,
        (pts["bucket"] == cov["bucket"]) & (pts["salt"] == cov["salt"])
        & pts["leaf_s"].between(cov["range_min_s"], cov["range_max_s"]),
        "inner")
    verify = make_verify_udf(params_by_region, with_interior=True)
    return joined.where(verify("region_id", "lat", "lng", "interior")) \
        .select("region_id", pts["point_id"])


def choose_pip_strategy(n_exploded_covering: int,
                        salt_map: dict[int, int]) -> str:
    """'bucketed' (broadcast hash) when the covering fits a broadcast;
    'salted' shuffle otherwise; targeted salting whenever hot buckets
    exist on the shuffle path."""
    if n_exploded_covering <= BROADCAST_COVERING_LIMIT:
        return "bucketed"
    return "salted_targeted" if salt_map else "salted"


def choose_pip_plan(points: DataFrame, n_exploded_covering: int,
                    bucket_level: int,
                    sample_fraction: float | None = 0.05
                    ) -> tuple[str, dict[int, int]]:
    """strategy + salt map in one call, running the sampled skew probe
    ONLY when the covering cannot broadcast (r6, guide §1.2): on the
    broadcast-hash path the probe is pure cost — point skew cannot
    change the choice, because a broadcast join has no shuffle to
    salt. Identical decisions to probing first, one fewer pass over
    the point table on the common path. On the shuffle path the salt
    map is the DataFrame form (:func:`hot_bucket_salts_df`) — no
    driver dict on the scale path (VERDICT r5 item 6); the only
    driver value is the tiny any-hot probe."""
    if n_exploded_covering <= BROADCAST_COVERING_LIMIT:
        return "bucketed", {}
    hot = hot_bucket_salts_df(points, bucket_level,
                              sample_fraction).persist()
    return ("salted" if hot.isEmpty() else "salted_targeted"), hot
