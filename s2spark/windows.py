"""Skew-safe window primitives.

``row_number() OVER (PARTITION BY key)`` hashes every row of a key to
ONE reducer and sorts the whole partition there — the exact plan a
hot key (caption-template spam, a giant near-dup cluster) dies on at
100× scale (VERDICT r4 item 2). This module provides the two-stage
replacements:

* argmax/top-1 per key → salt + two windows (``text.dedup_keep_best``
  does this inline; the survivors of stage 1 bound stage 2 at
  ``n_salt`` rows per key).
* EXACT rank of every row per key → :func:`bucketed_row_number`:
  order-preserving range buckets spread the hot key across reducers,
  and per-bucket local ranks + cumulative bucket offsets reassemble
  the exact global rank without any single-reducer sort.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_row_number(df: DataFrame, keys: list[str],
                        bucket_num: Column, order_cols: list,
                        n_buckets: int = 16,
                        bounds: tuple[int, int] | None = None,
                        rank_name: str = "rnk") -> DataFrame:
    """exact ``row_number() OVER (PARTITION BY keys ORDER BY
    order_cols)`` for EVERY row, computed skew-safely.

    ``bucket_num`` must be a numeric Column MONOTONE NON-DECREASING
    with respect to the ``order_cols`` total order (e.g. the numeric
    suffix of a fixed-width string id) — then range buckets respect
    the order, and ``rank = (#rows of this key in lower buckets) +
    local rank within (key, bucket)``. The order must be total (no
    ties) or ranks within a bucket are nondeterministic.

    Plan shape: one window per (key, bucket) — a hot key spreads over
    ``n_buckets`` reducers — one map-side-combined count per (key,
    bucket), one ≤``n_buckets``-row window per key for the cumulative
    offsets, and one equi-join on (key, bucket) that reuses the
    stage-1 shuffle key. ``bounds`` skips the one tiny min/max agg
    job when the caller already knows the bucket-number range.
    """
    if bounds is None:
        row = df.agg(F.min(bucket_num), F.max(bucket_num)).first()
        lo, hi = (row[0], row[1]) if row else (None, None)
    else:
        lo, hi = bounds
    if lo is None:           # empty input: any constant bucket works
        bkt = F.lit(1)
    else:
        # coalesce: width_bucket(NULL) is NULL and the (keys, _bkt)
        # equi-join below would silently drop such rows (ADVICE r5
        # item 2); bucket 0 sorts before every real bucket, so rows
        # with a NULL surrogate rank first, deterministically
        bkt = F.coalesce(
            F.width_bucket(bucket_num, F.lit(lo), F.lit(hi + 1),
                           F.lit(n_buckets)), F.lit(0))
    d = df.withColumn("_bkt", bkt)
    w1 = Window.partitionBy(*keys, "_bkt").orderBy(*order_cols)
    local = d.withColumn("_lr", F.row_number().over(w1))
    cnt = d.groupBy(*keys, "_bkt").agg(F.count("*").alias("_n"))
    woff = Window.partitionBy(*keys).orderBy("_bkt") \
        .rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select(*keys, "_bkt",
                     F.coalesce(F.sum("_n").over(woff),
                                F.lit(0)).alias("_off"))
    return local.join(off, [*keys, "_bkt"]) \
        .withColumn(rank_name, (F.col("_off") + F.col("_lr"))
                    .cast("int")) \
        .drop("_bkt", "_lr", "_off")
