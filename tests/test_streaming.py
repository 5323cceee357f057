"""Streaming ≡ batch equivalence for the tile-window pipeline
(SURVEY.md §2.10): the same expression tree on readStream produces
the same aggregates as the batch run."""

import os
import shutil

from s2spark import streaming as ST


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/events.parquet"
    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    shutil.copy(src, os.path.join(stream_dir, "part-0.parquet"))

    batch = ST.windowed_tile_counts(spark.read.parquet(src))
    expected = sorted(tuple(r) for r in batch.collect())

    got_df = ST.run_stream_to_memory(spark, stream_dir, name="tc_test")
    got = sorted(tuple(r) for r in got_df.collect())
    assert len(got) > 0
    assert got == expected


def test_stateless_tile_assignment_on_stream(spark, sf_dir, tmp_path):
    stream_dir = str(tmp_path / "ev2")
    os.makedirs(stream_dir)
    shutil.copy(f"{sf_dir}/events.parquet",
                os.path.join(stream_dir, "part-0.parquet"))
    stream = ST.geo_events(ST.read_events_stream(spark, stream_dir))
    q = stream.select("event_id", "tile_token") \
        .writeStream.format("memory").queryName("tiles_test") \
        .outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination()
    rows = spark.table("tiles_test").collect()
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(rows) == n_batch
    assert all(r["tile_token"] for r in rows)
