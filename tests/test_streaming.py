"""Structured Streaming operator tests (file source, availableNow trigger,
memory sink) — verifies the streaming plans run end-to-end and match the
equivalent batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linref_spark.pipeline.streaming import stream_sessionize, stream_tile_counts


@pytest.fixture()
def event_dir(spark, tmp_path):
    rows = []
    for i in range(200):
        rows.append(
            (
                f"u{i}",
                # two bursts separated by > gap for route R0
                f"2026-01-01 00:{((i // 4) % 2) * 40 + (i % 10):02d}:00",
                f"R{i % 4}",
                float(i % 50),
                float(i % 30),
            )
        )
    df = spark.createDataFrame(
        rows, ["url", "ts_str", "route_id", "x", "y"]
    ).withColumn("warc_ts", F.to_timestamp("ts_str")).drop("ts_str")
    path = str(tmp_path / "events")
    df.write.parquet(path)
    return path, df


def _run_stream(spark, stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_tile_counts_matches_batch(spark, event_dir, tmp_path):
    path, batch_df = event_dir
    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_tile_counts(stream, window="10 minutes", res=6)
    got = _run_stream(spark, out, tmp_path, "tiles_stream")
    # batch equivalent
    from linref_spark.spatial.tiles import point_tile

    batch = (
        batch_df.withColumn("tile_id", point_tile(F.col("x"), F.col("y"), 6))
        .groupBy(F.window("warc_ts", "10 minutes").alias("window"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = {(r.window.start, r.tile_id): r.n for r in got.collect()}
    b = {(r.window.start, r.tile_id): r.n for r in batch.collect()}
    assert g == b and len(g) > 0
    assert sum(g.values()) == 200


def test_stream_sessionize(spark, event_dir, tmp_path):
    path, batch_df = event_dir
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    out = stream_sessionize(stream, gap="30 minutes")
    got = _run_stream(spark, out, tmp_path, "sessions_stream")
    rows = got.collect()
    assert sum(r.n_events for r in rows) == 200
    # each route's two bursts (minute 0-9 and 40-49) are > gap apart -> 2 sessions
    per_route = {}
    for r in rows:
        per_route.setdefault(r.route_id, 0)
        per_route[r.route_id] += 1
    assert all(v == 2 for v in per_route.values())
