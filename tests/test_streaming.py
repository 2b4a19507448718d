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


def test_stream_union_intervals_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): the final
    per-route spans must equal the batch dissolve of all events."""
    from linref_spark.events.frame import add_event_id
    from linref_spark.events.modify import dissolve
    from linref_spark.lrs import LRS
    from linref_spark.pipeline.streaming import stream_union_intervals

    rows = []
    # unique touching chains per route (no partial overlap, so streaming
    # union == batch dissolve), plus a gap to force multiple spans
    for i in range(90):
        route = f"R{i % 3}"
        j = i // 3
        beg = float(j * 4 + (40 if j >= 15 else 0))  # gap after 15 chained
        rows.append((route, beg, beg + 4.0))
    batch_df = spark.createDataFrame(rows, "route_id string, beg double, end double")
    path = str(tmp_path / "iv_events")
    # two files -> at least one micro-batch boundary exercises state reuse
    batch_df.limit(60).write.parquet(path)
    batch_df.exceptAll(batch_df.limit(60)).write.mode("append").parquet(path)

    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    out = stream_union_intervals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("iv_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_iv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_df = spark.table("iv_stream")
    # update mode re-emits per batch: keep the latest emission per key
    # (max n_events), then compare span sets
    import collections

    latest = collections.defaultdict(list)
    max_n = {}
    for r in got_df.collect():
        max_n[r["route_id"]] = max(max_n.get(r["route_id"], 0), r["n_events"])
    for r in got_df.collect():
        if r["n_events"] == max_n[r["route_id"]]:
            latest[r["route_id"]].append((r["beg"], r["end"]))
    lrs = LRS(key_cols=("route_id",), beg_col="beg", end_col="end")
    want = collections.defaultdict(list)
    for r in dissolve(add_event_id(batch_df, lrs), lrs).collect():
        want[r["route_id"]].append((r["beg"], r["end"]))
    for k in want:
        assert sorted(set(latest[k])) == sorted(want[k]), k


def test_stream_union_diverges_from_batch_dissolve_on_partial_overlap(
    spark, tmp_path
):
    """Documented divergence: batch dissolve chains only exactly-touching
    events, stream_union_intervals merges ANY overlap — on a partial-overlap
    feed the stream emits ONE covering span while batch keeps separate runs."""
    from linref_spark.events.frame import add_event_id
    from linref_spark.events.modify import dissolve
    from linref_spark.lrs import LRS
    from linref_spark.pipeline.streaming import stream_union_intervals

    rows = [("R0", 0.0, 5.0), ("R0", 3.0, 9.0), ("R0", 8.0, 12.0)]
    batch_df = spark.createDataFrame(rows, "route_id string, beg double, end double")
    path = str(tmp_path / "ov_events")
    batch_df.write.parquet(path)

    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    q = (
        stream_union_intervals(stream)
        .writeStream.format("memory")
        .queryName("ov_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ov"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["beg"], r["end"])
        for r in spark.table("ov_stream").collect()
        if r["n_events"] == 3
    }
    assert got == {(0.0, 12.0)}  # coverage union: one merged span

    lrs = LRS(key_cols=("route_id",), beg_col="beg", end_col="end")
    batch = {
        (r["beg"], r["end"])
        for r in dissolve(add_event_id(batch_df, lrs), lrs).collect()
    }
    # batch dissolve: nothing exactly touches, so all three events survive
    assert batch == {(0.0, 5.0), (3.0, 9.0), (8.0, 12.0)}
    assert got != batch


def test_stream_dedup_exact(spark, tmp_path):
    """Streaming exact dedup: first doc per md5(text) within the watermark
    horizon survives; batch dedup of the stream output is a no-op."""
    from pyspark.sql import functions as F

    from linref_spark.pipeline.streaming import stream_dedup_exact
    from linref_spark.web.dedup import dedup_exact

    rows = []
    base = "2024-01-01 10:{m:02d}:00"
    for i in range(30):
        # 10 distinct texts, each appearing 3x at different minutes
        rows.append((i, f"doc body {i % 10}", base.format(m=i)))
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").select(
        "doc_id", "text", F.col("ts").cast("timestamp").alias("warc_ts")
    )
    path = str(tmp_path / "docs_stream")
    df.write.parquet(path)

    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        stream_dedup_exact(stream, ts_col="warc_ts")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream").select("doc_id", "text").collect()
    texts = [r["text"] for r in got]
    assert sorted(texts) == sorted({f"doc body {k}" for k in range(10)})
    # exactly one survivor per text (which row wins within a micro-batch
    # is engine-order-defined; see the operator docstring)
    assert len(got) == 10
    # idempotent under batch dedup
    batch = dedup_exact(spark.table("dedup_stream").select("doc_id", "text"))
    assert batch.count() == 10
