"""Structured Streaming operators: continuous page-event ingestion.

The reference is purely batch (SURVEY §2.10), and the north rule's
resumability is a batch-checkpoint concern — but a live crawl feed is the
natural streaming extension of the pages pipeline, so the engine provides
the streaming equivalents of its hot aggregations:

- :func:`stream_tile_counts` — watermarked sliding-window page counts per
  tile (the raster rollup, continuously);
- :func:`stream_sessionize` — per-route session windows over event gaps
  (the streaming analogue of dissolve's sessionization).

Both are pure DataFrame transforms over a streaming frame: callers own the
source (`spark.readStream.schema(...).parquet(dir)`, Kafka, rate) and sink
(`writeStream` with checkpointLocation — which supplies exactly-once resume
on top of the batch pipeline's manifest checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linref_spark.spatial.tiles import point_tile


def stream_tile_counts(
    events: DataFrame,
    ts_col: str = "warc_ts",
    x_col: str = "x",
    y_col: str = "y",
    res: int = 6,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed counts per tile.

    Late rows beyond ``watermark`` are dropped; state is bounded by
    (watermark / slide) x live tiles. Output: (window, tile_id, n, n_bytes?).
    """
    tiled = events.withWatermark(ts_col, watermark).withColumn(
        "tile_id", point_tile(F.col(x_col), F.col(y_col), res)
    )
    win = F.window(F.col(ts_col), window, slide or window)
    return tiled.groupBy(win.alias("window"), "tile_id").agg(
        F.count(F.lit(1)).alias("n")
    )


def stream_sessionize(
    events: DataFrame,
    key_col: str = "route_id",
    ts_col: str = "warc_ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per key with a fixed inactivity gap —
    ``F.session_window`` handles the stateful merge (the streaming
    equivalent of dissolve's end==next-beg chaining, with time as the
    measure axis). Output: (session_window, key, n_events).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
