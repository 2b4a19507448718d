"""Structured Streaming operators: continuous page-event ingestion.

The reference is purely batch (SURVEY §2.10), and the north rule's
resumability is a batch-checkpoint concern — but a live crawl feed is the
natural streaming extension of the pages pipeline, so the engine provides
the streaming equivalents of its hot aggregations:

- :func:`stream_tile_counts` — watermarked sliding-window page counts per
  tile (the raster rollup, continuously);
- :func:`stream_sessionize` — per-route session windows over event gaps
  (the streaming analogue of dissolve's sessionization);
- :func:`stream_union_intervals` — a CUSTOM stateful operator
  (``applyInPandasWithState``): per-route incremental coverage UNION of
  measure intervals, maintaining the merged disjoint-span set as typed
  state and re-emitting a route's spans whenever they change. State is
  bounded by spans-per-route (merging keeps it compact: heavy overlap
  collapses to few spans). Deliberately named *union*, not *dissolve*:
  batch ``dissolve`` chains only exactly-touching events, this merges any
  overlap — see the docstring for when the two coincide.

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


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup over a crawl feed: keep ONE document per
    md5(text) — the streaming form of ``web.dedup.dedup_exact``.

    ``dropDuplicatesWithinWatermark`` bounds state by the watermark
    horizon (a duplicate arriving later than the watermark is emitted
    again — the standard bounded-state trade; batch dedup on the
    checkpointed output remains exact). State is one (hash, timestamp)
    entry per distinct text inside the horizon. Unlike batch
    ``dedup_exact`` (lowest id wins), the surviving row is the first one
    the engine PROCESSES: deterministic across micro-batches, arbitrary
    within one — callers needing canonical survivors re-canonicalize
    downstream with ``exact_dup_groups``.
    """
    hashed = docs.withColumn("_text_md5", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["_text_md5"]
    )


def stream_union_intervals(
    events: DataFrame,
    key_col: str = "route_id",
    beg_col: str = "beg",
    end_col: str = "end",
) -> DataFrame:
    """Streaming coverage union: per-key incremental UNION of [beg, end]
    measure intervals via ``applyInPandasWithState``.

    Merges touching-or-overlapping intervals (``beg <= prev_end``) — the
    coverage-union semantics. NOT the same operator as batch
    :func:`linref_spark.events.modify.dissolve`: batch dissolve chains
    only exactly-touching events (``end == next beg``) and keeps partially
    overlapping events as separate runs, a distinction that would require
    unbounded per-key state to reproduce incrementally. The two COINCIDE
    exactly when no events partially overlap (the common LRS case) —
    tests/test_streaming.py asserts both the parity on a chains-only feed
    and the documented divergence on a partial-overlap feed. Each
    micro-batch folds its rows into the key's merged-span state and emits
    the key's CURRENT spans (update output mode). ``n_events`` counts all
    events folded so far.

    Scale shape: state per key is (spans x 2 doubles + 1 long) — bounded
    and typically tiny because merging collapses overlap; the stateful
    exchange partitions by key like any streaming aggregation.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("beg", DoubleType()),
            StructField("end", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("begs", ArrayType(DoubleType())),
            StructField("ends", ArrayType(DoubleType())),
            StructField("n", LongType()),
        ]
    )

    def fold(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state.exists:
            begs, ends, n = state.get
            ivs = list(zip(begs, ends))
        else:
            ivs, n = [], 0
        for pdf in pdfs:
            n += len(pdf)
            ivs.extend(
                zip(pdf[beg_col].astype(float), pdf[end_col].astype(float))
            )
        ivs.sort()
        merged: list = []
        for b, e in ivs:
            if merged and b <= merged[-1][1]:
                if e > merged[-1][1]:
                    merged[-1] = (merged[-1][0], e)
            else:
                merged.append((b, e))
        state.update(
            ([b for b, _ in merged], [e for _, e in merged], n)
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(merged),
                "beg": [b for b, _ in merged],
                "end": [e for _, e in merged],
                "n_events": [n] * len(merged),
            }
        )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
