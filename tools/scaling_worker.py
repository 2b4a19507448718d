"""Single-parallelism worker for the scaling benchmark.

Runs three headline throughput workloads at one parallelism level and
prints a JSON line (best-of-2 timings after a warmup):

- pages pipeline (docs/sec): synthesize -> extract (byte-audited) ->
  geocode -> broadcast-tiled kNN snap -> tile rollup. Snap uses the
  north-star scale path (dissolved route geometry broadcast to
  executors), so the job is map-dominant.
- interval join (join-rows/sec): route-equi + binned measure-axis overlay
  join + weighted aggregation over synthesized interval tables.
- snap kernel (points/sec): the vectorized numpy snap UDF over python
  workers (the engine's Python-side hot path).

Invoked in a fresh process per parallelism level (one JVM per master).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from linref_spark.events.frame import add_event_id  # noqa: E402
from linref_spark.geometry.udfs import add_geom_m  # noqa: E402
from linref_spark.lrs import LRS  # noqa: E402
from linref_spark.relate import agg as AGG  # noqa: E402
from linref_spark.relate.join import JoinStrategy, overlay_pairs  # noqa: E402
from linref_spark.session import get_spark  # noqa: E402
from linref_spark.spatial.join import project_points_broadcast  # noqa: E402
from linref_spark.spatial.tiles import tile_aggregate, with_point_tile  # noqa: E402
from linref_spark.web.pages import (  # noqa: E402
    generate_pages,
    geocode_pages,
    with_extracted_text,
)

RLRS = LRS(key_cols=("route_id",), beg_col="beg", end_col="end", closed="left_mod")
ILRS = LRS(key_cols=("route",), beg_col="beg", end_col="end")


def make_routes(spark, n_routes: int):
    routes = spark.range(n_routes).select(
        F.concat(F.lit("R"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "route_id"
        ),
        F.lit(0.0).alias("beg"),
        F.lit(100.0).alias("end"),
        F.array(F.lit(0.0), F.lit(60.0), F.lit(100.0)).alias("geom_xs"),
        F.transform(
            F.array(F.lit(0.0), F.lit(1.0), F.lit(2.0)),
            lambda v: v + F.col("id").cast("double") * 5.0,
        ).alias("geom_ys"),
    )
    return add_geom_m(add_event_id(routes, RLRS), RLRS)


def pages_workload(spark, rows: int, partitions: int, routes) -> int:
    pages = with_extracted_text(generate_pages(spark, rows, n_partitions=partitions))
    geo = geocode_pages(pages, n_routes=200, route_length=100.0)
    pts = geo.select(
        F.xxhash64("url").alias("event_id"),
        F.col("loc_mp").alias("x"),
        (
            F.substring("route_id", 2, 4).cast("double") * 5.0
            + F.col("loc_mp") / 100.0 * 2.0
        ).alias("y"),
        (F.col("extracted_text") == F.col("text")).alias("_audit"),
    )
    snapped = project_points_broadcast(routes, pts, RLRS, buffer=5.0, res=8)
    agg = tile_aggregate(with_point_tile(snapped, "x", "y", res=8))
    return int(agg.agg(F.sum("n")).first()[0])


def make_intervals(spark, n: int, seed: int, partitions: int):
    beg = F.pmod(F.xxhash64("id", F.lit(seed)), 100000) / 100.0
    return spark.range(0, n, 1, partitions).select(
        (F.col("id") % 2000).alias("route"),
        beg.alias("beg"),
        (beg + 5.0 + F.pmod(F.xxhash64("id", F.lit(seed + 1)), 200) / 10.0).alias(
            "end"
        ),
        F.xxhash64("id", F.lit(seed + 2)).alias("event_id"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), 1000) / 10.0).alias("val"),
    )


def join_workload(spark, rows: int, partitions: int) -> int:
    a = make_intervals(spark, rows, 1, partitions)
    b = make_intervals(spark, rows, 7, partitions)
    pairs = overlay_pairs(
        a, b, ILRS, ILRS, strategy=JoinStrategy("binned", bin_size=20.0)
    )
    out = AGG.agg_sum(pairs, a, b, "val", out_col="s")
    n = out.agg(F.count(F.lit(1)), F.sum("s")).first()[0]
    return int(n)


def snap_workload(spark, rows: int, partitions: int, routes) -> int:
    pts = spark.range(0, rows, 1, partitions).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.xxhash64("id"), 10000) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 100000) / 100.0).alias("y"),
    )
    s = project_points_broadcast(routes, pts, RLRS, buffer=3.0, res=7)
    return s.count()


def best_of(fn, n: int = 2) -> tuple[float, int]:
    times, result = [], None
    for _ in range(n):
        t0 = time.time()
        result = fn()
        times.append(time.time() - t0)
    return min(times), result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--pages", type=int, default=6_000_000)
    ap.add_argument("--join-rows", type=int, default=4_000_000)
    ap.add_argument("--snap-points", type=int, default=8_000_000)
    args = ap.parse_args()

    spark = get_spark(
        f"scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=256,
    )
    spark.sparkContext.setLogLevel("ERROR")
    routes = make_routes(spark, 200).cache()
    routes.count()

    parts = args.cpus * 4
    # warm JVM/Arrow/python-worker paths
    pages_workload(spark, 5000, parts, routes)
    join_workload(spark, 50_000, parts)
    snap_workload(spark, 50_000, parts, routes)

    t_pages, n_docs = best_of(lambda: pages_workload(spark, args.pages, parts, routes))
    t_join, n_join = best_of(lambda: join_workload(spark, args.join_rows, parts))
    # join throughput counts produced pair rows
    from linref_spark.relate.join import overlay_pairs as _op  # count pairs once
    n_pairs = _op(
        make_intervals(spark, args.join_rows, 1, parts),
        make_intervals(spark, args.join_rows, 7, parts),
        ILRS, ILRS, strategy=JoinStrategy("binned", bin_size=20.0),
    ).count()
    t_snap, n_snap = best_of(lambda: snap_workload(spark, args.snap_points, parts, routes))

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "docs": n_docs,
                "pages_sec": round(t_pages, 3),
                "docs_per_sec": round(n_docs / t_pages, 1),
                "join_rows": n_pairs,
                "join_sec": round(t_join, 3),
                "join_rows_per_sec": round(n_pairs / t_join, 1),
                "snap_points": n_snap,
                "snap_sec": round(t_snap, 3),
                "snap_points_per_sec": round(n_snap / t_snap, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
