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


def pages_staged_workload(spark, rows: int, partitions: int, routes):
    """The pages pipeline decomposed into its three legs, each timed over
    a materialized (localCheckpoint) input so stage costs do not bleed
    into each other: extract (synthesize -> html->text -> geocode),
    snap (broadcast kNN nearest-route assignment), rollup (tile agg).
    Attributes the composite pipeline's scaling behavior per-stage."""
    t0 = time.time()
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
    ).localCheckpoint()
    n_docs = pts.count()
    t1 = time.time()
    snapped = project_points_broadcast(
        routes, pts, RLRS, buffer=5.0, res=8
    ).localCheckpoint()
    snapped.count()
    t2 = time.time()
    agg = tile_aggregate(with_point_tile(snapped, "x", "y", res=8))
    int(agg.agg(F.sum("n")).first()[0])
    t3 = time.time()
    return (t1 - t0, t2 - t1, t3 - t2, n_docs)


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
    """Pair production + overlay weights + global checksum. Per-key
    aggregation correctness is gated by the DuckDB oracles; a keyed
    aggregate here would measure single-host hash-map DRAM latency, not
    the join (see BENCH/BASELINE.md)."""
    a = make_intervals(spark, rows, 1, partitions)
    b = make_intervals(spark, rows, 7, partitions)
    pairs = overlay_pairs(
        a, b, ILRS, ILRS, strategy=JoinStrategy("binned", bin_size=20.0)
    )
    r = pairs.agg(F.count(F.lit(1)), F.sum("weight")).first()
    return int(r[0])


def calib_workload(spark, rows: int, partitions: int) -> int:
    """Pure whole-stage-codegen compute (xxhash over a range): the Spark
    compute-scaling ceiling on this host."""
    return int(
        spark.range(0, rows, 1, partitions)
        .select(F.shiftright(F.xxhash64("id"), 33).alias("h"))
        .agg(F.sum("h"))
        .first()[0] % 1000000
    )


def snap_workload(spark, rows: int, partitions: int, routes) -> int:
    pts = spark.range(0, rows, 1, partitions).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.xxhash64("id"), 10000) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 100000) / 100.0).alias("y"),
    )
    s = project_points_broadcast(routes, pts, RLRS, buffer=3.0, res=7)
    return s.count()


def host_cpu_rate(procs: int, seconds: float = 2.0) -> float:
    """Independent host-CPU control: aggregate ops/sec of `procs` python
    busy-loop processes (no JVM, no Spark). Measures how much CPU the
    (virtualized) host is actually granting in this time window."""
    import multiprocessing as mp

    def burn(q):
        import time as _t
        x, n, t0 = 0, 0, _t.time()
        while _t.time() - t0 < seconds:
            for _ in range(100000):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            n += 100000
        q.put(n)

    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(procs)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total / seconds


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
    ap.add_argument("--pages", type=int, default=3_000_000)
    ap.add_argument("--join-rows", type=int, default=6_000_000)
    ap.add_argument("--calib-rows", type=int, default=20_000_000_000)
    ap.add_argument("--snap-points", type=int, default=4_000_000)
    args = ap.parse_args()

    import os as _os
    _os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.appName(f"scaling-{args.cpus}")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 8))
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    routes = make_routes(spark, 200).cache()
    routes.count()

    parts = args.cpus * 4
    # warm JVM/Arrow/python-worker paths
    pages_workload(spark, 5000, parts, routes)
    join_workload(spark, 50_000, parts)
    snap_workload(spark, 50_000, parts, routes)

    calib_workload(spark, 1_000_000, parts)
    t_calib, _ = best_of(lambda: calib_workload(spark, args.calib_rows, parts))
    t_pages, n_docs = best_of(lambda: pages_workload(spark, args.pages, parts, routes))
    t_join, n_join = best_of(lambda: join_workload(spark, args.join_rows, parts))
    n_pairs = n_join
    t_snap, n_snap = best_of(lambda: snap_workload(spark, args.snap_points, parts, routes))

    # staged pages legs: best-of-2 per LEG (stage inputs materialized, so
    # each leg's timing is its own)
    staged = [pages_staged_workload(spark, args.pages, parts, routes)
              for _ in range(2)]
    t_ext = min(s[0] for s in staged)
    t_psnap = min(s[1] for s in staged)
    t_proll = min(s[2] for s in staged)

    host_rate = host_cpu_rate(args.cpus)
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "host_cpu_ops_per_sec": round(host_rate, 1),
                "calib_rows": args.calib_rows,
                "calib_sec": round(t_calib, 3),
                "calib_rows_per_sec": round(args.calib_rows / t_calib, 1),
                "docs": n_docs,
                "pages_sec": round(t_pages, 3),
                "docs_per_sec": round(n_docs / t_pages, 1),
                "join_rows": n_pairs,
                "join_sec": round(t_join, 3),
                "join_rows_per_sec": round(n_pairs / t_join, 1),
                "snap_points": n_snap,
                "snap_sec": round(t_snap, 3),
                "snap_points_per_sec": round(n_snap / t_snap, 1),
                "pages_extract_sec": round(t_ext, 3),
                "pages_extract_docs_per_sec": round(n_docs / t_ext, 1),
                "pages_snap_sec": round(t_psnap, 3),
                "pages_snap_docs_per_sec": round(n_docs / t_psnap, 1),
                "pages_rollup_sec": round(t_proll, 3),
                "pages_rollup_docs_per_sec": round(n_docs / t_proll, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
