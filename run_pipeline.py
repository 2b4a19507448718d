"""spark-submit entrypoint: the full Common-Crawl-style tile+join pipeline.

Launch (sandbox):
    python run_pipeline.py --rows 100000 --out /tmp/linref_pipeline
Launch (cluster, per the north rule):
    zip -r linref_spark.zip linref_spark
    spark-submit --py-files linref_spark.zip run_pipeline.py \
        --rows 1000000000 --out hdfs://.../linref_pipeline

Stages (each a resumable checkpoint with lineage + metrics — see
linref_spark/pipeline/checkpoint.py):

  pages      deterministic Common-Crawl-style synthesis (url, warc_ts,
             html, text, lang)
  extracted  html -> text extraction + byte-identity audit vs the text
             column (north-rule invariant; violations fail the run)
  events     geocode pages onto the route network: point + linear events
  routes     synthetic route network with M-enabled geometry
  snapped    tiled kNN nearest-route assignment of page points
  segments   dissolved + resegmented route segments with page counts and
             distribute-smoothed density (linref merge/agg semantics)
  tiles      raster-style tile rollup of snapped pages

Rerunning with the same args resumes from the manifest; changing --rows
invalidates stage fingerprints transitively.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from linref_spark.events.frame import add_event_id
from linref_spark.events.modify import resegment
from linref_spark.geometry.udfs import add_geom_m
from linref_spark.lrs import LRS
from linref_spark.pipeline.checkpoint import Pipeline, Stage
from linref_spark.relate import agg as AGG
from linref_spark.relate.distribute import distribute
from linref_spark.relate.join import JoinStrategy, intersect_pairs
from linref_spark.session import get_spark
from linref_spark.spatial.join import project_points_tiled
from linref_spark.spatial.tiles import tile_aggregate, with_point_tile
from linref_spark.web.pages import (
    generate_pages,
    geocode_pages,
    with_extracted_text,
)

N_ROUTES = 100
ROUTE_LEN = 100.0
RLRS = LRS(key_cols=("route_id",), beg_col="beg", end_col="end", closed="left_mod")
SEG_LRS = RLRS
PTS_LRS = LRS(key_cols=("route_id",), loc_col="loc_mp")


def build_pipeline(rows: int, out_dir: str, partitions: int) -> Pipeline:
    def s_pages(spark, _):
        return generate_pages(spark, rows, n_partitions=partitions)

    def s_extracted(spark, ins):
        df = with_extracted_text(ins["pages"])
        bad = df.where(F.col("extracted_text") != F.col("text")).count()
        if bad:
            raise RuntimeError(
                f"byte-identity invariant violated for {bad} urls"
            )
        return df.drop("html")

    def s_events(spark, ins):
        geo = geocode_pages(ins["extracted"], n_routes=N_ROUTES, route_length=ROUTE_LEN)
        return geo.select(
            "url", "route_id", "loc_mp", "beg_mp", "end_mp", "lang",
            F.length("text").alias("n_chars"),
        )

    def s_routes(spark, _):
        routes = spark.range(N_ROUTES).select(
            F.concat(
                F.lit("R"), F.lpad(F.col("id").cast("string"), 4, "0")
            ).alias("route_id"),
            F.lit(0.0).alias("beg"),
            F.lit(ROUTE_LEN).alias("end"),
            F.array(F.lit(0.0), F.lit(0.6 * ROUTE_LEN), F.lit(ROUTE_LEN)).alias(
                "geom_xs"
            ),
            F.transform(
                F.array(F.lit(0.0), F.lit(1.0), F.lit(2.0)),
                lambda v: v + F.col("id").cast("double") * 5.0,
            ).alias("geom_ys"),
        )
        return add_geom_m(add_event_id(routes, RLRS), RLRS)

    def s_snapped(spark, ins):
        pts = ins["events"].select(
            F.xxhash64("url").alias("event_id"),
            F.col("url"),
            F.col("loc_mp").alias("x"),
            (
                F.substring("route_id", 2, 4).cast("double") * 5.0
                + F.col("loc_mp") / ROUTE_LEN * 2.0
            ).alias("y"),
        )
        snapped = project_points_tiled(
            ins["routes"], pts, RLRS, buffer=5.0, res=6
        )
        # mint the dense point ids HERE (canonical (route, loc) order), so
        # the bucketed checkpoint persists them WITH the route clustering:
        # mint-then-bucket keeps the exchange elision (pipeline/bucketed.py
        # — id minting materializes through localCheckpoint, which erases
        # partitioning info, so bucket-then-mint would lose it), and the
        # downstream segments stage joins this — the BIG side at 10^12
        # pages — without re-shuffling or re-minting it.
        return add_event_id(snapped.drop("event_id"), PTS_LRS)

    def s_segments(spark, ins):
        segs = resegment(ins["routes"], RLRS, length=5.0, fill="balance").drop(
            "geom_m", "geom_xs", "geom_ys"
        )
        # read straight off the route-bucketed checkpoint: the binned join
        # keys (route_id, bin) are a superset of the bucket cols, so with
        # requireAllClusterKeysForCoPartition=false this side joins with
        # ZERO exchange (plan-asserted in tests/test_pipeline.py)
        pts = ins["snapped"].select("route_id", "loc_mp", "event_id")
        pairs = intersect_pairs(
            segs, pts, SEG_LRS, PTS_LRS,
            strategy=JoinStrategy("binned", bin_size=5.0),
        )
        out = AGG.agg_count(pairs, segs, out_col="n_pages")
        out = distribute(
            pairs, out, pts, SEG_LRS, PTS_LRS,
            decay_size=2, decay_func="linear", out_col="page_density",
        )
        return out

    def s_tiles(spark, ins):
        t = with_point_tile(ins["snapped"], "x", "y", res=6)
        return tile_aggregate(t)

    return Pipeline(
        out_dir,
        [
            Stage("pages", s_pages, version=f"rows={rows}"),
            Stage("extracted", s_extracted, inputs=("pages",)),
            Stage("events", s_events, inputs=("extracted",)),
            Stage("routes", s_routes),
            # bucketed by route: the segments stage's relate join reads
            # co-located buckets instead of re-shuffling the page points
            Stage(
                "snapped", s_snapped, inputs=("events", "routes"),
                version="2-bucketed", bucket_by=("route_id",), n_buckets=64,
            ),
            Stage("segments", s_segments, inputs=("routes", "snapped"),
                  version="2-bucketed"),
            Stage("tiles", s_tiles, inputs=("snapped",)),
        ],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/linref_pipeline")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        "linref-pipeline", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pipe = build_pipeline(args.rows, args.out, partitions=args.cpus * 4)
    outputs = pipe.run(spark, force=args.force)
    summary = {
        name: {
            k: v
            for k, v in entry.items()
            if k in ("rows", "wall_sec", "partitions", "skew_ratio", "bytes")
        }
        for name, entry in pipe.metrics().items()
    }
    print(json.dumps({"pipeline": summary}, indent=2))
    n = outputs["tiles"].agg(F.sum("n")).first()[0]
    print(f"total pages through tiles: {n}")


if __name__ == "__main__":
    main()
