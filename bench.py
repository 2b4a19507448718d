"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Forces full materialization via the noop sink (no collect-to-driver bias).
The binned variants exercise the measure-axis bin join — the 100 TB scale
path — against the same inputs as the equi variants.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from linref_spark.relate import agg as AGG  # noqa: E402
from linref_spark.relate.join import JoinStrategy, intersect_pairs, overlay_pairs  # noqa: E402
from linref_spark.session import get_spark  # noqa: E402
from linref_spark.web import dedup as DD  # noqa: E402
from linref_spark.web.pages import generate_pages, geocode_pages, with_extracted_text  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("SPARK_GRAFT_PAGES", "200000"))
BINNED = JoinStrategy("binned", bin_size=25.0)


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark):
    seg1 = E._seg(spark, SF_DIR, 1).localCheckpoint()
    seg2 = E._seg(spark, SF_DIR, 2).localCheckpoint()
    pts = E._pts(spark, SF_DIR).localCheckpoint()

    def q_count_overlaps_equi():
        pairs = intersect_pairs(seg1, seg2, E.SEG_LRS, E.SEG_LRS)
        materialize(AGG.agg_count(pairs, seg1, out_col="n"))

    def q_count_overlaps_binned():
        pairs = intersect_pairs(seg1, seg2, E.SEG_LRS, E.SEG_LRS, strategy=BINNED)
        materialize(AGG.agg_count(pairs, seg1, out_col="n"))

    def q_overlay_sum_binned():
        pairs = overlay_pairs(seg1, seg2, E.SEG_LRS, E.SEG_LRS, strategy=BINNED)
        materialize(AGG.agg_sum(pairs, seg1, seg2, "val", out_col="s"))

    def q_pts_on_seg():
        pairs = intersect_pairs(seg1, pts, E.SEG_LRS, E.PTS_LRS, strategy=BINNED)
        materialize(AGG.agg_count(pairs, seg1, out_col="n"))

    def q_dissolve():
        materialize(E.q_seg_dissolve(spark, SF_DIR))

    def q_resegment():
        materialize(E.q_seg_resegment(spark, SF_DIR))

    def q_distribute():
        materialize(E.q_seg_distribute(spark, SF_DIR))

    def q_seg_split():
        materialize(E.q_seg_split(spark, SF_DIR))

    def q_minhash_lsh():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        materialize(DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4))

    def q_ann_topk():
        materialize(E.q_ann_topk(spark, SF_DIR))

    def q_lsh_topk():
        from linref_spark.web import ann as ANN

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        dim = len(emb.select("embedding").first()[0])
        queries = emb.where(F.col("vec_id") % 500 == 0)
        materialize(
            ANN.lsh_topk(emb, queries, dim=dim, k=5, n_planes=16, bands=4)
        )

    def q_pages_pipeline():
        from linref_spark.events.frame import add_event_id
        from linref_spark.geometry.udfs import add_geom_m
        from linref_spark.lrs import LRS
        from linref_spark.spatial.join import project_points_broadcast
        from linref_spark.spatial.tiles import tile_aggregate, with_point_tile

        pages = generate_pages(spark, PAGES_ROWS, n_partitions=CPUS * 4)
        extracted = with_extracted_text(pages)
        geo = geocode_pages(extracted, n_routes=100, route_length=100.0)
        rlrs = LRS(key_cols=("route_id",), beg_col="beg", end_col="end")
        routes = spark.range(100).select(
            F.concat(F.lit("R"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("route_id"),
            F.lit(0.0).alias("beg"), F.lit(100.0).alias("end"),
            F.array(F.lit(0.0), F.lit(60.0), F.lit(100.0)).alias("geom_xs"),
            F.transform(
                F.array(F.lit(0.0), F.lit(1.0), F.lit(2.0)),
                lambda v: v + F.col("id").cast("double") * 5.0,
            ).alias("geom_ys"),
        )
        routes = add_geom_m(add_event_id(routes, rlrs), rlrs)
        pts = geo.select(
            F.xxhash64("url").alias("event_id"),
            F.col("loc_mp").alias("x"),
            (
                F.substring("route_id", 2, 4).cast("double") * 5.0
                + F.col("loc_mp") / 100.0 * 2.0
            ).alias("y"),
            (F.col("extracted_text") == F.col("text")).alias("_audit"),
        )
        snapped = project_points_broadcast(routes, pts, rlrs, buffer=5.0, res=8)
        materialize(tile_aggregate(with_point_tile(snapped, "x", "y", res=8)))

    return {
        "count_overlaps_equi": q_count_overlaps_equi,
        "count_overlaps_binned": q_count_overlaps_binned,
        "overlay_sum_binned": q_overlay_sum_binned,
        "pts_on_seg_binned": q_pts_on_seg,
        "dissolve": q_dissolve,
        "resegment": q_resegment,
        "distribute": q_distribute,
        "seg_split": q_seg_split,
        "minhash_lsh": q_minhash_lsh,
        "ann_topk": q_ann_topk,
        "lsh_topk": q_lsh_topk,
        "pages_pipeline": q_pages_pipeline,
    }


def main():
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    spark = get_spark("linref-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench_queries(spark)
    # warm the JVM, Arrow, and python-worker paths so per-query timings
    # measure the operators, not first-call initialization
    warm = generate_pages(spark, 2000, n_partitions=CPUS)
    materialize(with_extracted_text(warm))
    seg_w = E._seg(spark, SF_DIR, 1).limit(1000)
    materialize(AGG.agg_count(
        intersect_pairs(seg_w, seg_w, E.SEG_LRS, E.SEG_LRS, strategy=BINNED),
        seg_w, out_col="n"))
    times = {}
    for name, fn in queries.items():
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)
    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "linref_spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "pages_rows": PAGES_ROWS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
