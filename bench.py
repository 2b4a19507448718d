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

    def q_minhash_lsh():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        materialize(DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4))

    def q_ann_topk():
        materialize(E.q_ann_topk(spark, SF_DIR))

    def q_pages_pipeline():
        pages = generate_pages(spark, PAGES_ROWS, n_partitions=CPUS * 4)
        extracted = with_extracted_text(pages)
        geo = geocode_pages(extracted)
        agg = geo.groupBy("route_id").agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("extracted_text")).alias("bytes"),
        )
        materialize(agg)

    return {
        "count_overlaps_equi": q_count_overlaps_equi,
        "count_overlaps_binned": q_count_overlaps_binned,
        "overlay_sum_binned": q_overlay_sum_binned,
        "pts_on_seg_binned": q_pts_on_seg,
        "dissolve": q_dissolve,
        "resegment": q_resegment,
        "distribute": q_distribute,
        "minhash_lsh": q_minhash_lsh,
        "ann_topk": q_ann_topk,
        "pages_pipeline": q_pages_pipeline,
    }


def main():
    spark = get_spark("linref-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench_queries(spark)
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
