"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship linear-referencing pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (+ the web-scale text/dedup/ANN operators); ``oracle_sql()``
provides the DuckDB-equivalent SQL for every SQL-expressible query.

Event tables are derived deterministically from the driver's TPC-H-ish
parquet with expressions both engines evaluate identically (integer modulo,
double casts) so the oracle comparison is exact. Aggregated doubles are
rounded to 4 decimals on BOTH sides to absorb summation-order ULP noise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linref_spark.lrs import LRS  # noqa: E402
from linref_spark.events.frame import add_event_id  # noqa: E402
from linref_spark.events import analyze as AN  # noqa: E402
from linref_spark.events import modify as MOD  # noqa: E402
from linref_spark.events.constrain import constrain_to  # noqa: E402
from linref_spark.events.frame import next_overlapping  # noqa: E402
from linref_spark.events.integrate import integrate  # noqa: E402
from linref_spark.events import modify as MOD2  # noqa: E402
from linref_spark.spatial.tiles import point_tile  # noqa: E402
from linref_spark.relate import agg as AGG  # noqa: E402
from linref_spark.relate.distribute import distribute  # noqa: E402
from linref_spark.relate.join import intersect_pairs, overlay_pairs  # noqa: E402
from linref_spark.spatial.cluster import cluster  # noqa: E402
from linref_spark.web import ann as ANN  # noqa: E402
from linref_spark.web import dedup as DD  # noqa: E402
from linref_spark.web import textstats as TS  # noqa: E402


# ---------------------------------------------------------------------------
# shared deterministic derivations (Spark side; SQL mirrors below)
# ---------------------------------------------------------------------------

SEG_LRS = LRS(key_cols=("route",), beg_col="beg", end_col="end", closed="right")
PTS_LRS = LRS(key_cols=("route",), loc_col="loc")


def _seg(spark: SparkSession, sf_dir: str, linenumber: int = 1) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_linenumber") == linenumber
    )
    df = li.select(
        (F.col("l_suppkey") % 100).alias("route"),
        (F.col("l_orderkey") % 1000).cast("double").alias("beg"),
        ((F.col("l_orderkey") % 1000).cast("double") + F.col("l_quantity")).alias(
            "end"
        ),
        F.col("l_extendedprice").alias("val"),
        F.col("l_quantity").alias("qty"),
    )
    return add_event_id(df, order_by=["route", "beg", "end", "val"])


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = o.select(
        (F.col("o_custkey") % 100).alias("route"),
        ((F.col("o_orderkey") % 1000).cast("double") + 0.5).alias("loc"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("pval"),
    )
    return add_event_id(df, order_by=["route", "loc", "pval", "status"])


_SEG_SQL = """
seg AS (
  SELECT l_suppkey % 100 AS route,
         CAST(l_orderkey % 1000 AS DOUBLE) AS beg,
         CAST(l_orderkey % 1000 AS DOUBLE) + l_quantity AS "end",
         l_extendedprice AS val,
         l_quantity AS qty
  FROM lineitem WHERE l_linenumber = 1
)"""

_SEG2_SQL = """
seg2 AS (
  SELECT l_suppkey % 100 AS route,
         CAST(l_orderkey % 1000 AS DOUBLE) AS beg,
         CAST(l_orderkey % 1000 AS DOUBLE) + l_quantity AS "end",
         l_extendedprice AS val,
         l_quantity AS qty
  FROM lineitem WHERE l_linenumber = 2
)"""

_PTS_SQL = """
pts AS (
  SELECT o_custkey % 100 AS route,
         CAST(o_orderkey % 1000 AS DOUBLE) + 0.5 AS loc,
         o_orderstatus AS status,
         o_totalprice AS pval
  FROM orders
)"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_seg_count_overlaps(spark, sf_dir):
    left = _seg(spark, sf_dir, 1)
    right = _seg(spark, sf_dir, 2)
    pairs = intersect_pairs(left, right, SEG_LRS, SEG_LRS)
    out = AGG.agg_count(pairs, left, axis=1, out_col="n_overlaps")
    return out.select(
        "route", "beg", "end", F.col("n_overlaps").cast("long").alias("n_overlaps")
    )


def q_seg_overlay_sum(spark, sf_dir):
    left = _seg(spark, sf_dir, 1)
    right = _seg(spark, sf_dir, 2)
    pairs = overlay_pairs(left, right, SEG_LRS, SEG_LRS, normalize=False)
    out = AGG.agg_sum(pairs, left, right, "qty", axis=1, out_col="wsum")
    return out.select("route", "beg", "end", F.col("wsum").cast("double").alias("wsum"))


def q_seg_overlay_mean(spark, sf_dir):
    left = _seg(spark, sf_dir, 1)
    right = _seg(spark, sf_dir, 2)
    pairs = overlay_pairs(left, right, SEG_LRS, SEG_LRS, normalize=False)
    out = AGG.agg_mean(pairs, left, right, "qty", axis=1, out_col="wmean")
    return out.select("route", "beg", "end", F.col("wmean").cast("double").alias("wmean"))


def q_pts_on_seg_count(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    pairs = intersect_pairs(seg, pts, SEG_LRS, PTS_LRS)
    out = AGG.agg_count(pairs, seg, axis=1, out_col="n_points")
    return out.select(
        "route", "beg", "end", F.col("n_points").cast("long").alias("n_points")
    )


def q_seg_dissolve(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    out = MOD.dissolve(seg, SEG_LRS)
    return out.select(
        "route", "beg", "end", F.col("n_events").cast("long").alias("n_events")
    )


def q_seg_resegment(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    out = MOD.resegment(seg, SEG_LRS, length=7.0, fill="cut")
    return out.select("route", "beg", "end", "val")


def q_seg_find_inside(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    out = AN.find_inside(seg, SEG_LRS, enforce_edges=False, out_col="inside")
    return out.select("route", "beg", "end", "inside")


def q_seg_find_same(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    out = AN.find_same(seg, SEG_LRS, keep="first", out_col="same")
    return out.select("route", "beg", "end", "same")


def q_seg_mode_status(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    pairs = intersect_pairs(seg, pts, SEG_LRS, PTS_LRS)
    out = AGG.agg_mode(pairs, seg, pts, "status", axis=1, out_col="mode_status")
    return out.select("route", "beg", "end", "mode_status")


def q_seg_first_last(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    pairs = intersect_pairs(seg, pts, SEG_LRS, PTS_LRS)
    out = AGG.agg_first(pairs, seg, pts, "pval", axis=1, out_col="first_pval")
    out = AGG.agg_last(pairs, out, pts, "pval", axis=1, out_col="last_pval")
    return out.select("route", "beg", "end", "first_pval", "last_pval")


def q_seg_value_counts(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    pairs = intersect_pairs(seg, pts, SEG_LRS, PTS_LRS)
    vals = pts.select(F.col("event_id").alias("_sid"), F.col("status"))
    joined = pairs.join(vals, on=F.col("right_id") == F.col("_sid"))
    counts = joined.groupBy("left_id").agg(
        F.count(F.when(F.col("status") == "O", 1)).alias("n_O"),
        F.count(F.when(F.col("status") == "F", 1)).alias("n_F"),
        F.count(F.when(F.col("status") == "P", 1)).alias("n_P"),
    )
    out = seg.join(counts, on=F.col("event_id") == F.col("left_id"), how="left")
    return out.select(
        "route", "beg", "end",
        F.coalesce("n_O", F.lit(0)).cast("long").alias("n_O"),
        F.coalesce("n_F", F.lit(0)).cast("long").alias("n_F"),
        F.coalesce("n_P", F.lit(0)).cast("long").alias("n_P"),
    )


def q_seg_integrate(spark, sf_dir):
    a = _seg(spark, sf_dir, 1)
    b = _seg(spark, sf_dir, 2)
    out = integrate([(a, SEG_LRS), (b, SEG_LRS)], fill_gaps=False)
    return out.select(
        "route", "beg", "end",
        (F.col("index_0") >= 0).alias("in_a"),
        (F.col("index_1") >= 0).alias("in_b"),
    )


def q_seg_distribute(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    pairs = intersect_pairs(seg, pts, SEG_LRS, PTS_LRS)
    out = distribute(
        pairs, seg, pts, SEG_LRS, PTS_LRS, value_col=None,
        decay_size=2, decay_func="linear",
    )
    return out.select("route", "beg", "end", F.round("distributed", 4).alias("score"))


def q_pts_cluster(spark, sf_dir):
    # rows-only check (iterative connected components)
    pts = _pts(spark, sf_dir)
    sample = pts.where(F.col("route") < 10)
    out = cluster(sample, PTS_LRS, max_gap=1.0)
    return out.select("route", "loc", F.col("cluster").cast("long").alias("cluster"))


def q_docs_dedup_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = DD.exact_dup_groups(docs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text_hash",
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_docs_stats(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = TS.with_token_stats(docs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_token_len", 4).alias("avg_token_len"),
    )


def q_docs_langid(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = TS.with_lang_id(docs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("hits_en").cast("long").alias("hits_en"),
        F.col("hits_es").cast("long").alias("hits_es"),
        "lang_pred",
    )


def q_docs_fingerprint(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = TS.with_fingerprint(docs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "fingerprint"
    )


def q_docs_minhash_lsh(spark, sf_dir):
    # rows-only check (xxhash64-based banding has no DuckDB equivalent)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4)
    return pairs.select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    )


def q_ann_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 500 == 0)
    out = ANN.cosine_topk(emb, queries, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_docs_simhash(spark, sf_dir):
    # rows-only check (xxhash64 bit votes have no DuckDB equivalent)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = DD.simhash(docs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("simhash").cast("long").alias("simhash"),
    )


def q_ann_ivf_topk(spark, sf_dir):
    # rows-only check (k-means quantizer training is not SQL-expressible);
    # pytest gates recall@10 >= 0.9 vs brute force on a clustered corpus
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.where(F.col("vec_id") % 500 == 0)
    out = ANN.ivf_topk(
        emb, queries, dim=dim, k=5, n_centroids=32, n_probe=8, seed=42
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_events_sessionize(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("_new", new_sess)
    out = sess.groupBy("user_id").agg(
        F.sum("_new").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return out.select(F.col("user_id").cast("long").alias("user_id"), "n_sessions", "n_events")


def q_seg_separate(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    out = MOD.separate(seg, SEG_LRS, anchor="centers", method="balanced")
    return out.select("route", "beg", "end")


def q_seg_constrain(spark, sf_dir):
    a = _seg(spark, sf_dir, 1)
    b = _seg(spark, sf_dir, 2)
    out = constrain_to(a, b, SEG_LRS, SEG_LRS, dissolve=True)
    return out.select(
        "route", "beg", "end",
        F.col("constrained_index").cast("long").alias("constrained_index"),
    )


def q_seg_consecutive_strings(spark, sf_dir):
    """Global run ids of chained events — exercises the distributed
    prefix-sum (dense ids -> join-on-id-1 flags -> bucketed cumsum)."""
    from linref_spark.events.frame import consecutive_strings

    seg = _seg(spark, sf_dir, 1)
    out = consecutive_strings(seg, SEG_LRS, out_col="string_id")
    return out.select(
        "route", "beg", "end", F.col("string_id").cast("long").alias("string_id")
    )


def q_seg_next_overlapping(spark, sf_dir):
    seg = _seg(spark, sf_dir, 1)
    out = next_overlapping(seg, SEG_LRS, enforce_edges=False, out_col="nov")
    return out.select("route", "beg", "end", "nov")


def q_point_tiles(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    out = pts.withColumn(
        "tile_id", point_tile(F.col("loc"), F.pmod(F.col("pval"), F.lit(500.0)), 6)
    )
    return out.select("route", "loc", "tile_id")


def q_seg_profile_sum(spark, sf_dir):
    # triangular-profile overlay sum, scaled by right-length^2 so every
    # term is integer-exact (cross-engine float-safe)
    left = _seg(spark, sf_dir, 1)
    right = _seg(spark, sf_dir, 2)
    pairs = overlay_pairs(
        left, right, SEG_LRS, SEG_LRS, normalize=True, norm_by="right",
        profile="triangular",
    )
    rlen2 = right.select(
        F.col("event_id").alias("_rid"),
        ((F.col("end") - F.col("beg")) * (F.col("end") - F.col("beg"))).alias("_l2"),
        F.col("qty").alias("_q"),
    )
    scaled = pairs.join(rlen2, on=F.col("right_id") == F.col("_rid")).select(
        "left_id",
        F.round(F.col("weight") * F.col("_l2") * F.col("_q")).alias("_term"),
    )
    agg = scaled.groupBy("left_id").agg(F.sum("_term").alias("psum"))
    out = left.join(agg, on=F.col("event_id") == F.col("left_id"), how="left")
    return out.select(
        "route", "beg", "end",
        F.coalesce(F.col("psum"), F.lit(0.0)).cast("double").alias("psum"),
    )


def q_docs_ngram_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.5)
    return pairs.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


def q_seg_split(spark, sf_dir):
    """split_at_locs — the interval-algebra core of the composed split
    accessor (linref/ext/base.py:2091-2213): segments split at point locs."""
    from linref_spark.events.constrain import split_at_locs

    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    out = split_at_locs(seg, pts, SEG_LRS, PTS_LRS, inverse_col="split_index")
    return out.select(
        "route", "beg", "end",
        F.col("split_index").cast("long").alias("split_index"),
    )


def q_spatial_snap(spark, sf_dir):
    """kNN nearest-route snapping with an exact SQL oracle: single-segment
    routes derived from nation, points from customer — the point-to-segment
    projection has a closed form both engines evaluate identically."""
    from linref_spark.geometry.udfs import add_geom_m
    from linref_spark.spatial.join import project_points_tiled

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ax = (F.col("n_nationkey") * 7 % 50).cast("double")
    ay = (F.col("n_nationkey") * 13 % 50).cast("double")
    seg_len = F.sqrt(F.lit(20.0 * 20.0 + 5.0 * 5.0))
    routes = n.select(
        F.col("n_nationkey").cast("long").alias("rid"),
        F.lit(0.0).alias("beg"),
        seg_len.alias("end"),
        F.array(ax, ax + 20.0).alias("geom_xs"),
        F.array(ay, ay + 5.0).alias("geom_ys"),
    )
    rlrs = LRS(key_cols=("rid",), beg_col="beg", end_col="end")
    routes = add_geom_m(add_event_id(routes, rlrs), rlrs)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = c.select(
        F.col("c_custkey").cast("long").alias("event_id"),
        (F.col("c_custkey") % 70).cast("double").alias("x"),
        (F.col("c_custkey") % 60).cast("double").alias("y"),
    )
    out = project_points_tiled(routes, pts, rlrs, buffer=8.0, res=4)
    return out.select(
        F.col("event_id").alias("cust"),
        F.col("rid").cast("long").alias("rid"),
        F.round("snap_dist", 6).alias("snap_dist"),
        F.round("loc_mp", 6).alias("loc_mp"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: HIN-style pipeline — derive segments + point events,
    dissolve, resegment, relate points, distribute scores (sf0.001)."""
    sf_dir = "/root/testdata/sf0.001"
    seg = _seg(spark, sf_dir, 1)
    pts = _pts(spark, sf_dir)
    dissolved = MOD.dissolve(seg, SEG_LRS)
    reseg = MOD.resegment(dissolved, SEG_LRS, length=5.0, fill="balance")
    pairs = intersect_pairs(reseg, pts, SEG_LRS, PTS_LRS)
    out = distribute(
        pairs, reseg, pts, SEG_LRS, PTS_LRS, value_col=None,
        decay_size=2, decay_func="linear",
    )
    return out.select(
        "route", "beg", "end", F.round("distributed", 6).alias("score")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "seg_count_overlaps": q_seg_count_overlaps,
        "seg_overlay_sum": q_seg_overlay_sum,
        "seg_overlay_mean": q_seg_overlay_mean,
        "pts_on_seg_count": q_pts_on_seg_count,
        "seg_dissolve": q_seg_dissolve,
        "seg_resegment": q_seg_resegment,
        "seg_find_inside": q_seg_find_inside,
        "seg_find_same": q_seg_find_same,
        "seg_mode_status": q_seg_mode_status,
        "seg_first_last": q_seg_first_last,
        "seg_value_counts": q_seg_value_counts,
        "seg_integrate": q_seg_integrate,
        "seg_separate": q_seg_separate,
        "seg_constrain": q_seg_constrain,
        "seg_next_overlapping": q_seg_next_overlapping,
        "seg_consecutive_strings": q_seg_consecutive_strings,
        "seg_profile_sum": q_seg_profile_sum,
        "seg_split": q_seg_split,
        "point_tiles": q_point_tiles,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "spatial_snap": q_spatial_snap,
        "seg_distribute": q_seg_distribute,
        "pts_cluster": q_pts_cluster,
        "docs_dedup_exact": q_docs_dedup_exact,
        "docs_stats": q_docs_stats,
        "docs_langid": q_docs_langid,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_minhash_lsh": q_docs_minhash_lsh,
        "docs_simhash": q_docs_simhash,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "events_sessionize": q_events_sessionize,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; same parquet views)
# ---------------------------------------------------------------------------


def _langid_sql() -> str:
    """Mirror of TS.with_lang_id for DuckDB (same stopword arithmetic)."""
    hit_exprs = {}
    for lang, words in TS.LANG_STOPWORDS.items():
        parts = []
        for w in words:
            needle = f" {w} "
            parts.append(
                f"CAST((length(padded) - length(replace(padded, '{needle}', '')))"
                f" / {len(needle)} AS BIGINT)"
            )
        hit_exprs[lang] = " + ".join(parts)
    langs = sorted(TS.LANG_STOPWORDS)
    hmax = "greatest(" + ", ".join(f"h_{x}" for x in langs) + ")"
    pred = f"CASE WHEN {hmax} = 0 THEN 'und' "
    for x in langs:
        pred += f"WHEN h_{x} = {hmax} THEN '{x}' "
    pred += "END"
    return f"""
WITH p AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS padded FROM documents
), h AS (
  SELECT doc_id,
         {hit_exprs['en']} AS h_en,
         {hit_exprs['es']} AS h_es,
         {hit_exprs['fr']} AS h_fr,
         {hit_exprs['de']} AS h_de
  FROM p
)
SELECT doc_id, h_en AS hits_en, h_es AS hits_es, {pred} AS lang_pred FROM h
"""


def oracle_sql() -> dict[str, str]:
    overlay_w = (
        'greatest(least(l."end" - r.beg, r."end" - l.beg, '
        'least(l."end" - l.beg, r."end" - r.beg)), 0)'
    )
    return {
        "seg_count_overlaps": f"""
WITH {_SEG_SQL}, {_SEG2_SQL}
SELECT l.route, l.beg, l."end",
       (SELECT count(*) FROM seg2 r
        WHERE r.route = l.route AND l."end" > r.beg AND l.beg < r."end") AS n_overlaps
FROM seg l
""",
        "seg_overlay_sum": f"""
WITH {_SEG_SQL}, {_SEG2_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) AS rid FROM seg
),
j AS (
  SELECT l.rid, l.route, l.beg, l."end",
         coalesce(sum(({overlay_w}) * r.qty), 0.0) AS wsum
  FROM segr l LEFT JOIN seg2 r
    ON r.route = l.route AND l."end" > r.beg AND l.beg < r."end"
  GROUP BY l.rid, l.route, l.beg, l."end"
)
SELECT route, beg, "end", wsum FROM j
""",
        "seg_overlay_mean": f"""
WITH {_SEG_SQL}, {_SEG2_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) AS rid FROM seg
),
j AS (
  SELECT l.rid, l.route, l.beg, l."end",
         sum(({overlay_w}) * r.qty) AS num,
         sum({overlay_w}) AS den
  FROM segr l LEFT JOIN seg2 r
    ON r.route = l.route AND l."end" > r.beg AND l.beg < r."end"
       AND ({overlay_w}) <> 0
  GROUP BY l.rid, l.route, l.beg, l."end"
)
SELECT route, beg, "end",
       CASE WHEN den IS NOT NULL AND den <> 0 THEN num / den END AS wmean
FROM j
""",
        "pts_on_seg_count": f"""
WITH {_SEG_SQL}, {_PTS_SQL}
SELECT l.route, l.beg, l."end",
       (SELECT count(*) FROM pts p
        WHERE p.route = l.route AND p.loc > l.beg AND p.loc <= l."end") AS n_points
FROM seg l
""",
        "seg_dissolve": f"""
WITH {_SEG_SQL},
s AS (
  SELECT route, beg, "end",
         CASE WHEN lag("end") OVER (PARTITION BY route ORDER BY beg, "end") = beg
              THEN 0 ELSE 1 END AS nr
  FROM seg
), r AS (
  SELECT *, sum(nr) OVER (PARTITION BY route ORDER BY beg, "end"
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM s
)
SELECT route, min(beg) AS beg, max("end") AS "end", count(*) AS n_events
FROM r GROUP BY route, run
""",
        "seg_resegment": f"""
WITH {_SEG_SQL},
n AS (
  SELECT *, greatest(CAST(ceil(("end" - beg) / 7.0) AS BIGINT), 1) AS nseg FROM seg
)
SELECT route,
       beg + i * 7.0 AS beg,
       CASE WHEN i = nseg - 1 THEN "end" ELSE beg + (i + 1) * 7.0 END AS "end",
       val
FROM n, LATERAL (SELECT unnest(generate_series(0, nseg - 1)) AS i) t
""",
        "seg_find_inside": f"""
WITH {_SEG_SQL},
c AS (
  SELECT route, beg, "end",
         max("end") OVER (PARTITION BY route ORDER BY beg ASC, ("end" - beg) DESC
                          ROWS UNBOUNDED PRECEDING) AS cmx
  FROM seg
), d AS (
  SELECT *, min(beg) OVER (PARTITION BY route, cmx) AS cmn FROM c
)
SELECT route, beg, "end", (beg > cmn AND "end" < cmx) AS inside FROM d
""",
        "seg_find_same": f"""
WITH {_SEG_SQL}
SELECT route, beg, "end",
       (row_number() OVER (PARTITION BY route, beg, "end" ORDER BY val) > 1) AS same
FROM seg
""",
        "seg_mode_status": f"""
WITH {_SEG_SQL}, {_PTS_SQL},
m AS (
  SELECT l.route, l.beg, l."end", p.status, count(*) AS score
  FROM seg l JOIN pts p
    ON p.route = l.route AND p.loc > l.beg AND p.loc <= l."end"
  GROUP BY ALL
), best AS (
  SELECT route, beg, "end", status,
         row_number() OVER (PARTITION BY route, beg, "end"
                            ORDER BY score DESC, status ASC) AS rn
  FROM m
)
SELECT s.route, s.beg, s."end", b.status AS mode_status
FROM seg s LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.route = s.route AND b.beg = s.beg AND b."end" = s."end"
""",
        "seg_first_last": f"""
WITH {_SEG_SQL}, {_PTS_SQL},
m AS (
  SELECT l.route, l.beg, l."end", p.pval,
         row_number() OVER (PARTITION BY l.route, l.beg, l."end"
                            ORDER BY p.loc ASC, p.pval ASC) AS rn_f,
         row_number() OVER (PARTITION BY l.route, l.beg, l."end"
                            ORDER BY p.loc DESC, p.pval DESC) AS rn_l
  FROM seg l JOIN pts p
    ON p.route = l.route AND p.loc > l.beg AND p.loc <= l."end"
)
SELECT s.route, s.beg, s."end", f.pval AS first_pval, la.pval AS last_pval
FROM seg s
LEFT JOIN (SELECT * FROM m WHERE rn_f = 1) f
  ON f.route = s.route AND f.beg = s.beg AND f."end" = s."end"
LEFT JOIN (SELECT * FROM m WHERE rn_l = 1) la
  ON la.route = s.route AND la.beg = s.beg AND la."end" = s."end"
""",
        "seg_value_counts": f"""
WITH {_SEG_SQL}, {_PTS_SQL}
SELECT l.route, l.beg, l."end",
       (SELECT count(*) FROM pts p WHERE p.route = l.route
          AND p.loc > l.beg AND p.loc <= l."end" AND p.status = 'O') AS n_O,
       (SELECT count(*) FROM pts p WHERE p.route = l.route
          AND p.loc > l.beg AND p.loc <= l."end" AND p.status = 'F') AS n_F,
       (SELECT count(*) FROM pts p WHERE p.route = l.route
          AND p.loc > l.beg AND p.loc <= l."end" AND p.status = 'P') AS n_P
FROM seg l
""",
        "seg_integrate": f"""
WITH {_SEG_SQL}, {_SEG2_SQL},
edges AS (
  SELECT route, beg AS e FROM seg UNION
  SELECT route, "end" FROM seg UNION
  SELECT route, beg FROM seg2 UNION
  SELECT route, "end" FROM seg2
),
iv AS (
  SELECT route, e AS beg, lead(e) OVER (PARTITION BY route ORDER BY e) AS "end"
  FROM edges
),
iv2 AS (SELECT * FROM iv WHERE "end" IS NOT NULL),
flags AS (
  SELECT i.route, i.beg, i."end",
         EXISTS (SELECT 1 FROM seg a WHERE a.route = i.route
                 AND i."end" > a.beg AND i.beg < a."end") AS in_a,
         EXISTS (SELECT 1 FROM seg2 b WHERE b.route = i.route
                 AND i."end" > b.beg AND i.beg < b."end") AS in_b
  FROM iv2 i
)
SELECT * FROM flags WHERE in_a OR in_b
""",
        "seg_constrain": f"""
WITH {_SEG_SQL}, {_SEG2_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) - 1 AS rid FROM seg
),
edges AS (
  SELECT route, beg AS e FROM seg UNION SELECT route, "end" FROM seg
  UNION SELECT route, beg FROM seg2 UNION SELECT route, "end" FROM seg2
),
iv AS (
  SELECT route, e AS beg, lead(e) OVER (PARTITION BY route ORDER BY e) AS "end"
  FROM edges
),
iv2 AS (SELECT * FROM iv WHERE "end" IS NOT NULL),
cov AS (
  SELECT i.route, i.beg, i."end", s.rid
  FROM iv2 i JOIN segr s
    ON s.route = i.route AND i."end" > s.beg AND i.beg < s."end"
  WHERE EXISTS (SELECT 1 FROM seg2 b
                WHERE b.route = i.route AND i."end" > b.beg AND i.beg < b."end")
),
runs AS (
  SELECT *, CASE WHEN lag("end") OVER (PARTITION BY route, rid ORDER BY beg) = beg
                 THEN 0 ELSE 1 END AS nr
  FROM cov
),
runs2 AS (
  SELECT *, sum(nr) OVER (PARTITION BY route, rid ORDER BY beg
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM runs
)
SELECT route, min(beg) AS beg, max("end") AS "end",
       rid AS constrained_index
FROM runs2 GROUP BY route, rid, run
""",
        "seg_split": f"""
WITH {_SEG_SQL}, {_PTS_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) - 1 AS rid FROM seg
),
edges AS (
  SELECT route, beg AS e FROM seg UNION SELECT route, "end" FROM seg
  UNION SELECT route, loc FROM pts
),
iv AS (
  SELECT route, e AS beg, lead(e) OVER (PARTITION BY route ORDER BY e) AS "end"
  FROM edges
),
iv2 AS (SELECT * FROM iv WHERE "end" IS NOT NULL)
SELECT DISTINCT i.route, i.beg, i."end", s.rid AS split_index
FROM iv2 i JOIN segr s
  ON s.route = i.route AND i."end" > s.beg AND i.beg < s."end"
""",
        "seg_next_overlapping": f"""
WITH {_SEG_SQL}
SELECT route, beg, "end",
       coalesce(lead(beg) OVER (PARTITION BY route ORDER BY beg, "end", val) < "end",
                false) AS nov
FROM seg
""",
        "seg_consecutive_strings": f"""
WITH {_SEG_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) AS rn FROM seg
),
f AS (
  SELECT route, beg, "end", rn,
         CASE WHEN lag(route) OVER w = route AND lag("end") OVER w = beg
              THEN 0 ELSE 1 END AS nr
  FROM segr WINDOW w AS (ORDER BY rn)
)
SELECT route, beg, "end",
       CAST(sum(nr) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
         AS string_id
FROM f
""",
        "point_tiles": f"""
WITH {_PTS_SQL}
SELECT route, loc,
       6 * 288230376151711744
       + (CAST(floor(loc / 64.0) AS BIGINT) + 268435456) * 536870912
       + (CAST(floor((pval % 500.0) / 64.0) AS BIGINT) + 268435456) AS tile_id
FROM pts
""",
        "seg_profile_sum": f"""
WITH {_SEG_SQL}, {_SEG2_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) AS rid FROM seg
),
j AS (
  SELECT l.rid, l.route, l.beg, l."end",
         coalesce(sum(round(
           ((CASE WHEN (least(greatest((least(l."end", r."end") - r.beg) / (r."end" - r.beg), 0), 1)) < 0.5 THEN 2*(least(greatest((least(l."end", r."end") - r.beg) / (r."end" - r.beg), 0), 1))*(least(greatest((least(l."end", r."end") - r.beg) / (r."end" - r.beg), 0), 1)) ELSE -2*(least(greatest((least(l."end", r."end") - r.beg) / (r."end" - r.beg), 0), 1))*(least(greatest((least(l."end", r."end") - r.beg) / (r."end" - r.beg), 0), 1)) + 4*(least(greatest((least(l."end", r."end") - r.beg) / (r."end" - r.beg), 0), 1)) - 1 END) - (CASE WHEN (least(greatest((greatest(l.beg, r.beg) - r.beg) / (r."end" - r.beg), 0), 1)) < 0.5 THEN 2*(least(greatest((greatest(l.beg, r.beg) - r.beg) / (r."end" - r.beg), 0), 1))*(least(greatest((greatest(l.beg, r.beg) - r.beg) / (r."end" - r.beg), 0), 1)) ELSE -2*(least(greatest((greatest(l.beg, r.beg) - r.beg) / (r."end" - r.beg), 0), 1))*(least(greatest((greatest(l.beg, r.beg) - r.beg) / (r."end" - r.beg), 0), 1)) + 4*(least(greatest((greatest(l.beg, r.beg) - r.beg) / (r."end" - r.beg), 0), 1)) - 1 END))
           * (r."end" - r.beg) * (r."end" - r.beg) * r.qty)), 0.0) AS psum
  FROM segr l LEFT JOIN seg2 r
    ON r.route = l.route AND l."end" > r.beg AND l.beg < r."end"
  GROUP BY l.rid, l.route, l.beg, l."end"
)
SELECT route, beg, "end", CAST(psum AS DOUBLE) AS psum FROM j
""",
        "docs_ngram_jaccard": f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN n >= 3 THEN
             list_transform(range(1, n - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [text] END)) AS g
  FROM t
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
posting AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 2000),
sh2 AS (SELECT sh.doc_id, sh.g FROM sh JOIN posting USING (g)),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
  FROM sh2 x JOIN sh2 y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) AS jaccard
FROM p JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5
""",
        "seg_distribute": f"""
WITH {_SEG_SQL}, {_PTS_SQL},
segr AS (
  SELECT *, row_number() OVER (ORDER BY route, beg, "end", val) - 1 AS pos
  FROM seg
),
ptsr AS (
  SELECT *, row_number() OVER (ORDER BY route, loc, pval, status) - 1 AS j
  FROM pts
),
m AS (
  SELECT l.pos AS q, p.j
  FROM segr l JOIN ptsr p
    ON p.route = l.route AND p.loc > l.beg AND p.loc <= l."end"
),
offs AS (
  SELECT * FROM (VALUES
    (0, 1.0),
    (-1, 1.0 - 1.0/3.0), (1, 1.0 - 1.0/3.0),
    (-2, 1.0 - 2.0/3.0), (2, 1.0 - 2.0/3.0)
  ) AS t(d, dw)
),
contrib AS (
  SELECT m.q + o.d AS r, m.j, o.dw AS c FROM m, offs o
),
placed AS (
  SELECT c.r, c.j, c.c * (t."end" - t.beg) AS c
  FROM contrib c
  JOIN segr t ON t.pos = c.r
  JOIN ptsr p ON p.j = c.j
  WHERE t.route = p.route
),
normed AS (
  SELECT r, j,
         CASE WHEN sum(c) OVER (PARTITION BY j) <> 0
              THEN c / sum(c) OVER (PARTITION BY j) ELSE c END AS share
  FROM placed
),
agg AS (SELECT r, sum(share) AS score FROM normed GROUP BY r)
SELECT s.route, s.beg, s."end",
       round(coalesce(a.score, 0.0), 4) AS score
FROM segr s LEFT JOIN agg a ON a.r = s.pos
""",
        "spatial_snap": """
WITH routes AS (
  SELECT n_nationkey AS rid,
         CAST(n_nationkey * 7 % 50 AS DOUBLE) AS ax,
         CAST(n_nationkey * 13 % 50 AS DOUBLE) AS ay
  FROM nation
),
pts AS (
  SELECT c_custkey AS cust,
         CAST(c_custkey % 70 AS DOUBLE) AS x,
         CAST(c_custkey % 60 AS DOUBLE) AS y
  FROM customer
),
cand AS (
  SELECT p.cust, r.rid, p.x, p.y, r.ax, r.ay,
         least(greatest(((p.x - r.ax) * 20.0 + (p.y - r.ay) * 5.0)
               / (20.0*20.0 + 5.0*5.0), 0.0), 1.0) AS t
  FROM pts p, routes r
),
scored AS (
  SELECT cust, rid,
         sqrt((x - (ax + t*20.0))*(x - (ax + t*20.0))
              + (y - (ay + t*5.0))*(y - (ay + t*5.0))) AS dist,
         t * sqrt(20.0*20.0 + 5.0*5.0) AS along
  FROM cand
),
nearest AS (
  SELECT cust, rid, dist, along,
         row_number() OVER (PARTITION BY cust ORDER BY dist, rid) AS rn
  FROM scored WHERE dist <= 8.0
)
SELECT cust, rid, round(dist, 6) AS snap_dist, round(along, 6) AS loc_mp
FROM nearest WHERE rn = 1
""",
        "seg_separate": f"""
WITH {_SEG_SQL},
segr AS (
  SELECT *, (beg + "end") / 2.0 AS ctr,
         row_number() OVER (
           PARTITION BY route
           ORDER BY (beg + "end") / 2.0 ASC, ("end" - beg) DESC, val ASC
         ) AS pos
  FROM seg
),
dup AS (
  SELECT *, (row_number() OVER (PARTITION BY route, beg, "end" ORDER BY pos) > 1)
            AS same
  FROM segr
),
ins AS (
  SELECT *, max("end") OVER (
              PARTITION BY route
              ORDER BY beg ASC, ("end" - beg) DESC, val ASC
              ROWS UNBOUNDED PRECEDING) AS cmx
  FROM dup
),
ins2 AS (
  SELECT *, min(beg) OVER (PARTITION BY route, cmx) AS cmn FROM ins
),
marked AS (
  SELECT *,
         (same OR ((beg >= cmn AND "end" < cmx) OR (beg > cmn AND "end" <= cmx)))
         AS elim
  FROM ins2
),
valid AS (
  SELECT *,
         lag("end") OVER w AS prev_end,
         lag(ctr)   OVER w AS prev_ctr,
         lead(beg)  OVER w AS next_beg,
         lead(ctr)  OVER w AS next_ctr
  FROM marked WHERE NOT elim
  WINDOW w AS (PARTITION BY route ORDER BY pos)
),
adjusted AS (
  SELECT route,
    CASE WHEN prev_end IS NOT NULL AND (
        (prev_end > beg AND prev_end >= least(greatest((prev_end + beg)/2.0, prev_ctr), ctr)
                        AND beg <= least(greatest((prev_end + beg)/2.0, prev_ctr), ctr))
        OR (prev_end > beg AND prev_end >= (prev_ctr + ctr)/2.0 AND beg <= (prev_ctr + ctr)/2.0))
      THEN CASE WHEN prev_end > beg AND prev_end >= (prev_ctr + ctr)/2.0 AND beg <= (prev_ctr + ctr)/2.0
                THEN (prev_ctr + ctr)/2.0
                ELSE least(greatest((prev_end + beg)/2.0, prev_ctr), ctr) END
      ELSE beg END AS beg,
    CASE WHEN next_beg IS NOT NULL AND (
        ("end" > next_beg AND "end" >= least(greatest(("end" + next_beg)/2.0, ctr), next_ctr)
                          AND next_beg <= least(greatest(("end" + next_beg)/2.0, ctr), next_ctr))
        OR ("end" > next_beg AND "end" >= (ctr + next_ctr)/2.0 AND next_beg <= (ctr + next_ctr)/2.0))
      THEN CASE WHEN "end" > next_beg AND "end" >= (ctr + next_ctr)/2.0 AND next_beg <= (ctr + next_ctr)/2.0
                THEN (ctr + next_ctr)/2.0
                ELSE least(greatest(("end" + next_beg)/2.0, ctr), next_ctr) END
      ELSE "end" END AS "end"
  FROM valid
),
eliminated AS (SELECT route, ctr AS beg, ctr AS "end" FROM marked WHERE elim)
SELECT route, beg, "end" FROM adjusted
UNION ALL
SELECT route, beg, "end" FROM eliminated
""",
        "docs_dedup_exact": """
SELECT doc_id, md5(text) AS text_hash,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
FROM documents
""",
        "docs_stats": """
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(text) = 0 THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1
         END AS n_tokens,
         length(text) AS n
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CASE WHEN n_tokens > 0
             THEN CAST(n - (n_tokens - 1) AS DOUBLE) / n_tokens
             ELSE 0.0 END, 4) AS avg_token_len
FROM t
""",
        "docs_langid": _langid_sql(),
        "docs_fingerprint": """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CASE WHEN n >= 3 THEN
         list_min(list_transform(range(1, n - 1),
           i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
       ELSE md5(text) END AS fingerprint
FROM t
""",
        "ann_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 500 = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(q.qv, x -> CAST(x AS DOUBLE))) DESC,
           e.vec_id ASC) AS rank
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 5
""",
        "events_sessionize": """
WITH s AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS nw
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(nw) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id
""",
    }
