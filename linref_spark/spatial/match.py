"""Line-to-line matching: project linear geometries onto an M-enabled route
network via Hausdorff scoring.

From-scratch Spark re-expression of ``parallel_project_hausdorff``
(``/root/reference/linref/ext/spatial.py:16-273``):

1. candidates: target geometries within ``buffer`` of BOTH endpoints of the
   projected geometry — here a tile equi-join on the two endpoints against
   buffered target covers, requiring both endpoints to hit the same target
   row;
2. score: symmetric Hausdorff distance between the projected geometry and
   the target's substring between the projected endpoints' projections
   (optionally densified);
3. keep the best ``match`` candidates (all within ``max_distance`` when
   match=0), deterministic tie-break by target keys;
4. recover measures: project both endpoints to M on the matched target,
   emit ``beg_m``/``end_m`` (sorted).

Everything heavy runs in one fused Arrow UDF per candidate pair; candidates
are pruned by the tile join, so cost is bounded by tile co-occupancy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from linref_spark.geometry import kernels as K
from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.spatial.tiles import point_tile, with_polyline_tiles

MATCH_TYPE = StructType(
    [
        StructField("hausdorff", DoubleType()),
        StructField("beg_m", DoubleType()),
        StructField("end_m", DoubleType()),
    ]
)


def _make_match_udf(densify):
    @F.pandas_udf(MATCH_TYPE)
    def udf_match(
        txs: pd.Series, tys: pd.Series, tms: pd.Series,
        pxs: pd.Series, pys: pd.Series,
    ) -> pd.DataFrame:
        n = len(txs)
        hd = np.full(n, np.nan)
        beg = np.full(n, np.nan)
        end = np.full(n, np.nan)
        for i in range(n):
            if txs.iloc[i] is None or pxs.iloc[i] is None:
                continue
            tx = np.asarray(txs.iloc[i], dtype=np.float64)
            ty = np.asarray(tys.iloc[i], dtype=np.float64)
            tm = np.asarray(tms.iloc[i], dtype=np.float64)
            px = np.asarray(pxs.iloc[i], dtype=np.float64)
            py = np.asarray(pys.iloc[i], dtype=np.float64)
            # project endpoints onto the target -> distances along
            d0 = K.locate_point(tx, ty, px[0], py[0])
            d1 = K.locate_point(tx, ty, px[-1], py[-1])
            lo, hi = (d0, d1) if d0 <= d1 else (d1, d0)
            # score against the target substring between the projections
            sx, sy, sm = K.substring(tx, ty, tm, lo, hi)
            hd[i] = K.hausdorff_distance(sx, sy, px, py, densify=densify)
            m = K.distance_to_m(tx, ty, tm, np.array([lo, hi]))
            beg[i], end[i] = m[0], m[1]
        return pd.DataFrame({"hausdorff": hd, "beg_m": beg, "end_m": end})

    return udf_match


def match_lines_hausdorff(
    target: DataFrame,
    projected: DataFrame,
    target_lrs: LRS,
    buffer: float,
    max_distance: float | None = None,
    match: int = 1,
    densify: float | None = None,
    res: int = 6,
    geom_col: str = "geom_m",
    proj_geom_col: str = "geom_m",
) -> DataFrame:
    """Returns projected rows matched to targets with columns:
    target keys, ``beg_m``, ``end_m``, ``hausdorff``, ``match_rank``.
    """
    if max_distance is None:
        max_distance = buffer
    if EVENT_ID not in projected.columns:
        raise ValueError("projected frame needs an event_id column")
    keys = list(target_lrs.key_cols)

    if EVENT_ID in target.columns:
        tsel = target.select(
            F.col(EVENT_ID).alias("_tid"), *keys, F.col(geom_col).alias("_tg")
        )
    else:
        tsel = target.select(
            F.xxhash64(*keys, F.col(f"{geom_col}.ms")).alias("_tid"),
            *keys,
            F.col(geom_col).alias("_tg"),
        )
    tt = with_polyline_tiles(
        tsel.withColumnRenamed("_tg", geom_col), geom_col, res=res, buffer=buffer
    ).withColumnRenamed(geom_col, "_tg")

    pg = F.col(proj_geom_col)
    # both endpoints of the projected geometry, tiled
    ends = projected.select(
        F.col(EVENT_ID).alias("_pid"),
        F.col(proj_geom_col).alias("_pg"),
        F.explode(
            F.array(
                F.struct(
                    F.element_at(pg["xs"], 1).alias("x"),
                    F.element_at(pg["ys"], 1).alias("y"),
                    F.lit(0).alias("which"),
                ),
                F.struct(
                    F.element_at(pg["xs"], -1).alias("x"),
                    F.element_at(pg["ys"], -1).alias("y"),
                    F.lit(1).alias("which"),
                ),
            )
        ).alias("_e"),
    ).select(
        "_pid", "_pg",
        F.col("_e.which").alias("_which"),
        point_tile(F.col("_e.x"), F.col("_e.y"), res).alias("tile_id"),
    )

    hits = ends.join(tt, on="tile_id").drop("tile_id")
    # candidate = target row reached by BOTH endpoints (spatial.py step 1)
    cand = (
        hits.groupBy("_pid", "_tid")
        .agg(
            F.countDistinct("_which").alias("_ne"),
            F.first("_pg").alias("_pg"),
            F.first("_tg").alias("_tg"),
            *[F.first(k).alias(k) for k in keys],
        )
        .where(F.col("_ne") == 2)
        .drop("_ne")
    )

    udf_match = _make_match_udf(densify)
    tg, pgc = F.col("_tg"), F.col("_pg")
    scored = cand.withColumn(
        "_m", udf_match(tg["xs"], tg["ys"], tg["ms"], pgc["xs"], pgc["ys"])
    ).select(
        "_pid", "_tid", *keys,
        F.col("_m.hausdorff").alias("hausdorff"),
        F.col("_m.beg_m").alias("beg_m"),
        F.col("_m.end_m").alias("end_m"),
    ).where(F.col("hausdorff") <= max_distance)

    w = Window.partitionBy("_pid").orderBy(
        F.col("hausdorff").asc(), *[F.col(k).asc() for k in keys], F.col("_tid")
    )
    scored = scored.withColumn("match_rank", F.row_number().over(w))
    if match > 0:
        scored = scored.where(F.col("match_rank") <= match)
    return projected.join(
        scored.drop("_tid"), on=F.col(EVENT_ID) == F.col("_pid"), how="inner"
    ).drop("_pid")
