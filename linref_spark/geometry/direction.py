"""Bearing / cardinal-direction extraction — pure column expressions.

From-scratch re-expression of ``/root/reference/linref/utility/
direction.py:7-76``: bearing = degrees(atan2(dy, dx)) between the first and
last vertices; direction = binning of the bearing into N labels (default
E/N/W/S quadrants centered on the axes).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bearing_expr(
    xs: Column, ys: Column, positive: bool = True, invert: bool = False
) -> Column:
    """Bearing angle from first->last vertex of a coordinate-array pair.

    ``positive`` maps to [0, 360); otherwise (-180, 180]
    (``direction.py:26-76``).
    """
    dx = F.element_at(xs, -1) - F.element_at(xs, 1)
    dy = F.element_at(ys, -1) - F.element_at(ys, 1)
    b = F.degrees(F.atan2(dy, dx))
    if invert:
        b = b + 180.0
    if positive:
        b = F.when(b < 0, b + 360.0).otherwise(b)
    else:
        b = F.when(b > 180, b - 360.0).otherwise(b)
    return b


def direction_expr(
    xs: Column, ys: Column, labels: Sequence[str] = ("E", "N", "W", "S")
) -> Column:
    """Cardinal direction label: bins of width 360/len(labels), centered so
    label[0] spans the bearing-0 axis (``direction.py:7-24``:
    ``digitize(bearing, arange(0,360,range) + range/2)``)."""
    n = len(labels)
    width = 360.0 / n
    b = bearing_expr(xs, ys, positive=True)
    # digitize against bin edges range/2, 3*range/2, ...; index n wraps to 0
    idx = F.floor((b + width / 2.0) / width).cast("int") % n
    arr = F.array(*[F.lit(x) for x in labels])
    return F.get(arr, idx)


def with_bearing(
    df: DataFrame, geom_col: str = "geom_m",
    bearing_col: str = "bearing", direction_col: str = "direction",
    labels: Sequence[str] = ("E", "N", "W", "S"),
) -> DataFrame:
    g = F.col(geom_col)
    return df.withColumn(bearing_col, bearing_expr(g["xs"], g["ys"])).withColumn(
        direction_col, direction_expr(g["xs"], g["ys"], labels)
    )
