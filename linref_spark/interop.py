"""GeoDataFrame / shapely interop (import-gated) + WKB frame ingestion.

Closes the reference-parity gap around ``parse_geoms_m_shapely`` and
GeoDataFrame round-trips (``linref/ext/base.py:1786-1788`` import guard,
``ext/base.py:3381-3425`` geometry parsing): linref users arrive holding
a ``geopandas.GeoDataFrame``; this module is their front door.

Two layers, so the path works with or without the GEOS stack:

1. **WKB layer (always available).** ``frame_from_wkb`` /
   ``frame_to_wkb`` convert between a binary WKB column and the engine's
   ``geom_m`` struct via the pure-python codec
   (:func:`linref_spark.geometry.kernels.from_wkb_m`: ISO 2002 + EWKB,
   both byte orders, plain 2-D accepted with M = 0). A WKB column is
   exactly what ``GeoDataFrame.geometry.to_wkb()`` (shapely 2,
   vectorized) produces, so shapely-holding users can hand bytes across
   without this engine importing GEOS at all — the natural seam for a
   driver-side geopandas -> cluster-side Spark pipeline.

2. **geopandas layer (gated).** ``from_geopandas`` / ``to_geopandas``
   run the same WKB hop end-to-end when geopandas IS installed,
   carrying the CRS string along as Spark column metadata. Importing
   them without geopandas raises the same clear ImportError the
   reference raises without its optional deps (``ext/base.py:1786``).

CRS policy: carried verbatim (``crs`` column metadata via
``withMetadata``), never reprojected — reprojection needs pyproj, and
linref itself treats measures as CRS-agnostic scalars. ``crs_of`` reads
it back; binary spatial ops are documented to require matching CRS.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linref_spark.geometry.udfs import (
    udf_geom_m_to_wkb,
    udf_wkb_to_geom_m,
)

try:  # pragma: no cover - exercised only where geopandas exists
    import geopandas as _gpd  # noqa: F401

    HAS_GEOPANDAS = True
except Exception:  # ImportError and any GEOS load failure
    _gpd = None
    HAS_GEOPANDAS = False


def frame_from_wkb(
    df: DataFrame,
    wkb_col: str = "wkb",
    out_col: str = "geom_m",
    crs: Optional[str] = None,
    drop_wkb: bool = False,
) -> DataFrame:
    """Parse a binary WKB LINESTRING[ M] column into a ``geom_m`` struct.

    Accepts ISO 2002, EWKB-with-M and plain 2-D LINESTRING bytes in
    either byte order (2-D rows get M = 0; re-impute from bounds with
    :func:`linref_spark.geometry.udfs.udf_set_m_from_bounds` /
    ``add_geom_m``). Unparseable bytes surface as NULL structs.
    """
    parsed = udf_wkb_to_geom_m(F.col(wkb_col))
    # the Arrow UDF surfaces parse failures as a struct of NULL fields;
    # normalize to a NULL struct so `geom_m IS NULL` filters work
    out = df.withColumn(
        out_col, F.when(parsed["xs"].isNotNull(), parsed)
    )
    if crs is not None:
        out = out.withMetadata(out_col, {"crs": crs})
    if drop_wkb:
        out = out.drop(wkb_col)
    return out


def frame_to_wkb(
    df: DataFrame,
    geom_col: str = "geom_m",
    out_col: str = "wkb",
    drop_geom: bool = False,
) -> DataFrame:
    """Emit ISO WKB ``LINESTRING M`` (type 2002) bytes from a ``geom_m``
    struct column — consumable by shapely 2 ``from_wkb``, PostGIS, GDAL."""
    g = F.col(geom_col)
    out = df.withColumn(
        out_col, udf_geom_m_to_wkb(g["xs"], g["ys"], g["ms"])
    )
    if drop_geom:
        out = out.drop(geom_col)
    return out


def crs_of(df: DataFrame, geom_col: str = "geom_m") -> Optional[str]:
    """The CRS string carried on a geometry column's metadata, if any."""
    for f in df.schema.fields:
        if f.name == geom_col:
            return (f.metadata or {}).get("crs")
    return None


def _require_geopandas(fn_name: str) -> None:
    if not HAS_GEOPANDAS:
        raise ImportError(
            f"{fn_name} requires geopandas/shapely (not installed). "
            "Convert driver-side with gdf.geometry.to_wkb() and use "
            "linref_spark.interop.frame_from_wkb instead — the engine's "
            "WKB codec needs no GEOS."
        )


def from_geopandas(
    spark,
    gdf,
    out_col: str = "geom_m",
    keep_wkb: bool = False,
) -> DataFrame:
    """GeoDataFrame -> Spark DataFrame with a ``geom_m`` struct column.

    Non-geometry columns ride along unchanged; the geometry column is
    serialized driver-side via shapely 2's vectorized ``to_wkb`` and
    parsed executor-side by the pure-python codec. The GeoDataFrame's
    CRS (``gdf.crs``) travels as column metadata.
    """
    _require_geopandas("from_geopandas")
    import pandas as pd

    attrs = pd.DataFrame(gdf.drop(columns=gdf.geometry.name))
    attrs["_wkb"] = gdf.geometry.to_wkb()
    crs = str(gdf.crs) if gdf.crs is not None else None
    sdf = spark.createDataFrame(attrs)
    out = frame_from_wkb(
        sdf, wkb_col="_wkb", out_col=out_col, crs=crs,
        drop_wkb=not keep_wkb,
    )
    return out


def to_geopandas(
    df: DataFrame,
    geom_col: str = "geom_m",
    crs: Optional[str] = None,
):
    """Spark DataFrame with ``geom_m`` -> driver-side GeoDataFrame.

    Collects through the WKB hop (bounded by whatever filter/limit the
    caller applied — this is a driver-side materialization by nature).
    ``crs`` defaults to the metadata carried by :func:`frame_from_wkb`.
    """
    _require_geopandas("to_geopandas")
    import geopandas as gpd

    crs = crs if crs is not None else crs_of(df, geom_col)
    pdf = frame_to_wkb(df, geom_col, out_col="_wkb", drop_geom=True).toPandas()
    geom = gpd.GeoSeries.from_wkb(pdf.pop("_wkb"), crs=crs)
    return gpd.GeoDataFrame(pdf, geometry=geom, crs=crs)
