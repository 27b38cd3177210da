"""Geometry as pure column math (reference F5/F6 + the grid expression behind
overview aggregation, D5).

The reference delegates ``st_makepoint/st_setsrid/st_transform/st_x/st_y`` to
PostGIS (/root/reference/etl/etl.py:190-192, etl/geocoding.py:145-146).  Points
are the only geometry type in the whole system, so the Spark-native model is:

- a ``geom`` struct column ``{x: double, y: double, srid: int}``
- WKT/EWKT renderers for interchange
- SRID transform implemented as column arithmetic for the web-mercator pair
  (4326 <-> 3857); other SRIDs raise (v1 scope — every reference fixture uses
  4326, the default, etl/etl.py:21)
- web-mercator tile indices ``tile_x/tile_y(zoom)`` — the grid cell behind
  CARTO's ``CDB_CreateOverviews`` LOD aggregation (etl/etl.py:166-170)

All pure `pyspark.sql.functions` — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.config import MAX_LAT, MAX_LON, JobConfig
from carto_etl_spark.functions.coerce import (
    NULL_RENDER,
    float_expr,
    render_value_expr,
)

WGS84 = 4326
WEB_MERCATOR = 3857
_EARTH_RADIUS = 6378137.0


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# ---------------------------------------------------------------------------
# Coordinate validation (reference P3/P4/P5, etl/etl.py:236-262)
# ---------------------------------------------------------------------------

def validated_lon(lon: Column, *, zero_is_null: bool = False) -> Column:
    """abs(lon) > 180 -> NULL (etl/etl.py:239).  ``zero_is_null`` reproduces the
    reference's ``coord or None`` quirk (etl/etl.py:258) behind a compat flag."""
    out = F.when(F.abs(lon) > MAX_LON, F.lit(None)).otherwise(lon)
    if zero_is_null:
        out = F.when(lon == 0.0, F.lit(None)).otherwise(out)
    return out


def validated_lat(lat: Column, *, zero_is_null: bool = False) -> Column:
    """abs(lat) > 90 -> NULL (etl/etl.py:249)."""
    out = F.when(F.abs(lat) > MAX_LAT, F.lit(None)).otherwise(lat)
    if zero_is_null:
        out = F.when(lat == 0.0, F.lit(None)).otherwise(out)
    return out


def coord_expr(df: DataFrame, cfg: JobConfig, column_name: str) -> Column:
    """Parse one coordinate column with float semantics; absent column -> NULL
    (reference ``get_coord`` KeyError path, etl/etl.py:256-262)."""
    if column_name not in df.columns:
        return F.lit(None).cast("double")
    return float_expr(
        column_name, cfg.float_comma_separator, cfg.float_thousand_separator
    )


# ---------------------------------------------------------------------------
# Point construction + SRID transform (reference F5)
# ---------------------------------------------------------------------------

def point_struct(x: Column, y: Column, srid: int = WGS84) -> Column:
    """The engine's geometry value: NULL unless both coords are present."""
    return F.when(
        x.isNotNull() & y.isNotNull(),
        F.struct(
            x.cast("double").alias("x"),
            y.cast("double").alias("y"),
            F.lit(srid).alias("srid"),
        ),
    )


def st_x(geom: Column | str) -> Column:
    return _col(geom).getField("x")


def st_y(geom: Column | str) -> Column:
    return _col(geom).getField("y")


def wkt_point(x: Column, y: Column) -> Column:
    """``POINT (x y)`` rendering; NULL when either coord is NULL."""
    return F.when(
        x.isNotNull() & y.isNotNull(),
        F.concat(
            F.lit("POINT ("),
            x.cast("string"),
            F.lit(" "),
            y.cast("string"),
            F.lit(")"),
        ),
    )


def transform_point(geom: Column, from_srid: int, to_srid: int) -> Column:
    """SRID transform as column arithmetic.  Supports the identity and the
    web-mercator pair; anything else needs a proj library and raises.

    Spherical-mercator math (public formulas):
      3857: x = R*radians(lon); y = R*ln(tan(pi/4 + radians(lat)/2))
    """
    x, y = st_x(geom), st_y(geom)
    if from_srid == to_srid:
        return geom
    if (from_srid, to_srid) == (WGS84, WEB_MERCATOR):
        mx = F.radians(x) * _EARTH_RADIUS
        my = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(y) / 2.0)) * _EARTH_RADIUS
        return point_struct(mx, my, WEB_MERCATOR)
    if (from_srid, to_srid) == (WEB_MERCATOR, WGS84):
        lon = F.degrees(x / _EARTH_RADIUS)
        lat = F.degrees(
            F.atan(F.sinh(y / _EARTH_RADIUS))
        )
        return point_struct(lon, lat, WGS84)
    raise ValueError(
        f"unsupported SRID transform {from_srid}->{to_srid}; "
        "v1 supports 4326<->3857 (reference default is 4326, etl/etl.py:21)"
    )


def geom_expr(df: DataFrame, cfg: JobConfig) -> Column:
    """Typed geometry column per the reference's ``create_geom_query`` decision
    tree (etl/etl.py:175-192): force_the_geom passthrough > force_no_geometry
    NULL > validated point from x/y columns (NULL if either coord invalid)."""
    if cfg.force_the_geom:
        if cfg.force_the_geom not in df.columns:
            return F.lit(None).cast("string").alias("the_geom")
        return F.col(cfg.force_the_geom).alias("the_geom")
    if cfg.force_no_geometry:
        return F.lit(None).cast(
            "struct<x:double,y:double,srid:int>"
        ).alias("the_geom")
    zero = cfg.compat_zero_coord_is_null
    lon = validated_lon(coord_expr(df, cfg, cfg.x_column), zero_is_null=zero)
    lat = validated_lat(coord_expr(df, cfg, cfg.y_column), zero_is_null=zero)
    pt = point_struct(lon, lat, cfg.srid)
    if cfg.srid != WGS84:
        pt = F.when(
            pt.isNotNull(), transform_point(pt, cfg.srid, WGS84)
        )
    return pt.alias("the_geom")


def render_geom_expr(df: DataFrame, cfg: JobConfig) -> Column:
    """SQL-text render of ``create_geom_query`` (etl/etl.py:175-192) for the
    golden-compat layer: ``st_transform(st_setsrid(st_makepoint(x, y), srid),
    4326),`` or ``NULL,`` or the force_the_geom literal passthrough."""
    if cfg.force_the_geom:
        return render_value_expr(df, cfg.force_the_geom, cfg, parse_float=False)
    if cfg.force_no_geometry:
        return F.lit(NULL_RENDER)
    zero = cfg.compat_zero_coord_is_null
    lon = validated_lon(coord_expr(df, cfg, cfg.x_column), zero_is_null=zero)
    lat = validated_lat(coord_expr(df, cfg, cfg.y_column), zero_is_null=zero)
    from carto_etl_spark.functions.coerce import _python_float_repr

    repr_udf = _python_float_repr()
    return F.when(
        lon.isNotNull() & lat.isNotNull(),
        F.concat(
            F.lit("st_transform(st_setsrid(st_makepoint("),
            repr_udf(lon),
            F.lit(", "),
            repr_udf(lat),
            F.lit(f"), {cfg.srid}), 4326),"),
        ),
    ).otherwise(F.lit(NULL_RENDER))


# ---------------------------------------------------------------------------
# Web-mercator tiling (the grid cell behind overview aggregation)
# ---------------------------------------------------------------------------

def tile_x(lon: Column, zoom: int) -> Column:
    """Slippy-map tile X index at ``zoom`` (public OSM formula), clamped to the
    valid range so lon=180 lands in the last tile."""
    n = F.lit(float(2 ** zoom))
    raw = F.floor((lon + 180.0) / 360.0 * n)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(2 ** zoom - 1)).cast("long")


def tile_y(lat: Column, zoom: int) -> Column:
    """Slippy-map tile Y index at ``zoom``; latitude clamped to the mercator
    domain (+/-85.05113) to keep ``tan`` finite."""
    n = F.lit(float(2 ** zoom))
    clamped = F.least(F.greatest(lat, F.lit(-85.05112878)), F.lit(85.05112878))
    lat_rad = F.radians(clamped)
    raw = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / F.lit(math.pi))
        / 2.0
        * n
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(2 ** zoom - 1)).cast("long")
