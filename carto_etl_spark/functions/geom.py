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


# -- WGS84 / UTM (Transverse Mercator, Krüger flattening series) ------------
# Public formulas (Karney 2011 / the standard UTM series).  Third-order in
# n = f/(2-f) ~ 1.68e-3: truncation error O(n^4) is sub-millimetre over a UTM
# zone — far inside the 1e-6-degree (~0.1 m) contract.  All JVM column math:
# the transform stays inside whole-stage codegen, no Python in the path.
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_TM_N = _WGS84_F / (2.0 - _WGS84_F)
_TM_E = math.sqrt(_WGS84_F * (2.0 - _WGS84_F))  # eccentricity; = 2*sqrt(n)/(1+n)
_TM_A = _WGS84_A / (1.0 + _TM_N) * (1.0 + _TM_N**2 / 4.0 + _TM_N**4 / 64.0)
_TM_ALPHA = (
    _TM_N / 2.0 - 2.0 * _TM_N**2 / 3.0 + 5.0 * _TM_N**3 / 16.0,
    13.0 * _TM_N**2 / 48.0 - 3.0 * _TM_N**3 / 5.0,
    61.0 * _TM_N**3 / 240.0,
)
_TM_BETA = (
    _TM_N / 2.0 - 2.0 * _TM_N**2 / 3.0 + 37.0 * _TM_N**3 / 96.0,
    _TM_N**2 / 48.0 + _TM_N**3 / 15.0,
    17.0 * _TM_N**3 / 480.0,
)
_TM_DELTA = (
    2.0 * _TM_N - 2.0 * _TM_N**2 / 3.0 - 2.0 * _TM_N**3,
    7.0 * _TM_N**2 / 3.0 - 8.0 * _TM_N**3 / 5.0,
    56.0 * _TM_N**3 / 15.0,
)
_UTM_K0 = 0.9996
_UTM_FALSE_E = 500000.0
_UTM_FALSE_N_SOUTH = 10000000.0


def utm_srid_params(srid: int) -> tuple[int, bool] | None:
    """(zone, is_northern) for WGS84 UTM EPSG codes 32601-60 / 32701-60."""
    if 32601 <= srid <= 32660:
        return srid - 32600, True
    if 32701 <= srid <= 32760:
        return srid - 32700, False
    return None


def _utm_forward(lon: Column, lat: Column, zone: int, northern: bool):
    lam0 = math.radians(zone * 6 - 183)
    phi = F.radians(lat)
    lam = F.radians(lon) - F.lit(lam0)
    sphi = F.sin(phi)
    t = F.sinh(F.atanh(sphi) - _TM_E * F.atanh(F.lit(_TM_E) * sphi))
    xi_p = F.atan2(t, F.cos(lam))
    eta_p = F.atanh(F.sin(lam) / F.sqrt(t * t + 1.0))
    xi, eta = xi_p, eta_p
    for j, a in enumerate(_TM_ALPHA, start=1):
        xi = xi + a * F.sin(2.0 * j * xi_p) * F.cosh(2.0 * j * eta_p)
        eta = eta + a * F.cos(2.0 * j * xi_p) * F.sinh(2.0 * j * eta_p)
    easting = F.lit(_UTM_FALSE_E) + _UTM_K0 * _TM_A * eta
    northing = _UTM_K0 * _TM_A * xi + (
        F.lit(0.0) if northern else F.lit(_UTM_FALSE_N_SOUTH)
    )
    return easting, northing


def _utm_inverse(easting: Column, northing: Column, zone: int, northern: bool):
    lam0 = math.radians(zone * 6 - 183)
    false_n = 0.0 if northern else _UTM_FALSE_N_SOUTH
    xi = (northing - F.lit(false_n)) / (_UTM_K0 * _TM_A)
    eta = (easting - F.lit(_UTM_FALSE_E)) / (_UTM_K0 * _TM_A)
    xi_p, eta_p = xi, eta
    for j, b in enumerate(_TM_BETA, start=1):
        xi_p = xi_p - b * F.sin(2.0 * j * xi) * F.cosh(2.0 * j * eta)
        eta_p = eta_p - b * F.cos(2.0 * j * xi) * F.sinh(2.0 * j * eta)
    chi = F.asin(F.sin(xi_p) / F.cosh(eta_p))
    phi = chi
    for j, d in enumerate(_TM_DELTA, start=1):
        phi = phi + d * F.sin(2.0 * j * chi)
    lon = F.degrees(F.lit(lam0) + F.atan2(F.sinh(eta_p), F.cos(xi_p)))
    lat = F.degrees(phi)
    return lon, lat


def transform_point(geom: Column, from_srid: int, to_srid: int) -> Column:
    """SRID transform as column arithmetic.  Supports the identity, the
    web-mercator pair, every WGS84 UTM zone (EPSG 326xx/327xx, Krüger series
    above), and any composition of those through 4326 (UTM<->UTM,
    UTM<->3857).  Other SRIDs need a proj library + datum shift and raise.

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
    utm_to = utm_srid_params(to_srid)
    if from_srid == WGS84 and utm_to is not None:
        e, n = _utm_forward(x, y, *utm_to)
        return point_struct(e, n, to_srid)
    utm_from = utm_srid_params(from_srid)
    if utm_from is not None and to_srid == WGS84:
        lon, lat = _utm_inverse(x, y, *utm_from)
        return point_struct(lon, lat, WGS84)
    if _transform_legs(from_srid, to_srid) is not None:
        # Both legs exist, but Column-level composition re-embeds the full
        # upstream expression tree at every coordinate reference (the series
        # terms reference coords ~30x each; squared across legs that is an
        # analysis-time blow-up).  The DataFrame API stages each leg in its
        # own projection and stays flat.
        raise ValueError(
            f"SRID transform {from_srid}->{to_srid} needs an intermediate "
            "4326 leg: use transform_geom(df, ...) which stages legs as "
            "separate projections"
        )
    raise ValueError(
        f"unsupported SRID transform {from_srid}->{to_srid}; "
        "supported: 4326, 3857, WGS84 UTM zones (EPSG 326xx/327xx) "
        "(reference default is 4326, etl/etl.py:21; other SRIDs need a proj "
        "library and a datum shift)"
    )


def _supported_srid(srid: int) -> bool:
    return srid in (WGS84, WEB_MERCATOR) or utm_srid_params(srid) is not None


def _transform_legs(from_srid: int, to_srid: int) -> list[tuple[int, int]] | None:
    """Single- or two-leg path between supported SRIDs, None if unsupported."""
    if not (_supported_srid(from_srid) and _supported_srid(to_srid)):
        return None
    if from_srid == to_srid:
        return []
    if WGS84 in (from_srid, to_srid):
        return [(from_srid, to_srid)]
    return [(from_srid, WGS84), (WGS84, to_srid)]


def _fresh_name(df: DataFrame, base: str) -> str:
    """A staging-column name absent from ``df`` — a source column that
    happens to share an internal temp name must not be overwritten/dropped."""
    name = base
    while name in df.columns:
        name += "_"
    return name


def transform_geom(
    df: DataFrame,
    geom_col: str,
    from_srid: int,
    to_srid: int,
    out_col: str | None = None,
) -> DataFrame:
    """SRID transform as a DataFrame operation: each supported leg (at most
    from->4326->to) runs in its OWN projection, so expression trees stay flat
    no matter how the legs compose — Column-level nesting duplicates the whole
    upstream tree per coordinate reference.  Catalyst collapses adjacent
    projections at the physical level while subexpression elimination keeps
    each leg's series terms shared."""
    legs = _transform_legs(from_srid, to_srid)
    if legs is None:
        raise ValueError(
            f"unsupported SRID transform {from_srid}->{to_srid}; "
            "supported: 4326, 3857, WGS84 UTM zones (EPSG 326xx/327xx)"
        )
    out_col = out_col or geom_col
    tmp = _fresh_name(df, f"__xf_{out_col}")
    out = df.withColumn(tmp, F.col(geom_col))
    for a, b in legs:
        out = out.withColumn(tmp, transform_point(F.col(tmp), a, b))
    return out.withColumn(out_col, F.col(tmp)).drop(tmp)


def _point_from_coords(lon: Column, lat: Column, cfg: JobConfig) -> Column:
    """Validated point from already-parsed coordinate columns."""
    zero = cfg.compat_zero_coord_is_null
    if cfg.srid == WGS84:
        # The +/-180/90 bounds are DEGREE semantics.  The reference applies
        # them for every srid (etl/etl.py:238-250), which silently nulls all
        # real projected coordinates (UTM eastings are ~10^5 m) — a bug, not
        # a contract; projected inputs skip the degree bounds here.
        lon = validated_lon(lon, zero_is_null=zero)
        lat = validated_lat(lat, zero_is_null=zero)
    elif zero:
        lon = F.when(lon == 0.0, F.lit(None)).otherwise(lon)
        lat = F.when(lat == 0.0, F.lit(None)).otherwise(lat)
    pt = point_struct(lon, lat, cfg.srid)
    if cfg.srid != WGS84:
        pt = F.when(
            pt.isNotNull(), transform_point(pt, cfg.srid, WGS84)
        )
    return pt


def geom_expr(df: DataFrame, cfg: JobConfig) -> Column:
    """Typed geometry column per the reference's ``create_geom_query`` decision
    tree (etl/etl.py:175-192): force_the_geom passthrough > force_no_geometry
    NULL > validated point from x/y columns (NULL if either coord invalid).

    Single-Column form: the coordinate parse tree is inlined at every
    reference (validation + struct + downstream field extraction), which
    multiplies the locale-float parse ~6x per coordinate — fine for one-row
    goldens, wrong for the ingest hot path.  Jobs use ``staged_geom``, which
    parses each coordinate exactly once."""
    if cfg.force_the_geom:
        if cfg.force_the_geom not in df.columns:
            return F.lit(None).cast("string").alias("the_geom")
        return F.col(cfg.force_the_geom).alias("the_geom")
    if cfg.force_no_geometry:
        return F.lit(None).cast(
            "struct<x:double,y:double,srid:int>"
        ).alias("the_geom")
    lon = coord_expr(df, cfg, cfg.x_column)
    lat = coord_expr(df, cfg, cfg.y_column)
    return _point_from_coords(lon, lat, cfg).alias("the_geom")


def staged_geom(
    df: DataFrame, cfg: JobConfig, out_col: str = "the_geom"
) -> DataFrame:
    """``geom_expr`` as a DataFrame op with the coordinate parse STAGED in its
    own projection.  Validation/struct-building then reference the parsed
    value as a plain attribute, so the heavy locale-float parse (replace +
    special-value CASE + try_cast) runs once per coordinate per row.  Catalyst's
    CollapseProject keeps the stage separate — it refuses to inline non-cheap
    producer expressions referenced more than once — and whole-stage codegen
    gets a method small enough for the JIT (the inlined form fell out of
    compiled execution and ran ~2x slower end-to-end at sf0.1)."""
    if cfg.force_the_geom or cfg.force_no_geometry:
        return df.withColumn(out_col, geom_expr(df, cfg))
    px, py = _fresh_name(df, f"__{out_col}_px"), _fresh_name(df, f"__{out_col}_py")
    staged = df.withColumns(
        {
            px: coord_expr(df, cfg, cfg.x_column),
            py: coord_expr(df, cfg, cfg.y_column),
        }
    )
    lon, lat = F.col(px), F.col(py)
    zero = cfg.compat_zero_coord_is_null
    if cfg.srid == WGS84:
        lon = validated_lon(lon, zero_is_null=zero)
        lat = validated_lat(lat, zero_is_null=zero)
    elif zero:
        lon = F.when(lon == 0.0, F.lit(None)).otherwise(lon)
        lat = F.when(lat == 0.0, F.lit(None)).otherwise(lat)
    staged = staged.withColumn(
        out_col, point_struct(lon, lat, cfg.srid)
    ).drop(px, py)
    if cfg.srid != WGS84:
        # transform_geom stages each leg in its own projection; a NULL input
        # struct propagates to a NULL output (all series math is null-strict)
        staged = transform_geom(staged, out_col, cfg.srid, WGS84)
    return staged


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

def morton_expr(tx: Column, ty: Column, zoom: int) -> Column:
    """Morton (Z-order curve) code from tile indices: bit i of x lands at
    position 2i, bit i of y at 2i+1.  Pure shift/and/or column math (OR never
    overflows; 2*zoom <= 62 bits), so the clustering key is JVM-side and
    codegen-friendly.  Spatially-near tiles share code prefixes, which is
    what makes range-partitioned writes produce files with tight min/max
    ranges — the layout half of file-level data skipping."""
    if not 1 <= zoom <= 31:
        raise ValueError("zoom must be in [1, 31]")
    code = F.lit(0).cast("long")
    for i in range(zoom):
        xbit = F.shiftrightunsigned(tx.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftrightunsigned(ty.cast("long"), i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return code


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
