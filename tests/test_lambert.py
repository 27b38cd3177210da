"""Lambert-family SRID transforms (functions/geom.py): LAEA Europe
(EPSG:3035) and Lambert conformal conic 2SP (EPSG:2154 Lambert-93,
EPSG:3034 LCC Europe).

The reference delegates ANY-srid ``st_transform`` to PostGIS
(/root/reference/etl/etl.py:190-192); these tests pin the natively-absorbed
column math to (a) the projection-origin identities (false easting/northing
exactly), (b) the published EPSG Guidance Note 7-2 worked example for LAEA,
(c) <=1e-6-degree round trips over each projection's service extent, and
(d) the projections' *defining properties* — conformal scale == 1 on the
standard parallels, equal-area patches for LAEA — which are independent of
the forward-formula implementation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.functions.geom import (
    point_struct,
    st_x,
    st_y,
    transform_geom,
    transform_point,
)

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)


def _fwd(spark, lon, lat, srid):
    df = spark.createDataFrame([(float(lon), float(lat))], ["lon", "lat"])
    pt = point_struct(F.col("lon"), F.col("lat"), 4326)
    out = transform_point(pt, 4326, srid)
    r = df.select(st_x(out).alias("x"), st_y(out).alias("y")).first()
    return r["x"], r["y"]


def test_projection_origin_identities(spark):
    # at (lat0, lon0) every family lands exactly on (false_e, false_n)
    cases = {
        3035: (10.0, 52.0, 4321000.0, 3210000.0),
        2154: (3.0, 46.5, 700000.0, 6600000.0),
        3034: (10.0, 52.0, 4000000.0, 2800000.0),
        5070: (-96.0, 23.0, 0.0, 0.0),
    }
    for srid, (lon0, lat0, fe, fn) in cases.items():
        x, y = _fwd(spark, lon0, lat0, srid)
        assert x == pytest.approx(fe, abs=1e-6), srid
        assert y == pytest.approx(fn, abs=1e-6), srid


def test_laea_epsg_worked_example(spark):
    # IOGP Guidance Note 7-2, LAEA (ETRS89 / ETRS-LAEA) worked example:
    # 50N 5E -> E 3962799.45, N 2999718.85
    x, y = _fwd(spark, 5.0, 50.0, 3035)
    assert x == pytest.approx(3962799.45, abs=0.01)
    assert y == pytest.approx(2999718.85, abs=0.01)


def test_lambert93_paris(spark):
    # published RGF93/Lambert-93 coordinates for central Paris
    x, y = _fwd(spark, 2.3522, 48.8566, 2154)
    assert x == pytest.approx(652469.0, abs=1.0)
    assert y == pytest.approx(6862035.3, abs=1.0)


@pytest.mark.parametrize(
    "srid, lon_rng, lat_rng",
    [
        (3035, (-10.0, 30.0), (35.0, 70.0)),
        (2154, (-4.5, 9.5), (41.5, 51.0)),
        (3034, (-10.0, 30.0), (35.0, 70.0)),
        (5070, (-124.0, -67.0), (24.0, 49.0)),
    ],
)
def test_round_trip_grid(spark, srid, lon_rng, lat_rng):
    # one DataFrame pass over a 9x9 grid spanning the service extent
    pts = [
        (lon_rng[0] + i * (lon_rng[1] - lon_rng[0]) / 8.0,
         lat_rng[0] + j * (lat_rng[1] - lat_rng[0]) / 8.0)
        for i in range(9) for j in range(9)
    ]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    fwd = transform_point(point_struct(F.col("lon"), F.col("lat"), 4326),
                          4326, srid)
    back = transform_point(fwd, srid, 4326)
    bad = df.select(
        "lon", "lat",
        st_x(back).alias("lon2"), st_y(back).alias("lat2"),
    ).where(
        (F.abs(F.col("lon2") - F.col("lon")) > 1e-6)
        | (F.abs(F.col("lat2") - F.col("lat")) > 1e-6)
    )
    assert bad.count() == 0, bad.limit(5).collect()


def _scale_along_parallel(spark, srid, lon, lat):
    """Projected-length / ellipsoid-length for a short east-west step;
    implementation-independent probe of the conformal scale factor."""
    dlon = 1e-4
    (x1, y1), (x2, y2) = _fwd(spark, lon, lat, srid), _fwd(spark, lon + dlon, lat, srid)
    proj = math.hypot(x2 - x1, y2 - y1)
    phi = math.radians(lat)
    nu = GRS80_A / math.sqrt(1.0 - GRS80_E2 * math.sin(phi) ** 2)
    arc = math.radians(dlon) * nu * math.cos(phi)
    return proj / arc


@pytest.mark.parametrize(
    "srid, lon0, sp1, sp2",
    [(2154, 3.0, 44.0, 49.0), (3034, 10.0, 35.0, 65.0)],
)
def test_lcc_unit_scale_on_standard_parallels(spark, srid, lon0, sp1, sp2):
    for sp in (sp1, sp2):
        k = _scale_along_parallel(spark, srid, lon0, sp)
        assert k == pytest.approx(1.0, abs=1e-6), (srid, sp)
    # between the parallels the cone cuts below the ellipsoid: k < 1
    mid = (sp1 + sp2) / 2.0
    assert _scale_along_parallel(spark, srid, lon0, mid) < 1.0 - 1e-6
    # outside them: k > 1
    assert _scale_along_parallel(spark, srid, lon0, sp2 + 4.0) > 1.0 + 1e-6


def test_laea_preserves_area(spark):
    # project a small quad at an arbitrary off-center point and compare the
    # shoelace area against the ellipsoidal patch area M*N*cos(phi)*dphi*dlam
    lon, lat, d = 24.0, 61.0, 1e-3
    corners = [(lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)]
    xy = [_fwd(spark, lo, la, 3035) for lo, la in corners]
    shoelace = 0.5 * abs(sum(
        xy[i][0] * xy[(i + 1) % 4][1] - xy[(i + 1) % 4][0] * xy[i][1]
        for i in range(4)
    ))
    phi = math.radians(lat + d / 2.0)
    one = 1.0 - GRS80_E2 * math.sin(phi) ** 2
    m_rad = GRS80_A * (1.0 - GRS80_E2) / one ** 1.5
    n_rad = GRS80_A / math.sqrt(one)
    ellip = m_rad * n_rad * math.cos(phi) * math.radians(d) ** 2
    assert shoelace == pytest.approx(ellip, rel=1e-6)


def test_cross_family_two_leg(spark):
    # 2154 -> 3035 routes through WGS84 via transform_geom's staged legs
    df = spark.createDataFrame([(2.3522, 48.8566)], ["lon", "lat"])
    src = df.select(
        point_struct(F.col("lon"), F.col("lat"), 4326).alias("g"), "lon", "lat"
    )
    in_l93 = transform_geom(src, "g", 4326, 2154, out_col="l93")
    in_laea = transform_geom(in_l93, "l93", 2154, 3035, out_col="laea")
    direct = transform_point(point_struct(F.col("lon"), F.col("lat"), 4326),
                             4326, 3035)
    r = in_laea.select(
        st_x("laea").alias("x2"), st_y("laea").alias("y2"),
        st_x(direct).alias("x1"), st_y(direct).alias("y1"),
    ).first()
    assert r["x2"] == pytest.approx(r["x1"], abs=1e-2)
    assert r["y2"] == pytest.approx(r["y1"], abs=1e-2)


def test_unsupported_srid_message_lists_families(spark):
    # NY state plane ftUS: LCC zone not registered (and ftUS units never
    # will be implicit) — must raise with the supported-family listing
    with pytest.raises(ValueError, match="3035"):
        transform_point(F.lit(None), 4326, 2263)


def test_lcc_generalized_ellipsoid_snyder_example(spark):
    """Snyder PP 1395 p. 296-297 worked example for ellipsoidal LCC 2SP on
    Clarke 1866 (sp 33/45 N, origin 23 N 96 W; point 35 N 75 W ->
    x = 1,894,410.9 m, y = 1,564,649.5 m).  Validates the generalized
    (ellipsoid-parameterized) machinery against independently published
    numbers — the same code path the NAD83/GRS80 zones use."""
    from carto_etl_spark.functions import geom as G

    G._LCC_PARAMS[99901] = (23.0, -96.0, 33.0, 45.0, 0.0, 0.0, "CLARKE1866")
    try:
        x, y = _fwd(spark, -75.0, 35.0, 99901)
        assert x == pytest.approx(1894410.9, abs=1.0)
        assert y == pytest.approx(1564649.5, abs=1.0)
    finally:
        del G._LCC_PARAMS[99901]


def test_nad83_texas_south_central(spark):
    # origin identity: (lat0, lon0) -> exactly (FE, FN)
    x, y = _fwd(spark, -99.0, 27.0 + 50.0 / 60.0, 32140)
    assert x == pytest.approx(600000.0, abs=1e-6)
    assert y == pytest.approx(4000000.0, abs=1e-6)
    # round trip over the zone's service extent
    df = spark.createDataFrame(
        [(lon / 10.0, lat / 10.0)
         for lon in range(-1000, -935, 13) for lat in range(280, 300, 7)],
        ["lon", "lat"],
    )
    src = df.select(point_struct(F.col("lon"), F.col("lat"), 4326).alias("g"),
                    "lon", "lat")
    fwd = transform_geom(src, "g", 4326, 32140, out_col="sp")
    back = transform_geom(fwd, "sp", 32140, 4326, out_col="g2")
    bad = back.filter(
        (F.abs(st_x("g2") - F.col("lon")) > 1e-6)
        | (F.abs(st_y("g2") - F.col("lat")) > 1e-6)
    ).count()
    assert bad == 0


def test_nad83_texas_scale_one_on_standard_parallels(spark):
    # defining property of LCC 2SP: scale factor == 1 along both standard
    # parallels (independent of the forward-formula implementation)
    for sp in (28.0 + 23.0 / 60.0, 30.0 + 17.0 / 60.0):
        d = 0.01
        x1, y1 = _fwd(spark, -98.0, sp, 32140)
        x2, y2 = _fwd(spark, -98.0 + d, sp, 32140)
        chord = math.hypot(x2 - x1, y2 - y1)
        phi = math.radians(sp)
        n_rad = GRS80_A / math.sqrt(1.0 - GRS80_E2 * math.sin(phi) ** 2)
        arc = n_rad * math.cos(phi) * math.radians(d)
        assert chord == pytest.approx(arc, rel=1e-6)


def test_helmert_ed50_round_trip_and_magnitude(spark):
    """ED50 (EPSG:4230) <-> WGS84 via the 7-parameter Helmert hook: the
    forward/inverse round trip closes below 5e-8 deg (~5 mm; Bowring's
    one-shot inverse is the ~1e-8-deg term), and the
    shift magnitude over Europe is the well-known ~100-250 m (a pure
    identity or a wrong-sign shift would fail both bounds)."""
    pts = [(2.3522, 48.8566), (12.5, 41.9), (-3.7, 40.4), (19.0, 52.2)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    src = df.select(point_struct(F.col("lon"), F.col("lat"), 4326).alias("g"),
                    "lon", "lat")
    to_ed50 = transform_geom(src, "g", 4326, 4230, out_col="ed50")
    back = transform_geom(to_ed50, "ed50", 4230, 4326, out_col="g2")
    rows = back.select(
        "lon", "lat",
        st_x("ed50").alias("elon"), st_y("ed50").alias("elat"),
        st_x("g2").alias("blon"), st_y("g2").alias("blat"),
    ).collect()
    for r in rows:
        assert r["blon"] == pytest.approx(r["lon"], abs=5e-8)
        assert r["blat"] == pytest.approx(r["lat"], abs=5e-8)
        dlat_m = abs(r["elat"] - r["lat"]) * 111_000
        dlon_m = abs(r["elon"] - r["lon"]) * 111_000 * math.cos(
            math.radians(r["lat"])
        )
        shift = math.hypot(dlat_m, dlon_m)
        assert 80 < shift < 300, shift


def test_helmert_composes_through_projections(spark):
    # ED50 -> UTM 31N routes through the 4326 leg machinery
    df = spark.createDataFrame([(2.3522, 48.8566)], ["lon", "lat"])
    src = df.select(point_struct(F.col("lon"), F.col("lat"), 4230).alias("g"))
    out = transform_geom(src, "g", 4230, 32631, out_col="utm")
    r = out.select(st_x("utm").alias("x"), st_y("utm").alias("y")).first()
    # Paris in UTM31N is ~(452000, 5411000); the datum shift moves it ~100 m
    assert r["x"] == pytest.approx(452000, abs=2000)
    assert r["y"] == pytest.approx(5411000, abs=2000)


def test_albers_unit_parallel_scale_on_standard_parallels(spark):
    # Albers' along-parallel scale k = 1 exactly on both standard
    # parallels, < 1 between them, > 1 outside — the conic's defining
    # geometry, independent of the forward-formula implementation
    for sp in (29.5, 45.5):
        k = _scale_along_parallel(spark, 5070, -96.0, sp)
        assert k == pytest.approx(1.0, abs=1e-6), sp
    assert _scale_along_parallel(spark, 5070, -96.0, 37.5) < 1.0 - 1e-6
    assert _scale_along_parallel(spark, 5070, -96.0, 48.5) > 1.0 + 1e-6


def test_albers_preserves_area(spark):
    # equal-area is THE defining property: shoelace area of a projected
    # small quad equals the ellipsoidal patch area M*N*cos(phi)*dphi*dlam
    lon, lat, d = -80.0, 40.0, 1e-3
    quad = [
        _fwd(spark, lon + dx, lat + dy, 5070)
        for dx, dy in ((0, 0), (d, 0), (d, d), (0, d))
    ]
    area = 0.0
    for (x1, y1), (x2, y2) in zip(quad, quad[1:] + quad[:1]):
        area += x1 * y2 - x2 * y1
    area = abs(area) / 2.0
    phi = math.radians(lat)
    sin2 = math.sin(phi) ** 2
    m_rad = (GRS80_A * (1.0 - GRS80_E2)) / (1.0 - GRS80_E2 * sin2) ** 1.5
    n_rad = GRS80_A / math.sqrt(1.0 - GRS80_E2 * sin2)
    patch = (
        m_rad * n_rad * math.cos(phi)
        * math.radians(d) * math.radians(d)
    )
    assert area == pytest.approx(patch, rel=1e-5)


def test_register_projection_row_is_usable_and_validated(spark):
    from carto_etl_spark.functions.geom import (
        _AEA_PARAMS,
        register_projection,
        transform_point as tp,
    )

    # a brand-new (fictional) code becomes usable with ONE registry row
    register_projection(
        "aea", 990001, (30.0, 20.0, 25.0, 35.0, 500000.0, 100000.0, "WGS84")
    )
    try:
        x, y = _fwd(spark, 20.0, 30.0, 990001)
        assert (x, y) == (500000.0, 100000.0)  # origin identity
        df = spark.createDataFrame([(22.5, 28.0)], ["lon", "lat"])
        back = tp(
            tp(point_struct(F.col("lon"), F.col("lat"), 4326), 4326, 990001),
            990001, 4326,
        )
        r = df.select(st_x(back).alias("a"), st_y(back).alias("b")).first()
        assert abs(r["a"] - 22.5) < 1e-6 and abs(r["b"] - 28.0) < 1e-6
    finally:
        _AEA_PARAMS.pop(990001, None)

    with pytest.raises(ValueError, match="family"):
        register_projection("mercator-ish", 990002, ())
    with pytest.raises(ValueError, match="parameters"):
        register_projection("aea", 990002, (1.0, 2.0))
    with pytest.raises(ValueError, match="ellipsoid"):
        register_projection(
            "aea", 990002, (30.0, 20.0, 25.0, 35.0, 0.0, 0.0, "MOON")
        )
    with pytest.raises(ValueError, match="already registered"):
        register_projection(
            "lcc", 5070, (23.0, -96.0, 29.5, 45.5, 0.0, 0.0, "GRS80")
        )


# -- generalized Transverse Mercator family (tmerc) + datum composition -----


def test_bng_core_matches_os_worked_example(spark):
    """OS 'A guide to coordinate systems in Great Britain' worked example:
    OSGB36 geographic 52d39m27.2531sN, 1d43m4.5177sE must project to BNG
    E 651409.903 / N 313177.270.  The TM core (no datum shift — the input
    is already OSGB36) must agree to < 1 mm: this pins the Airy-1830
    Krüger coefficients, k0, the true origin and the meridian-arc offset
    M0 all at once."""
    from carto_etl_spark.functions.geom import _tmerc_core_forward

    lat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
    lon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0
    df = spark.createDataFrame([(lon, lat)], ["lon", "lat"])
    e, n = _tmerc_core_forward(F.col("lon"), F.col("lat"), 27700)
    r = df.select(e.alias("e"), n.alias("n")).first()
    assert abs(r["e"] - 651409.903) < 1e-3
    assert abs(r["n"] - 313177.270) < 1e-3


def test_bng_full_chain_matches_os_etrs89_pair(spark):
    """The same OS worked pair in the ETRS89 direction: ETRS89
    52d39m28.8282sN, 1d42m57.8663sE -> the same BNG point, now THROUGH the
    EPSG-1314 Helmert shift.  A single 7-parameter Helmert approximates
    the OSTN grid to ~3.5 m RMS over GB (the OS guide's own figure), so
    the gate is 5 m — tight enough to catch a sign/convention error (any
    flipped rotation or translation is tens to hundreds of metres)."""
    lat = 52.0 + 39.0 / 60.0 + 28.8282 / 3600.0
    lon = 1.0 + 42.0 / 60.0 + 57.8663 / 3600.0
    df = spark.createDataFrame([(lon, lat)], ["lon", "lat"])
    g = df.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326))
    out = transform_geom(g, "g", 4326, 27700, out_col="bng").first()
    assert abs(out["bng"]["x"] - 651409.903) < 5.0
    assert abs(out["bng"]["y"] - 313177.270) < 5.0


def test_bng_round_trip_over_gb(spark):
    """WGS84 -> 27700 -> WGS84 over a GB-spanning grid stays <= 1e-6 deg
    (~0.1 m) — projection series and the Helmert/inverse-Helmert pair both
    cancel to first order."""
    rows = [
        (x / 10.0, y / 10.0)
        for x in range(-60, 18, 6)
        for y in range(500, 585, 7)
    ]
    df = spark.createDataFrame(rows, ["lon", "lat"])
    g = df.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326))
    fwd = transform_geom(g, "g", 4326, 27700, out_col="bng")
    back = transform_geom(fwd, "bng", 27700, 4326, out_col="w")
    err = back.select(
        F.max(F.abs(F.col("w.x") - F.col("lon"))).alias("dx"),
        F.max(F.abs(F.col("w.y") - F.col("lat"))).alias("dy"),
    ).first()
    assert err["dx"] < 1e-6 and err["dy"] < 1e-6


def test_tmerc_registry_row_validation(spark):
    """tmerc rows validate the ellipsoid (needs a flattening entry) and the
    datum (must be registered or 0); a 0-datum row is usable immediately."""
    from carto_etl_spark.functions.geom import (
        _TMERC_PARAMS,
        register_projection,
    )

    with pytest.raises(ValueError, match="ellipsoid"):
        register_projection(
            "tmerc", 990101, (0.0, 173.0, 0.9996, 1600000.0, 10000000.0,
                              "MOON", 0)
        )
    with pytest.raises(ValueError, match="datum"):
        register_projection(
            "tmerc", 990101, (0.0, 173.0, 0.9996, 1600000.0, 10000000.0,
                              "GRS80", 123456)
        )
    # NZTM2000 (EPSG:2193): TM on GRS80, NZGD2000 ~ WGS84 identity
    register_projection(
        "tmerc", 990101, (0.0, 173.0, 0.9996, 1600000.0, 10000000.0,
                          "GRS80", 0)
    )
    try:
        df = spark.createDataFrame([(174.78, -41.29)], ["lon", "lat"])  # Wellington
        pt = point_struct(F.col("lon"), F.col("lat"), 4326)
        fwd = transform_point(pt, 4326, 990101)
        r = df.select(st_x(fwd).alias("x"), st_y(fwd).alias("y")).first()
        # NZTM Wellington ~ E 1.749e6, N 5.427e6 (coarse sanity: right zone)
        assert abs(r["x"] - 1749000) < 2000 and abs(r["y"] - 5427000) < 2000
        back = transform_point(fwd, 990101, 4326)
        rb = df.select(st_x(back).alias("a"), st_y(back).alias("b")).first()
        assert abs(rb["a"] - 174.78) < 1e-6 and abs(rb["b"] + 41.29) < 1e-6
    finally:
        _TMERC_PARAMS.pop(990101, None)


def test_nad83_utm_rows(spark):
    """NAD83 UTM 14N/15N (EPSG 26914/26915) registry rows: round-trip to
    1e-6 deg, and coordinates within 1 mm of the WGS84 UTM twin zones
    (GRS80 vs WGS84 differ by ~0.1 mm of flattening; NAD83≈WGS84 identity
    datum) — Austin TX and Minneapolis MN."""
    from carto_etl_spark.functions.geom import transform_point as tp

    for srid, wgs_srid, lon, lat in [
        (26914, 32614, -97.74, 30.27),
        (26915, 32615, -93.27, 44.98),
    ]:
        x, y = _fwd(spark, lon, lat, srid)
        xw, yw = _fwd(spark, lon, lat, wgs_srid)
        assert abs(x - xw) < 1e-3 and abs(y - yw) < 1e-3, (srid, x, xw)
        df = spark.createDataFrame([(lon, lat)], ["lon", "lat"])
        back = tp(
            tp(point_struct(F.col("lon"), F.col("lat"), 4326), 4326, srid),
            srid, 4326,
        )
        r = df.select(st_x(back).alias("a"), st_y(back).alias("b")).first()
        assert abs(r["a"] - lon) < 1e-6 and abs(r["b"] - lat) < 1e-6


# -- Hotine oblique Mercator family (omerc): Alaska zone 1, Swiss LV03 ------


def test_omerc_core_matches_epsg_worked_example(spark):
    """EPSG Guidance Note 7-2 §3.2.6 worked example (Timbalai 1948 / RSO
    Borneo, variant B, azimuth != 90): the published test point must land
    within centimetres."""
    from carto_etl_spark.functions.geom import _omerc_core_forward

    lon = 115 + 48 / 60 + 19.8196 / 3600
    lat = 5 + 23 / 60 + 14.1129 / 3600
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    e, n = _omerc_core_forward(F.col("lon"), F.col("lat"), 29873)
    r = df.select(e.alias("e"), n.alias("n")).first()
    assert abs(r["e"] - 679245.73) < 0.01
    assert abs(r["n"] - 596562.78) < 0.01


def test_swiss_core_matches_swisstopo_example(spark):
    """swisstopo's published LV03 example (Rigi): CH1903 geographic ->
    projected, sub-centimetre (the azimuth-90 variant-B special case)."""
    from carto_etl_spark.functions.geom import _omerc_core_forward

    lon = 8 + 29 / 60 + 11.111273 / 3600
    lat = 47 + 3 / 60 + 28.956559 / 3600
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    e, n = _omerc_core_forward(F.col("lon"), F.col("lat"), 21781)
    r = df.select(e.alias("e"), n.alias("n")).first()
    assert abs(r["e"] - 679520.05) < 0.01
    assert abs(r["n"] - 212273.44) < 0.01


def test_swiss_full_chain_origin(spark):
    """WGS84 -> (CH1903 Helmert) -> LV03: the old Bern observatory's WGS84
    position lands within a metre of the (600000, 200000) grid origin —
    validates the datum leg, not just the projection core."""
    df = spark.createDataFrame([(7.4386372, 46.9510811)], "lon double, lat double")
    g = df.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326))
    out = transform_geom(g, "g", 4326, 21781, out_col="sw").first()
    assert abs(out["sw"]["x"] - 600000.0) < 1.0
    assert abs(out["sw"]["y"] - 200000.0) < 1.0


@pytest.mark.parametrize(
    "srid,lon_rng,lat_rng",
    [
        (21781, (6.0, 10.5), (45.9, 47.7)),   # Switzerland
        (26931, (-141.0, -130.0), (54.5, 60.5)),  # AK zone 1 panhandle
    ],
)
def test_omerc_round_trip(spark, srid, lon_rng, lat_rng):
    rows = [
        (lon_rng[0] + (lon_rng[1] - lon_rng[0]) * i / 6.0,
         lat_rng[0] + (lat_rng[1] - lat_rng[0]) * j / 6.0)
        for i in range(7)
        for j in range(7)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double").withColumn(
        "g", point_struct(F.col("lon"), F.col("lat"), 4326)
    )
    fwd = transform_geom(df, "g", 4326, srid, out_col="p")
    back = transform_geom(fwd, "p", srid, 4326, out_col="w")
    m = back.select(
        F.max(F.abs(F.col("w.x") - F.col("lon"))).alias("dx"),
        F.max(F.abs(F.col("w.y") - F.col("lat"))).alias("dy"),
    ).first()
    assert m["dx"] < 1e-6 and m["dy"] < 1e-6


def test_omerc_registry_row_and_validation(spark):
    from carto_etl_spark.functions.geom import (
        _OMERC_PARAMS,
        register_projection,
        transform_point as tp,
    )

    # a new HOM code is one registry row (variant A copy of Alaska-1 with
    # shifted false origin)
    register_projection(
        "omerc",
        990101,
        (57.0, -(133.0 + 40.0 / 60.0), 323.1301023611111, 323.1301023611111,
         0.9999, 0.0, 0.0, "A", "GRS80", 0),
    )
    try:
        df = spark.createDataFrame([(-134.0, 57.5)], ["lon", "lat"])
        back = tp(
            tp(point_struct(F.col("lon"), F.col("lat"), 4326), 4326, 990101),
            990101, 4326,
        )
        r = df.select(st_x(back).alias("a"), st_y(back).alias("b")).first()
        assert abs(r["a"] + 134.0) < 1e-6 and abs(r["b"] - 57.5) < 1e-6
    finally:
        _OMERC_PARAMS.pop(990101, None)

    with pytest.raises(ValueError, match="variant"):
        register_projection(
            "omerc", 990102,
            (57.0, -133.0, 320.0, 320.0, 1.0, 0.0, 0.0, "C", "GRS80", 0),
        )
    with pytest.raises(ValueError, match="parameters"):
        register_projection("omerc", 990102, (1.0, 2.0))


# -- Polar stereographic family (stere): UPS, NSIDC, Antarctic --------------


def test_stere_variant_a_matches_epsg_worked_example(spark):
    """EPSG GN7-2 §3.2.4 variant-A worked example (UPS North): 73N 44E ->
    (3320416.75, 632668.43) within a centimetre."""
    from carto_etl_spark.functions.geom import _stere_core_forward

    df = spark.createDataFrame([(44.0, 73.0)], "lon double, lat double")
    e, n = _stere_core_forward(F.col("lon"), F.col("lat"), 5041)
    r = df.select(e.alias("e"), n.alias("n")).first()
    assert abs(r["e"] - 3320416.75) < 0.01
    assert abs(r["n"] - 632668.43) < 0.01


def test_stere_variant_b_south_matches_epsg_worked_example(spark):
    """EPSG GN7-2 §3.2.4 variant-B worked example (Australian Antarctic,
    EPSG 3032): 75S 120E -> (7255380.79, 7053389.56) within a centimetre —
    pins the derived k0 AND the south-aspect sign conventions."""
    from carto_etl_spark.functions.geom import _stere_core_forward

    df = spark.createDataFrame([(120.0, -75.0)], "lon double, lat double")
    e, n = _stere_core_forward(F.col("lon"), F.col("lat"), 3032)
    r = df.select(e.alias("e"), n.alias("n")).first()
    assert abs(r["e"] - 7255380.79) < 0.01
    assert abs(r["n"] - 7053389.56) < 0.01


@pytest.mark.parametrize(
    "srid,lon_rng,lat_rng",
    [
        # lon endpoints exclusive: the inverse wraps to [-180, 180), so
        # +180 legitimately comes back as -180
        (5041, (-179.5, 179.5), (60.0, 89.5)),    # UPS North
        (5042, (-179.5, 179.5), (-89.5, -60.0)),  # UPS South
        (3413, (-179.5, 179.5), (45.0, 89.5)),    # NSIDC Arctic
        (3031, (-179.5, 179.5), (-89.5, -55.0)),  # Antarctic
    ],
)
def test_stere_round_trip(spark, srid, lon_rng, lat_rng):
    rows = [
        (lon_rng[0] + (lon_rng[1] - lon_rng[0]) * i / 7.0,
         lat_rng[0] + (lat_rng[1] - lat_rng[0]) * j / 6.0)
        for i in range(8)
        for j in range(7)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double").withColumn(
        "g", point_struct(F.col("lon"), F.col("lat"), 4326)
    )
    fwd = transform_geom(df, "g", 4326, srid, out_col="p")
    back = transform_geom(fwd, "p", srid, 4326, out_col="w")
    m = back.select(
        F.max(F.abs(F.col("w.x") - F.col("lon"))).alias("dx"),
        F.max(F.abs(F.col("w.y") - F.col("lat"))).alias("dy"),
    ).first()
    assert m["dx"] < 1e-6 and m["dy"] < 1e-6


def test_stere_registry_validation(spark):
    from carto_etl_spark.functions.geom import register_projection

    with pytest.raises(ValueError, match="variant"):
        register_projection(
            "stere", 990201,
            (90.0, 0.0, 0.994, 0.0, 0.0, "C", "WGS84", 0),
        )
    with pytest.raises(ValueError, match="polar"):
        register_projection(
            "stere", 990201,
            (75.0, 0.0, 0.994, 0.0, 0.0, "A", "WGS84", 0),
        )
    with pytest.raises(ValueError, match="k0"):
        register_projection(
            "stere", 990201,
            (90.0, 0.0, None, 0.0, 0.0, "A", "WGS84", 0),
        )


def test_readme_register_projection_example(spark):
    """The README's F5-envelope worked example (adding NAD83 / Statistics
    Canada Lambert, EPSG:3347, from published parameters) must keep working
    verbatim — it is the documented recipe for the unregistered-EPSG tail.
    Expected values cross-checked against pyproj for Ottawa (-75, 45.4)."""
    from carto_etl_spark.functions.geom import (
        _LCC_PARAMS, point_struct, register_projection, transform_geom,
    )

    if 3347 not in _LCC_PARAMS:  # idempotent under session-scoped reruns
        register_projection("lcc", 3347, (
            63.390675, -91.86666666666666, 49.0, 77.0,
            6200000.0, 3000000.0, "GRS80",
        ))
    df = spark.createDataFrame([(-75.0, 45.4)], "lon double, lat double")
    out = transform_geom(
        df.withColumn("g", point_struct(F.col("lon"), F.col("lat"), 4326)),
        "g", 4326, 3347, out_col="p",
    ).select("p.x", "p.y").first()
    assert abs(out["x"] - 7525428.18) < 0.5
    assert abs(out["y"] - 1202530.33) < 0.5
