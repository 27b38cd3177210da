"""The reference's 27 golden assertions (/root/reference/tests/test_etl.py:1-88)
ported to column expressions.  These goldens are the semantic contract of the
coercion + geometry layer; each test cites the reference assertion it mirrors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.config import JobConfig, coerce_kwarg
from carto_etl_spark.functions.coerce import (
    escape_expr,
    float_expr,
    render_value_expr,
    strptime_to_spark,
    timestamp_expr,
)
from carto_etl_spark.functions.geom import (
    coord_expr,
    render_geom_expr,
    validated_lat,
    validated_lon,
)


def one(df, expr):
    return df.select(expr.alias("v")).first()["v"]


def render(record_df, column, cfg, **kw):
    return one(record_df, render_value_expr(record_df, column, cfg, **kw))


# -- config construction (test_etl.py:4-14) ---------------------------------

def test_config_kwarg_coercion():
    assert coerce_kwarg("4326") == 4326
    assert coerce_kwarg("true") is True
    assert coerce_kwarg("False") is False
    assert coerce_kwarg("utf-8") == "utf-8"


def test_upload_job_args():
    cfg = JobConfig.from_kwargs(x_column="longitude", srid="4326", level=30)
    assert cfg.x_column == "longitude"
    assert cfg.srid == 4326
    assert cfg.extras["level"] == 30


# -- escaping (test_etl.py:16-20) -------------------------------------------

def test_escape_single_quote(record_df):
    assert one(record_df, escape_expr("escape_col")) == "t''est"


def test_escape_value(record_df):
    assert one(record_df, escape_expr("text_col")) == "a"


# -- coordinate extraction + bounds (test_etl.py:22-32) ---------------------

def test_get_longitude(record_df, cfg_default):
    lon = validated_lon(coord_expr(record_df, cfg_default, "lon"))
    assert one(record_df, lon) == 1.0


def test_get_latitude(record_df, cfg_default):
    lat = validated_lat(coord_expr(record_df, cfg_default, "lat"))
    assert one(record_df, lat) == 2.0


def test_wrong_longitude(record_df, cfg_wrong_geom):
    lon = validated_lon(coord_expr(record_df, cfg_wrong_geom, "wrong_lon"))
    assert one(record_df, lon) is None


def test_wrong_latitude(record_df, cfg_wrong_geom):
    lat = validated_lat(coord_expr(record_df, cfg_wrong_geom, "wrong_lat"))
    assert one(record_df, lat) is None


# -- type-dispatch render (test_etl.py:34-50) -------------------------------

def test_parse_text_column(record_df, cfg_default):
    assert render(record_df, "text_col", cfg_default) == "'a',"


def test_parse_non_existent_column(record_df, cfg_default):
    assert render(record_df, "non_existent", cfg_default) == "NULL,"


def test_parse_unescapable_column(record_df, cfg_default):
    assert render(record_df, "unescapable", cfg_default) == "NULL,"


def test_parse_int_column(record_df, cfg_default):
    assert render(record_df, "int_col", cfg_default) == "1.0,"


def test_parse_float_column(record_df, cfg_default):
    assert render(record_df, "float_col", cfg_default) == "1.0,"


def test_parse_float_comma_column(record_df, cfg_float):
    assert render(record_df, "float_comma_col", cfg_float) == "1.5,"


# -- geometry construction (test_etl.py:52-62) ------------------------------

def test_create_geom_query_no_geometry(record_df, cfg_no_geometry):
    assert one(record_df, render_geom_expr(record_df, cfg_no_geometry)) == "NULL,"


def test_create_wrong_geom_query(record_df, cfg_wrong_geom):
    assert one(record_df, render_geom_expr(record_df, cfg_wrong_geom)) == "NULL,"


def test_create_geom_query(record_df, cfg_default):
    assert (
        one(record_df, render_geom_expr(record_df, cfg_default))
        == "st_transform(st_setsrid(st_makepoint(1.0, 2.0), 4326), 4326),"
    )


def test_create_the_geom_query(record_df, cfg_force_the_geom):
    assert (
        one(record_df, render_geom_expr(record_df, cfg_force_the_geom))
        == "'123123123',"
    )


# -- date parsing (test_etl.py:63-80) ---------------------------------------

def test_parse_date(record_df, cfg_default):
    assert render(record_df, "date_col", cfg_default) == "'2017-09-01 02:47:25+00',"


def test_parse_date2(record_df, cfg_default):
    assert render(record_df, "date_col2", cfg_default) == "'2017-09-01 00:00:00+00',"


def test_parse_date3(record_df, cfg_default):
    assert render(record_df, "date_col3", cfg_default) == "'2017-09-01 22:47:25+00',"


def test_parse_date4_bad_format(record_df, cfg_default):
    # Reference: parse_date_column raises ValueError (test_etl.py:72-74);
    # in the engine's lazy layer that surfaces as NULL from the dual parse.
    ts = timestamp_expr(
        F.col("date_col4"), cfg_default.datetime_format, cfg_default.date_format
    )
    assert one(record_df, ts) is None
    assert render(record_df, "date_col4", cfg_default) == "NULL,"


def test_parse_wrong_date(record_df, cfg_default):
    assert render(record_df, "wrong_date_col", cfg_default) == "NULL,"


def test_parse_wrong_date2(record_df, cfg_default):
    assert render(record_df, "wrong_date_col2", cfg_default) == "NULL,"


# -- forbidden float (test_etl.py:85-88) ------------------------------------

def test_parse_forbidden_float_column(record_df, cfg_default):
    assert render(record_df, "forbidden_float", cfg_default) == "'INFINITY',"
    assert one(record_df, float_expr("forbidden_float")) is None


# -- strptime translation (engine-specific) ---------------------------------

def test_strptime_to_spark():
    assert strptime_to_spark("%d/%m/%Y %H:%M:%S") == "d/M/yyyy H:m:s"
    assert strptime_to_spark("%Y-%m-%d") == "yyyy-M-d"
    with pytest.raises(ValueError):
        strptime_to_spark("%Q")
