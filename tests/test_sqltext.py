"""SQL-text compat sink: generated DML must match the reference's string
assembly (header shape, per-row parens, trailing-comma trims, value renders
from the golden layer)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from carto_etl_spark.config import JobConfig
from carto_etl_spark.operators.sqltext import (
    delete_statements,
    insert_statements,
    update_statements,
)


@pytest.fixture(scope="module")
def src(spark):
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in ["a", "b", "lon", "lat"]]
    )
    return spark.createDataFrame(
        [
            ("x1", "1", "1", "2"),
            ("it's", "", "181", "2"),   # escaped quote, blank -> NULL, bad lon
        ],
        schema,
    )


@pytest.fixture(scope="module")
def cfg():
    return JobConfig.from_kwargs(
        table_name="mytable", columns="a,b", chunk_size=10
    )


def test_insert_statements(src, cfg):
    out = insert_statements(src, cfg).collect()
    assert len(out) == 1
    stmt = out[0]["statement"]
    assert stmt == (
        "insert into mytable (the_geom,a,b) values"
        " (st_transform(st_setsrid(st_makepoint(1.0, 2.0), 4326), 4326),'x1',1.0),"
        " (NULL,'it''s',NULL)"
    )


def test_insert_statements_chunking(spark, cfg):
    schema = T.StructType([T.StructField("a", T.StringType())])
    df = spark.createDataFrame([(f"r{i}",) for i in range(25)], schema)
    c = JobConfig.from_kwargs(table_name="t", columns="a", chunk_size=10,
                              force_no_geometry=True)
    out = insert_statements(df, c).collect()
    assert len(out) == 3  # 10 + 10 + 5
    counts = sorted(r["statement"].count("(NULL,") for r in out)
    assert counts == [5, 10, 10]


def test_delete_statements(spark):
    schema = T.StructType([T.StructField("id", T.StringType())])
    df = spark.createDataFrame([("1",), ("x'y",), ("3",)], schema)
    cfg = JobConfig.from_kwargs(table_name="t", columns="id", chunk_size=100)
    cfg.id_column = "id"
    out = delete_statements(df, cfg).collect()
    assert out[0]["statement"] == "delete from t where id in (1.0,'x''y',3.0)"


def test_update_statements(src, cfg):
    c = JobConfig.from_kwargs(table_name="mytable", columns="a,b", chunk_size=10)
    c.id_column = "a"
    out = {r["row_idx"]: r["statement"] for r in update_statements(src, c).collect()}
    # string id -> quoted + escaped; numeric b rendered bare; geom expr
    # present; reference-exact double space after "set" and no separator
    # between SET items (etl/etl.py:332-340)
    assert out[0] == (
        "update mytable set  the_geom = "
        "st_transform(st_setsrid(st_makepoint(1.0, 2.0), 4326), 4326),"
        "b = 1.0 where a = 'x1'"
    )
    assert out[1].endswith("where a = 'it''s'")


def test_unsafe_identifier_rejected(src):
    bad = JobConfig.from_kwargs(
        table_name="t; drop table x", columns="a", chunk_size=10
    )
    with pytest.raises(ValueError, match="unsafe"):
        insert_statements(src, bad)
