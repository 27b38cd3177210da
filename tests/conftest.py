"""Shared fixtures: a session-scoped SparkSession and the canonical coercion
record from the reference test suite (/root/reference/tests/conftest.py:194-215),
as a one-row DataFrame (all CSV-string columns plus one non-string cell)."""

from __future__ import annotations

import importlib.metadata
import os
import subprocess
import sys

import pytest
from pyspark.sql import types as T

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pytest_configure(config):
    """Installability gate: the suite must run against the INSTALLED package,
    not a cwd-import accident.  If the distribution is missing, install it
    editable, offline (`pip install -e . --no-build-isolation`; falls back to
    `setup.py develop` in environments without the `wheel` package, which
    PEP 660 editables require)."""
    # Metadata presence is NOT proof: running pytest from the repo root puts
    # the repo's own carto_etl_spark.egg-info on the scan path, so
    # importlib.metadata resolves the distribution even when site-packages has
    # no install (fresh environment, stale egg-info).  The ground truth is a
    # clean-subprocess import with the repo root stripped from sys.path.
    probe = (
        "import sys, os\n"
        "sys.path = [p for p in sys.path if p not in ('', os.getcwd())]\n"
        "import carto_etl_spark\n"
    )
    if subprocess.run(
        [sys.executable, "-c", probe], cwd=_REPO_ROOT,
        capture_output=True, text=True,
    ).returncode == 0:
        return
    done = subprocess.run(
        [sys.executable, "-m", "pip", "install", "-e", ".",
         "--no-build-isolation", "--quiet"],
        cwd=_REPO_ROOT, capture_output=True, text=True,
    )
    if done.returncode != 0:
        done = subprocess.run(
            [sys.executable, "setup.py", "develop"],
            cwd=_REPO_ROOT, capture_output=True, text=True,
        )
    if done.returncode != 0:
        raise RuntimeError(
            f"editable install failed:\n{done.stdout}\n{done.stderr}"
        )
    importlib.metadata.distribution("carto-etl-spark")  # must resolve now


from carto_etl_spark.config import JobConfig
from carto_etl_spark.session import get_spark

DATE_COLUMNS = (
    "date_col,date_col2,date_col3,date_col4,wrong_date_col,wrong_date_col2"
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="carto-etl-spark-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def record_df(spark):
    """The reference's 18-key ``record`` fixture as a DataFrame.  String cells
    stay strings (CSV semantics); ``unescapable`` is an int cell, which the
    reference renders as NULL (tests/test_etl.py:40-41)."""
    schema = T.StructType(
        [T.StructField(name, T.StringType()) for name in [
            "lon", "lat", "text_col", "int_col", "float_col",
            "float_comma_col", "escape_col", "wrong_lon", "wrong_lat",
            "the_geom", "date_col", "date_col2", "date_col3", "date_col4",
            "wrong_date_col", "wrong_date_col2", "forbidden_float",
        ]]
        + [T.StructField("unescapable", T.LongType())]
    )
    row = (
        "1", "2", "a", "1", "1.0", "1,5", "t'est", "181", "91",
        "123123123", "01/09/2017 2:47:25", "01/09/2017",
        "01/09/2017 22:47:25", "01-09-2017 2:47:25", "zzz", "",
        "INFINITY", 1,
    )
    return spark.createDataFrame([row], schema)


def _base_cfg(**overrides):
    base = dict(
        table_name="MYTABLE",
        delimiter=",",
        columns="",
        date_columns=DATE_COLUMNS,
        chunk_size=500,
        max_attempts=3,
        file_encoding="utf-8",
        date_format="%d/%m/%Y",
        datetime_format="%d/%m/%Y %H:%M:%S",
        x_column="lon",
        y_column="lat",
        srid="4326",
    )
    base.update(overrides)
    return JobConfig.from_kwargs(**base)


@pytest.fixture(scope="session")
def cfg_default():
    return _base_cfg()


@pytest.fixture(scope="session")
def cfg_no_geometry():
    return _base_cfg(force_no_geometry=True)


@pytest.fixture(scope="session")
def cfg_wrong_geom():
    return _base_cfg(x_column="wrong_lon", y_column="wrong_lat")


@pytest.fixture(scope="session")
def cfg_force_the_geom():
    return _base_cfg(force_the_geom="the_geom")


@pytest.fixture(scope="session")
def cfg_float():
    return _base_cfg(float_comma_separator=",", float_thousand_separator=".")
