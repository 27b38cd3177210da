"""Catalog wiring consistency: every query has an oracle, bench names are
real, and the driver entry module exposes the same catalog.  Pure-python —
no Spark session — so it runs first and fails fast on registration drift."""

import importlib.util
import os


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_query_has_an_oracle_and_vice_versa():
    from carto_etl_spark.queries import ORACLES, QUERIES

    assert set(QUERIES) == set(ORACLES)
    assert all(callable(f) for f in QUERIES.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in ORACLES.values())


def test_bench_list_is_a_subset_of_the_catalog():
    from carto_etl_spark.queries import QUERIES

    import bench

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_driver_entry_module_mirrors_the_catalog():
    from carto_etl_spark.queries import ORACLES, QUERIES

    entry = _load_entry()
    assert set(entry.queries()) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLES)
    assert callable(entry.entry)
