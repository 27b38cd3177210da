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


def test_every_catalog_entry_is_benched_or_excluded_with_reason():
    """No silently-unbenched entry (r7 verdict #5): the catalog must be
    EXACTLY the disjoint union of BENCH_QUERIES and bench.EXCLUDED, and
    every exclusion must carry a non-trivial reason string."""
    from carto_etl_spark.queries import QUERIES

    import bench

    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.EXCLUDED)
    assert not benched & excluded, benched & excluded
    unaccounted = set(QUERIES) - benched - excluded
    assert not unaccounted, f"silently unbenched: {sorted(unaccounted)}"
    stale = excluded - set(QUERIES)
    assert not stale, f"EXCLUDED names not in catalog: {sorted(stale)}"
    for name, reason in bench.EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) > 20, name


def test_driver_entry_module_mirrors_the_catalog():
    from carto_etl_spark.queries import ORACLES, QUERIES

    entry = _load_entry()
    assert set(entry.queries()) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLES)
    assert callable(entry.entry)


def test_no_duplicate_toplevel_oracle_constants():
    """A re-used module-level ORACLE_* name silently SHADOWS the earlier
    definition and mis-oracles whichever entry registered first (bit us in
    round 5: a second ORACLE_SCD2 turned scd2_intervals red).  Parse the
    module source and reject duplicate top-level assignment names."""
    import ast
    import collections
    import inspect

    from carto_etl_spark import queries

    tree = ast.parse(inspect.getsource(queries))
    names = collections.Counter(
        t.id
        for node in tree.body
        if isinstance(node, ast.Assign)
        for t in node.targets
        if isinstance(t, ast.Name) and t.id.startswith("ORACLE")
    )
    dupes = {n: c for n, c in names.items() if c > 1}
    assert not dupes, f"shadowed oracle constants: {dupes}"
