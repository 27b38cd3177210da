"""Property tests: connected-components labeling vs a union-find reference,
and Morton interleave vs plain Python bit arithmetic.  One hypothesis case
drives a whole batch through Spark (a Spark job per example is too slow)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from carto_etl_spark.functions.geom import morton_expr
from carto_etl_spark.operators.dedup import min_label_components


def _union_find_roots(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to the component MINIMUM (paths fully compressed)
    return {n: find(n) for n in parent}


edge = st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(
    lambda e: e[0] != e[1]
)


@settings(max_examples=10, deadline=None)
@given(st.lists(edge, min_size=1, max_size=60))
def test_min_label_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["root"] for r in min_label_components(pairs).collect()
    }
    assert got == _union_find_roots(edges)


@settings(max_examples=5, deadline=None)
@given(st.lists(edge, min_size=1, max_size=60))
def test_min_label_components_assume_distinct_tolerates_dups(spark, edges):
    """assume_distinct=True (the minhash_dedup fast path, r11) must stay
    correct even when the caller's contract is violated and duplicate
    edges slip through — every labeling tier is idempotent per edge, so
    the flag may only change plan shape, never the labeling."""
    dup_edges = edges + edges[: len(edges) // 2]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in dup_edges], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["root"]
        for r in min_label_components(pairs, assume_distinct=True).collect()
    }
    assert got == _union_find_roots(edges)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, (1 << 12) - 1), st.integers(0, (1 << 12) - 1)),
        min_size=1,
        max_size=50,
    )
)
def test_morton_matches_python_interleave(spark, points):
    zoom = 12

    def py_morton(x, y):
        out = 0
        for i in range(zoom):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(points, ["x", "y"])
    rows = df.select(
        "x", "y", morton_expr(F.col("x"), F.col("y"), zoom).alias("m")
    ).collect()
    for r in rows:
        assert r["m"] == py_morton(r["x"], r["y"])


def test_min_label_driver_matches_distributed(spark):
    # the driver union-find fast path and the distributed fixpoint must
    # produce identical labelings (valley chain + two components + isolate
    # pair exercises the min-crossing case)
    edges = [(2, 5), (5, 1), (7, 8), (3, 9), (9, 4), (11, 12)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {
        r["node"]: r["root"] for r in min_label_components(pairs).collect()
    }
    dist = {
        r["node"]: r["root"]
        for r in min_label_components(
            pairs, driver_threshold_edges=0
        ).collect()
    }
    assert fast == dist == _union_find_roots(edges)


def test_min_label_numpy_tier_matches_other_paths(spark):
    # force each tier on the same messy graph (valley chains, a 6-hop
    # chain, two components, duplicate/reversed edges) and require
    # identical labelings
    edges = [
        (2, 5), (5, 1), (1, 4), (4, 6), (6, 2),          # cycle w/ valley
        (20, 26), (26, 24), (24, 21), (21, 23), (23, 25),  # deep chain
        (7, 8), (8, 7), (7, 8),                           # dupes/reversed
        (100, 50),
    ]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])

    def run(**kw):
        return {
            r["node"]: r["root"]
            for r in min_label_components(pairs, **kw).collect()
        }

    uf = run()  # 14 edges <= union-find tier
    np_tier = run(driver_threshold_edges=1)  # >1 edge -> numpy tier
    dist = run(driver_threshold_edges=0)  # forces distributed
    assert uf == np_tier == dist
    assert np_tier[26] == 20 and np_tier[5] == 1 and np_tier[100] == 50


def test_min_label_numpy_tier_skips_string_ids(spark):
    # non-integer node ids can't go through the numpy tier; it must fall
    # through to the distributed fixpoint and still label correctly
    pairs = spark.createDataFrame(
        [("b", "e"), ("e", "a"), ("x", "y")], ["id_a", "id_b"]
    )
    out = {
        r["node"]: r["root"]
        for r in min_label_components(
            pairs, driver_threshold_edges=1
        ).collect()
    }
    assert out == {"a": "a", "b": "a", "e": "a", "x": "x", "y": "x"}
