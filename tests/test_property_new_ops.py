"""Hypothesis property tests for the newest operators: skyline equals
brute force on arbitrary point sets, int8 quantization honors its error
bound and python replay on arbitrary vectors, and the mixture plan
conserves the budget for arbitrary weighted corpora.  Few examples per
property (each runs Spark jobs), sized like test_coercion_property."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from carto_etl_spark.operators.mixing import epoch_plan
from carto_etl_spark.operators.quantize import quantize_int8
from carto_etl_spark.operators.skyline import pareto_frontier

# conftest's session fixture can't inject into @given; grab lazily
_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from carto_etl_spark.session import get_spark

        _spark = get_spark(master="local[4]", shuffle_partitions=4)
    return _spark


small_int = st.integers(min_value=-20, max_value=20)
points = st.lists(
    st.tuples(small_int, small_int), min_size=1, max_size=60
)


def _brute_skyline(pts):
    pts = sorted(set(pts))
    return sorted(
        p
        for p in pts
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
        )
    )


@settings(max_examples=10, deadline=None)
@given(points, st.integers(min_value=1, max_value=9))
def test_skyline_equals_brute_force(pts, n_buckets):
    spark = _get_spark()
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = sorted(
        (int(r["x"]), int(r["y"]))
        for r in pareto_frontier(df, "x", "y", n_buckets=n_buckets).collect()
    )
    assert got == _brute_skyline(pts)


finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
vectors = st.lists(finite, min_size=1, max_size=16)


@settings(max_examples=10, deadline=None)
@given(st.lists(vectors, min_size=1, max_size=8))
def test_quantize_bound_and_python_replay(vecs):
    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        maxabs = max(abs(x) for x in v)
        scale = maxabs / 127.0
        q = rows[i]["q_vec"]
        if scale == 0.0:
            # all-zero vector, OR a denormal maxabs whose /127 underflows
            # to 0.0 (hypothesis found 5e-324): both quantize to zeros —
            # the operator and the SQL oracle gate on scale == 0 alike
            assert q == [0] * len(v)
            continue
        for x, code in zip(v, q):
            assert code == int(math.floor(x / scale + 0.5))
            assert abs(code) <= 127
            assert abs(code * scale - x) <= scale / 2.0 + 1e-9


sources = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=1000),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(sources, st.integers(min_value=1, max_value=5))
def test_mixture_plan_conserves_budget(rows, k):
    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(rows)],
        "doc_id long, source string, n_chars long",
    )
    plan = epoch_plan(
        df, "source", "n_chars", {"a": 3.0}, budget_multiple=k
    ).collect()
    total = sum(r["have"] for r in plan)
    # targets sum to k x corpus; each source's repeat decomposition is
    # consistent: full_copies <= target/have < full_copies + 1
    assert sum(r["target_size"] for r in plan) == max(
        0.0, float(k * total)
    ) or abs(sum(r["target_size"] for r in plan) - k * total) < 1e-6
    for r in plan:
        rpt = r["target_size"] / float(r["have"])
        assert r["full_copies"] == int(math.floor(rpt))
        assert 0 <= r["frac_threshold"] < 2147483647
