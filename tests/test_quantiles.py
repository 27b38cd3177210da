"""Hash-threshold sample quantiles (operators/quantiles.py): bit-level
determinism against a pure-python re-derivation, partitioning independence
(the property GK/KLL sketches lack and the reason this design is
oracle-checkable), merge = filter-over-union, self-graded rank error, and
edge shapes (empty input, q=1, tiny samples)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from carto_etl_spark.operators import quantiles as qt
from carto_etl_spark.operators.sampling import LEHMER_A, LEHMER_M


def _py_hash(k: int, salt: int = 0) -> int:
    """Python twin of sampling.hash_expr for reference computation."""
    x = (k + salt) % LEHMER_M
    x = (x * LEHMER_A) % LEHMER_M
    x ^= x >> 16
    x = (x * LEHMER_A) % LEHMER_M
    x ^= x >> 13
    return (x * LEHMER_A) % LEHMER_M


def _rows(n):
    # values deliberately NOT monotone in the key so rank order != key order
    return [((k * 37) % n + 0.5, k) for k in range(n)]


def _df(spark, n, parts=4):
    return spark.createDataFrame(_rows(n), "v double, k long").repartition(parts)


def _reference(n, probs, target, salt=0):
    """Pure-python re-derivation of the whole operator."""
    rows = _rows(n)
    cutoff = int(min(1.0, target / n) * LEHMER_M)
    sample = sorted(
        [(v, k) for v, k in rows if _py_hash(k, salt) < cutoff]
    )
    m = len(sample)
    out = {}
    for q in probs:
        r = max(1, min(m, math.ceil(q * m)))
        est = sample[r - 1][0]
        true_rank = sum(1 for v, _ in rows if v < est)
        out[q] = (est, m, true_rank)
    return out


def test_matches_python_reference(spark):
    probs = [0.25, 0.5, 0.75]
    res = {
        r["q"]: r
        for r in qt.sample_quantiles(
            _df(spark, 500), "v", "k", probs, target_sample=100
        ).collect()
    }
    ref = _reference(500, probs, 100)
    for q in probs:
        est, m, true_rank = ref[q]
        assert res[q]["est"] == est
        assert res[q]["sample_m"] == m
        assert res[q]["true_rank"] == true_rank
        assert res[q]["n_total"] == 500
        assert res[q]["true_frac"] == true_rank / 500
        assert res[q]["rank_err"] == true_rank / 500 - q


def test_partitioning_independent(spark):
    probs = [0.125, 0.5, 0.875]
    a = qt.sample_quantiles(_df(spark, 400, parts=1), "v", "k", probs, 80)
    b = qt.sample_quantiles(_df(spark, 400, parts=13), "v", "k", probs, 80)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_merge_is_filter_over_union(spark):
    """The sample is a pure per-row filter, so sketching a union equals
    unioning the per-part sketches: quantiles over (A ∪ B) must equal
    quantiles computed from the concatenation of A's and B's kept rows.
    Verified at the estimate level: run on the union vs on the two halves
    re-unioned, with the cutoff pinned by passing the union's total."""
    rows = _rows(600)
    a = spark.createDataFrame(rows[:300], "v double, k long")
    b = spark.createDataFrame(rows[300:], "v double, k long")
    union_res = qt.sample_quantiles(
        a.unionByName(b), "v", "k", [0.5], target_sample=120
    ).collect()
    # same cutoff on each half (total pinned to the union's n), then union
    from carto_etl_spark.operators.sampling import hash_expr

    cutoff = qt.sample_cutoff(120, 600)
    kept = (
        a.where(hash_expr("k") < F.lit(cutoff))
        .unionByName(b.where(hash_expr("k") < F.lit(cutoff)))
        .count()
    )
    assert union_res[0]["sample_m"] == kept


def test_rank_error_within_dkw_bound(spark):
    """Self-graded error: |true_frac - q| should sit within the DKW-style
    bound sqrt(ln(2/delta)/(2m)) at delta=0.001 — loose, but catches a
    broken sampler or rank pass outright."""
    res = qt.sample_quantiles(
        _df(spark, 2000), "v", "k", [0.25, 0.5, 0.75], target_sample=400
    ).collect()
    for r in res:
        bound = math.sqrt(math.log(2 / 0.001) / (2 * r["sample_m"]))
        assert abs(r["rank_err"]) <= bound, (r, bound)


def test_q_one_returns_sample_max_and_tiny_q_first(spark):
    res = {
        r["q"]: r["est"]
        for r in qt.sample_quantiles(
            _df(spark, 300), "v", "k", [0.0009765625, 1.0], target_sample=60
        ).collect()
    }
    ref = _reference(300, [0.0009765625, 1.0], 60)
    assert res[1.0] == ref[1.0][0]
    assert res[0.0009765625] == ref[0.0009765625][0]


def test_empty_input_yields_empty_frame(spark):
    empty = spark.createDataFrame([], "v double, k long")
    out = qt.sample_quantiles(empty, "v", "k", [0.5], target_sample=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "q", "est", "sample_m", "n_total", "true_rank", "true_frac", "rank_err",
    ]


def test_nulls_excluded_like_sql_percentile(spark):
    rows = [(float(k), k) for k in range(100)] + [(None, 1000 + k) for k in range(50)]
    df = spark.createDataFrame(rows, "v double, k long")
    res = qt.sample_quantiles(df, "v", "k", [0.5], target_sample=100).collect()
    assert res[0]["n_total"] == 100  # nulls never enter n or the sample


# -- grouped variant ---------------------------------------------------------


def _gdf(spark, sizes, parts=4):
    rows = []
    k = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((g, ((k * 37) % 997) + 0.5, k))
            k += 1
    return spark.createDataFrame(rows, "g string, v double, k long").repartition(parts)


def _g_reference(spark_rows, probs, target):
    by_g = {}
    for g, v, k in spark_rows:
        by_g.setdefault(g, []).append((v, k))
    out = {}
    for g, rows in by_g.items():
        n = len(rows)
        cutoff = int(min(1.0, target / n) * LEHMER_M)
        sample = sorted((v, k) for v, k in rows if _py_hash(k) < cutoff)
        m = len(sample)
        for q in probs:
            r = max(1, min(m, math.ceil(q * m)))
            out[(g, q)] = (sample[r - 1][0], m, n)
    return out


def test_grouped_matches_python_reference(spark):
    sizes = {"a": 400, "b": 90, "c": 7}
    probs = [0.25, 0.5, 0.75]
    df = _gdf(spark, sizes)
    res = {
        (r["g"], r["q"]): (r["est"], r["sample_m"], r["n_total"])
        for r in qt.group_sample_quantiles(
            df, ["g"], "v", "k", probs, target_per_group=50
        ).collect()
    }
    rows = [(r["g"], r["v"], r["k"]) for r in df.collect()]
    assert res == _g_reference(rows, probs, 50)
    # per-group rates actually differ: the big group is subsampled, the
    # 7-row group keeps everything
    assert res[("c", 0.25)][1] == 7
    assert res[("a", 0.25)][1] < 400


def test_grouped_partitioning_independent(spark):
    sizes = {"a": 300, "b": 60}
    a = qt.group_sample_quantiles(_gdf(spark, sizes, parts=1), ["g"], "v", "k", [0.5], 40)
    b = qt.group_sample_quantiles(_gdf(spark, sizes, parts=11), ["g"], "v", "k", [0.5], 40)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_grouped_no_unpartitioned_window(spark):
    from carto_etl_spark.plans.inspect import unpartitioned_windows

    df = _gdf(spark, {"a": 50, "b": 50})
    out = qt.group_sample_quantiles(df, ["g"], "v", "k", [0.5], 20)
    assert not unpartitioned_windows(out)


# -- equi-depth histogram ----------------------------------------------------


def test_equi_depth_buckets_are_balanced_even_under_skew(spark):
    """Heavily skewed values (90% in a narrow band) must still produce
    near-equal bucket populations — the property equi-WIDTH histograms
    lose and this operator exists for.  Counts are exact; only boundary
    placement carries sample error."""
    rows = []
    for k in range(2000):
        v = (k % 10) * 0.01 if k % 10 < 9 else 100.0 + k  # 90% in [0, 0.09]
        rows.append((float(v), k))
    df = spark.createDataFrame(rows, "v double, k long")
    hist = {r["bucket"]: r["n"]
            for r in qt.equi_depth_histogram(df, "v", "k", 4, 400).collect()}
    assert sum(hist.values()) == 2000  # exact total
    for b, n in hist.items():
        assert 350 <= n <= 700, hist  # ~500 each within sample error


def test_equi_depth_boundaries_are_data_values_and_sorted(spark):
    df = spark.createDataFrame(
        [((k * 37 % 500) + 0.5, k) for k in range(500)], "v double, k long"
    )
    bounds = qt.equi_depth_boundaries(df, "v", "k", 8, 200)
    assert len(bounds) == 7
    assert bounds == sorted(bounds)
    values = {r["v"] for r in df.collect()}
    assert all(b in values for b in bounds)  # lower empirical quantiles


def test_equi_depth_empty_input(spark):
    df = spark.createDataFrame([], "v double, k long")
    assert qt.equi_depth_boundaries(df, "v", "k", 8, 100) == []
    assert qt.equi_depth_histogram(df, "v", "k", 8, 100).count() == 0
