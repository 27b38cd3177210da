"""Theil-Sen robust trend (operators/anomaly.py:theil_sen): exact median
slope on clean fixtures, robustness to outliers that wreck least squares,
per-key independence, the vertical-pair exclusion, and degenerate keys."""

from __future__ import annotations

from carto_etl_spark.operators.anomaly import theil_sen


def _run(spark, rows, cap=64):
    df = spark.createDataFrame(rows, "g string, x double, y double, k long")
    return {
        r["g"]: r
        for r in theil_sen(df, ["g"], "x", "y", "k", sample_cap=cap).collect()
    }


def test_exact_line_recovers_slope(spark):
    rows = [("a", float(i), 3.0 * i + 7.0, i) for i in range(20)]
    out = _run(spark, rows)
    assert out["a"]["slope"] == 3.0
    assert out["a"]["n_points"] == 20
    assert out["a"]["n_pairs"] == 190


def test_outliers_cannot_move_the_median_slope(spark):
    """A quarter of the points replaced by wild outliers: the pairwise-
    median slope stays exactly 2.0 while an OLS fit would be dragged far
    off — the property the estimator exists for."""
    rows = [("a", float(i), 2.0 * i, i) for i in range(16)]
    for j in range(4):  # 4/20 outliers, y blown up
        rows.append(("a", float(20 + j), 1e6 + j * 1e5, 100 + j))
    out = _run(spark, rows)
    assert out["a"]["slope"] == 2.0


def test_keys_are_independent_and_vertical_pairs_excluded(spark):
    rows = [("up", float(i), 5.0 * i, i) for i in range(10)]
    rows += [("down", float(i), -1.0 * i, 50 + i) for i in range(10)]
    # a key where every x is identical: no valid pairs -> NULL slope
    rows += [("flatx", 1.0, float(i), 200 + i) for i in range(5)]
    out = _run(spark, rows)
    assert out["up"]["slope"] == 5.0
    assert out["down"]["slope"] == -1.0
    assert out["flatx"]["slope"] is None and out["flatx"]["n_pairs"] == 0


def test_sample_cap_bounds_pairs(spark):
    rows = [("a", float(i), 1.5 * i, i) for i in range(500)]
    out = _run(spark, rows, cap=20)
    assert out["a"]["n_points"] <= 30  # binomial around 20
    assert out["a"]["n_pairs"] <= 30 * 29 // 2
    assert abs(out["a"]["slope"] - 1.5) < 1e-12


def test_single_point_key(spark):
    out = _run(spark, [("a", 1.0, 2.0, 1)])
    assert out["a"]["n_points"] == 1 and out["a"]["n_pairs"] == 0
    assert out["a"]["slope"] is None
