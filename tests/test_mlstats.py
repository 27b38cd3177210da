"""Exact-arithmetic evaluation statistics (operators/mlstats.py): AUC, KS,
Gini, Benford, correlation — hand-computed small cases plus cross-checks
against scipy-free closed forms."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.mlstats import (
    auc,
    benford,
    corr_matrix,
    gini,
    ks_statistic,
)


def test_auc_perfect_separation(spark):
    # all positives score above all negatives -> AUC = 1
    df = spark.createDataFrame(
        [(1.0, "n"), (2.0, "n"), (3.0, "p"), (4.0, "p")], ["v", "lab"]
    )
    row = auc(df, "v", F.col("lab") == "p").first()
    assert (row["n_pos"], row["n_neg"]) == (2, 2)
    assert row["auc"] == 1.0


def test_auc_ties_get_half_credit(spark):
    # one positive tied with one negative at 2.0:
    # pairs: (2p vs 1n)=1, (2p vs 2n)=0.5, (3p vs 1n)=1, (3p vs 2n)=1
    # AUC = 3.5/4
    df = spark.createDataFrame(
        [(1.0, "n"), (2.0, "n"), (2.0, "p"), (3.0, "p")], ["v", "lab"]
    )
    row = auc(df, "v", F.col("lab") == "p").first()
    assert row["auc"] == pytest.approx(3.5 / 4, abs=0)


def test_auc_random_is_half(spark):
    # identical distributions -> AUC = 0.5
    rows = [(float(i % 5), "p" if i % 2 else "n") for i in range(20)]
    df = spark.createDataFrame(rows, ["v", "lab"])
    row = auc(df, "v", F.col("lab") == "p").first()
    assert row["auc"] == pytest.approx(0.5, abs=1e-12)


def test_ks_disjoint_distributions(spark):
    # a-values all below b-values -> D = 1
    rows = [(1.0, "a"), (2.0, "a"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, ["v", "g"])
    row = ks_statistic(
        df, "v", F.col("g") == "a", F.col("g") == "b"
    ).first()
    assert row["d"] == 1.0
    assert row["d_scaled"] == row["n_a"] * row["n_b"]


def test_ks_identical_distributions(spark):
    rows = [(float(v), g) for v in (1, 2, 3) for g in ("a", "b")]
    df = spark.createDataFrame(rows, ["v", "g"])
    row = ks_statistic(
        df, "v", F.col("g") == "a", F.col("g") == "b"
    ).first()
    assert row["d"] == 0.0


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame([(i, 10) for i in range(4)], ["id", "x"])
    row = gini(df, "x", "id").first()
    assert row["gini"] == pytest.approx(0.0, abs=1e-12)
    assert row["total"] == 40


def test_gini_total_concentration(spark):
    # one entity holds everything: G = (n-1)/n
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 100)], ["id", "x"]
    )
    row = gini(df, "x", "id").first()
    assert row["gini"] == pytest.approx(3 / 4, abs=1e-12)


def test_gini_hand_case(spark):
    # x = [1, 2, 3, 4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["id", "x"]
    )
    row = gini(df, "x", "id").first()
    assert row["gini"] == pytest.approx(0.25, abs=1e-12)


def test_benford_digit_extraction(spark):
    df = spark.createDataFrame(
        [(0.01,), (0.19,), (123.45,), (999.99,), (2.0,), (-5.0,), (0.0,)],
        ["v"],
    )
    rows = {r["digit"]: r["n"] for r in benford(df, "v").collect()}
    # 0.01 -> cents 1 -> digit 1; 0.19 -> 19 -> 1; 123.45 -> 12345 -> 1;
    # 999.99 -> 99999 -> 9; 2.0 -> 200 -> 2; negatives/zero excluded
    assert rows == {1: 3, 2: 1, 9: 1}


def test_corr_matrix_exact_relationships(spark):
    # y = 2x -> corr 1; z = -x -> corr -1 with x
    data = [(float(i), float(2 * i), float(-i)) for i in range(1, 6)]
    df = spark.createDataFrame(data, ["x", "y", "z"])
    rows = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert rows[("x", "y")] == pytest.approx(1.0, abs=1e-12)
    assert rows[("x", "z")] == pytest.approx(-1.0, abs=1e-12)
    assert rows[("y", "z")] == pytest.approx(-1.0, abs=1e-12)


def test_corr_matrix_matches_python(spark):
    data = [
        (1.25, 4.0, 7.5),
        (2.5, 3.0, 1.0),
        (3.75, 8.0, 2.25),
        (5.0, 1.0, 9.0),
        (6.25, 6.0, 0.5),
    ]
    df = spark.createDataFrame(data, ["a", "b", "c"])
    rows = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }

    def pycorr(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        return (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )

    cols = list(zip(*data))
    for (i, x), (j, y) in [((0, "a"), (1, "b")), ((0, "a"), (2, "c")),
                           ((1, "b"), (2, "c"))]:
        assert rows[(x, y)] == pytest.approx(
            pycorr(cols[i], cols[j]), rel=1e-12
        )


def test_auc_partition_independence(spark):
    # exactness claim: result identical under different partitionings
    rows = [(float((i * 37) % 100) / 4, "p" if i % 3 == 0 else "n")
            for i in range(200)]
    a = auc(
        spark.createDataFrame(rows, ["v", "lab"]).repartition(1),
        "v", F.col("lab") == "p",
    ).first()
    b = auc(
        spark.createDataFrame(rows, ["v", "lab"]).repartition(13),
        "v", F.col("lab") == "p",
    ).first()
    assert a["auc"] == b["auc"] and a["n_pos"] == b["n_pos"]


# -- PSI drift ----------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from carto_etl_spark.operators.mlstats import psi_bins

    rows = [(float(i % 100),) for i in range(2000)]
    df = spark.createDataFrame(rows, ["v"])
    out = psi_bins(df, df, "v", [25.0, 50.0, 75.0]).collect()
    total = sum(r["psi_term"] for r in out)
    assert abs(total) < 1e-9  # identical halves: every term cancels
    assert len(out) == 4
    assert all(r["ref_n"] == r["cur_n"] for r in out)


def test_psi_detects_shift(spark):
    from carto_etl_spark.operators.mlstats import psi_bins

    ref = spark.createDataFrame([(float(i % 100),) for i in range(2000)], ["v"])
    cur = spark.createDataFrame(
        [(float(i % 100) + 40.0,) for i in range(2000)], ["v"]
    )
    out = psi_bins(ref, cur, "v", [25.0, 50.0, 75.0]).collect()
    total = sum(r["psi_term"] for r in out)
    assert total > 0.25  # the standard "drifted" threshold


def test_psi_matches_python_reference(spark):
    import math

    from carto_etl_spark.operators.mlstats import psi_bins

    ref_rows = [float(v) for v in (1, 5, 30, 30, 60, 60, 60, 90)]
    cur_rows = [float(v) for v in (1, 30, 60, 60, 90, 90)]
    ref = spark.createDataFrame([(v,) for v in ref_rows], ["v"])
    cur = spark.createDataFrame([(v,) for v in cur_rows], ["v"])
    bounds = [25.0, 50.0, 75.0]
    out = {r["bin"]: r for r in psi_bins(ref, cur, "v", bounds).collect()}

    def binof(v):
        return sum(1 for b in bounds if v >= b)

    nb = 4
    rn = [sum(1 for v in ref_rows if binof(v) == b) for b in range(nb)]
    cn = [sum(1 for v in cur_rows if binof(v) == b) for b in range(nb)]
    rt, ct = len(ref_rows) + 0.5 * nb, len(cur_rows) + 0.5 * nb
    for b in range(nb):
        p, q = (rn[b] + 0.5) / rt, (cn[b] + 0.5) / ct
        assert out[b]["ref_n"] == rn[b] and out[b]["cur_n"] == cn[b]
        assert out[b]["psi_term"] == round((p - q) * math.log(p / q), 6)


def test_psi_empty_bin_smoothing_no_nan(spark):
    from carto_etl_spark.operators.mlstats import psi_bins

    ref = spark.createDataFrame([(1.0,), (2.0,)], ["v"])
    cur = spark.createDataFrame([(99.0,), (98.0,)], ["v"])
    out = psi_bins(ref, cur, "v", [50.0]).collect()
    assert all(r["psi_term"] is not None for r in out)
    assert len(out) == 2
