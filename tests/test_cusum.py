"""CUSUM drift detection (operators/anomaly.py:cusum_scores): the
prefix-sum-minus-running-min closed form must equal the textbook
sequential recurrence bit-for-bit (decimal arithmetic), detect an
injected level shift, restart after dips, and stay key-partitioned."""

from __future__ import annotations

from decimal import Decimal

from carto_etl_spark.operators.anomaly import cusum_scores


def _run(spark, rows, target, slack, threshold):
    df = spark.createDataFrame(rows, "k string, seq long, x double")
    out = cusum_scores(df, ["k"], ["seq"], "x", target, slack, threshold)
    return {
        (r["k"], r["seq"]): (Decimal(r["cusum"]), r["alarm"])
        for r in out.collect()
    }


def _reference(rows, target, slack, threshold):
    """Textbook recurrence s_i = max(0, s_{i-1} + y_i), exact decimals."""
    q = Decimal("0.000001")
    t = Decimal(repr(target)).quantize(q)
    c = Decimal(repr(slack)).quantize(q)
    h = Decimal(repr(threshold)).quantize(q)
    out, state = {}, {}
    for k, seq, x in sorted(rows):
        y = Decimal(repr(round(x, 6))).quantize(q) - t - c
        s = max(Decimal(0), state.get(k, Decimal(0)) + y)
        state[k] = s
        out[(k, seq)] = (s, s > h)
    return out


def test_closed_form_equals_recurrence(spark):
    # a drifting series with dips (forces the restart-at-zero path), two keys
    rows = []
    for k, base in [("a", 10.0), ("b", 9.0)]:
        for i in range(60):
            bump = 3.0 if (k == "a" and i >= 40) else 0.0  # level shift late in 'a'
            dip = -6.0 if i % 13 == 0 else 0.0
            rows.append((k, i, base + bump + dip + (i * 7 % 5) * 0.25))
    got = _run(spark, rows, target=10.0, slack=0.5, threshold=8.0)
    ref = _reference(rows, 10.0, 0.5, 8.0)
    assert got == ref


def test_level_shift_alarms_and_stable_series_does_not(spark):
    rows = [("s", i, 10.0) for i in range(50)]
    rows += [("d", i, 10.0 if i < 25 else 13.0) for i in range(50)]
    got = _run(spark, rows, target=10.0, slack=0.5, threshold=20.0)
    assert not any(alarm for (k, _), (_, alarm) in got.items() if k == "s")
    d_alarms = [seq for (k, seq), (_, alarm) in got.items() if k == "d" and alarm]
    assert d_alarms and min(d_alarms) >= 25  # alarms only after the shift


def test_restart_after_dip(spark):
    # a negative excursion larger than the accumulated drift must clamp the
    # statistic at zero (restart), never go negative
    rows = [("k", 0, 100.0), ("k", 1, -1000.0), ("k", 2, 10.0)]
    got = _run(spark, rows, target=10.0, slack=0.0, threshold=1000.0)
    assert got[("k", 0)][0] == Decimal("90.000000")
    assert got[("k", 1)][0] == Decimal("0.000000")  # clamped, not 90-1010
    assert got[("k", 2)][0] == Decimal("0.000000")


def test_plan_partitioned_windows_only(spark):
    from carto_etl_spark.plans.inspect import unpartitioned_windows

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)], "k string, seq long, x double"
    )
    out = cusum_scores(df, ["k"], ["seq"], "x", 1.0, 0.1, 5.0)
    assert not unpartitioned_windows(out)
