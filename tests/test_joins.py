"""As-of and range join operators: semantics (backward/forward, no-match
NULLs, duplicate left rows) and strategy equivalence (window path vs
cogrouped pandas merge path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.joins import asof_join, asof_join_pandas, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, 100.0),
            ("A", 20, 101.0),
            ("A", 20, 102.0),  # duplicate ts left row
            ("B", 15, 50.0),
            ("C", 5, 9.0),     # key with no quotes at all
        ],
        "sym string, ts long, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 5, 99.5),
            ("A", 18, 100.5),
            ("A", 25, 103.0),
            ("B", 16, 49.0),   # only after B's trade
        ],
        "sym string, ts long, bid double",
    )
    return trades, quotes


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda t: (t[0], t[1], t[2])
    )


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts")
    got = {
        (r["sym"], r["ts"], r["price"]): (r["ts_right"], r["bid"])
        for r in out.collect()
    }
    assert got[("A", 10, 100.0)] == (5, 99.5)
    assert got[("A", 20, 101.0)] == (18, 100.5)
    assert got[("A", 20, 102.0)] == (18, 100.5)  # duplicate left row kept
    assert got[("B", 15, 50.0)] == (None, None)  # quote is later -> no match
    assert got[("C", 5, 9.0)] == (None, None)    # unseen key
    assert out.count() == 5


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        direction="forward",
    )
    got = {
        (r["sym"], r["ts"]): r["ts_right"] for r in out.collect()
    }
    assert got[("A", 10)] == 18
    assert got[("B", 15)] == 16


def test_asof_pandas_equivalence(trades_quotes):
    trades, quotes = trades_quotes
    a = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts")
    b = asof_join_pandas(trades, quotes, on="sym", left_ts="ts", right_ts="ts")
    assert _rows(a) == _rows(b)


def test_range_join(spark):
    intervals = spark.createDataFrame(
        [("i1", 0, 10), ("i2", 5, 15), ("i3", 100, 110)],
        "name string, s long, e long",
    )
    points = spark.createDataFrame(
        [(7,), (12,), (50,), (100,)], "p long"
    )
    out = range_join(intervals, points, "s", "e", "p", bucket_width=8)
    got = sorted((r["name"], r["p"]) for r in out.collect())
    assert got == [("i1", 7), ("i2", 7), ("i2", 12), ("i3", 100)]
