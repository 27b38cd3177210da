"""Market-basket item_pair_affinity (operators/affinity.py) hand cases."""

from __future__ import annotations

import pytest

from carto_etl_spark.operators.affinity import item_pair_affinity


def _rows(df):
    return {
        (r["item_a"], r["item_b"]): r
        for r in df.collect()
    }


def test_pair_counts_and_lift(spark):
    # baskets: {1:(a,b,c)}, {2:(a,b)}, {3:(a)}, {4:(b,c)}
    data = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = _rows(item_pair_affinity(df, "basket", "item", min_pair_count=1))
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2 and ab["n_baskets"] == 4
    assert ab["count_a"] == 3 and ab["count_b"] == 3
    assert ab["support"] == pytest.approx(0.5)
    # lift = 2*4 / (3*3)
    assert ab["lift"] == pytest.approx(8 / 9)
    bc = out[("b", "c")]
    assert bc["pair_count"] == 2
    assert bc["lift"] == pytest.approx(2 * 4 / (3 * 2))


def test_min_pair_count_filters(spark):
    data = [(1, "a"), (1, "b"), (2, "a"), (2, "c"), (2, "b")]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = _rows(item_pair_affinity(df, "basket", "item", min_pair_count=2))
    assert set(out) == {("a", "b")}


def test_duplicate_lines_deduped(spark):
    # same item twice in one basket must count once
    data = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = _rows(item_pair_affinity(df, "basket", "item", min_pair_count=1))
    assert out[("a", "b")]["pair_count"] == 2
    assert out[("a", "b")]["count_a"] == 2


def test_mega_basket_dropped(spark):
    big = [(9, f"i{k}") for k in range(30)]
    small = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(small + big, ["basket", "item"])
    out = _rows(
        item_pair_affinity(
            df, "basket", "item", min_pair_count=1, max_basket_items=10
        )
    )
    # no pair from the mega basket; totals exclude it too
    assert all(not a.startswith("i") for a, _ in out)
    assert out[("a", "b")]["n_baskets"] == 2
