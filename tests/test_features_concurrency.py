"""hashed_features (operators/text.py) and max_concurrency
(operators/timeseries.py) unit tests with hand-computed expectations."""

from __future__ import annotations

import datetime as dt
import hashlib

from carto_etl_spark.operators.text import hashed_features
from carto_etl_spark.operators.timeseries import max_concurrency


def _bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % dim


def test_hashed_features_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "  "), (3, "c")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_id"], r["feature"]): r["count"]
        for r in hashed_features(df, "text", ["doc_id"], dim=16).collect()
    }
    ba, bb, bc = _bucket("a", 16), _bucket("b", 16), _bucket("c", 16)
    if ba == bb:
        assert rows[(1, ba)] == 3
    else:
        assert rows[(1, ba)] == 2 and rows[(1, bb)] == 1
    assert rows[(3, bc)] == 1
    # blank doc contributes nothing
    assert not any(k[0] == 2 for k in rows)


def test_hashed_features_buckets_in_range(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} shared") for i in range(20)],
        ["doc_id", "text"],
    )
    out = hashed_features(df, "text", ["doc_id"], dim=8).collect()
    assert all(0 <= r["feature"] < 8 for r in out)
    # 'shared' lands in the same bucket for every doc
    b = _bucket("shared", 8)
    assert sum(1 for r in out if r["feature"] == b) >= 20


def _iv(spark, spans, key="k"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (key, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=e))
        for s, e in spans
    ]
    return spark.createDataFrame(rows, ["g", "t_start", "t_end"])


def test_concurrency_basic_overlap(spark):
    df = _iv(spark, [(0, 10), (5, 15), (20, 30)])
    row = max_concurrency(df, "t_start", "t_end", ["g"]).first()
    assert (row["n_intervals"], row["peak"]) == (3, 2)


def test_concurrency_touching_counts_as_overlap(spark):
    # equal-time convention: starts sort before ends
    df = _iv(spark, [(0, 10), (10, 20)])
    row = max_concurrency(df, "t_start", "t_end", ["g"]).first()
    assert row["peak"] == 2


def test_concurrency_disjoint(spark):
    df = _iv(spark, [(0, 5), (6, 10), (11, 20)])
    row = max_concurrency(df, "t_start", "t_end", ["g"]).first()
    assert row["peak"] == 1


def test_concurrency_partitioned_independently(spark):
    a = _iv(spark, [(0, 10), (1, 9), (2, 8)], key="a")
    b = _iv(spark, [(0, 1), (2, 3)], key="b")
    rows = {
        r["g"]: r["peak"]
        for r in max_concurrency(
            a.union(b), "t_start", "t_end", ["g"]
        ).collect()
    }
    assert rows == {"a": 3, "b": 1}
