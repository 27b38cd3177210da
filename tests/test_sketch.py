"""Count-min sketch (operators/sketch.py): one-sided error bound, exactness
when collision-free, the merge = union-build identity that makes the state
maintainable across batches, and the map-side partial-agg plan property that
bounds the build's shuffle at depth*width rows per partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from carto_etl_spark.operators import sketch as sk
from carto_etl_spark.plans.inspect import explain_str

WORDS = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["item"])


def test_estimates_exact_when_collision_free(spark):
    corpus = WORDS * 3 + ["apple"] * 5  # apple: 8, others: 3
    toks = _tokens(spark, corpus)
    sketch = sk.cms_build(toks, "item", depth=4, width=4096)
    items = toks.distinct()
    est = {
        r["item"]: r["cms_estimate"]
        for r in sk.cms_estimate(sketch, items, "item", 4, 4096).collect()
    }
    assert est["apple"] == 8
    assert all(est[w] == 3 for w in WORDS if w != "apple")


def test_one_sided_error_under_forced_collisions(spark):
    corpus = WORDS * 2 + ["apple"] * 7
    toks = _tokens(spark, corpus)
    # width=2: heavy collisions guaranteed; the estimate must never
    # undercount (CMS error is one-sided)
    sketch = sk.cms_build(toks, "item", depth=3, width=2)
    exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    joined = sk.cms_estimate(sketch, exact, "item", 3, 2).collect()
    for r in joined:
        assert r["cms_estimate"] >= r["n"], r


def test_merge_equals_union_build(spark):
    a = _tokens(spark, WORDS * 2)
    b = _tokens(spark, ["apple", "banana", "zebra"] * 3)
    merged = sk.cms_merge(
        sk.cms_build(a, "item", 4, 64), sk.cms_build(b, "item", 4, 64)
    )
    direct = sk.cms_build(a.unionByName(b), "item", 4, 64)
    m = {(r["seed"], r["bucket"]): r["n"] for r in merged.collect()}
    d = {(r["seed"], r["bucket"]): r["n"] for r in direct.collect()}
    assert m == d


def test_absent_item_estimate_is_collision_mass_only(spark):
    toks = _tokens(spark, WORDS)
    sketch = sk.cms_build(toks, "item", depth=4, width=4096)
    probe = _tokens(spark, ["never-seen-token"])
    [r] = sk.cms_estimate(sketch, probe, "item", 4, 4096).collect()
    assert r["cms_estimate"] == 0  # wide sketch: no collisions with 7 words


def test_build_is_partial_aggregate(spark):
    toks = _tokens(spark, WORDS * 4)
    plan = explain_str(sk.cms_build(toks, "item", 4, 64))
    assert "partial_count" in plan or "partial" in plan.lower()


def test_estimate_preserves_duplicate_rows_and_reserved_names(spark):
    import pytest

    toks = _tokens(spark, WORDS)
    sketch = sk.cms_build(toks, "item", depth=4, width=4096)
    # duplicate probe rows must yield one output row EACH, not collapse
    probe = _tokens(spark, [WORDS[0], WORDS[0], WORDS[1]])
    got = sorted(
        (r["item"], r["cms_estimate"])
        for r in sk.cms_estimate(sketch, probe, "item", 4, 4096).collect()
    )
    assert [g[0] for g in got] == sorted([WORDS[0], WORDS[0], WORDS[1]])
    assert all(g[1] >= 1 for g in got)
    # caller columns named seed/bucket/n survive the probe join untouched
    clash = probe.selectExpr(
        "item", "1 as seed", "2 as bucket", "3 as n"
    )
    out = sk.cms_estimate(sketch, clash, "item", 4, 4096)
    assert set(out.columns) == {"item", "seed", "bucket", "n", "cms_estimate"}
    rows = out.collect()
    assert len(rows) == 3
    assert all((r["seed"], r["bucket"], r["n"]) == (1, 2, 3) for r in rows)
    # the __cms_ bookkeeping prefix is reserved and rejected up front
    with pytest.raises(ValueError):
        sk.cms_estimate(
            sketch, probe.withColumn("__cms_row", probe["item"]),
            "item", 4, 4096,
        )


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

def test_hll_merge_equals_union_build(spark):
    a = _tokens(spark, [f"tok{i}" for i in range(500)])
    b = _tokens(spark, [f"tok{i}" for i in range(300, 900)])
    merged = {
        (r["bucket"], r["max_rho"])
        for r in sk.hll_merge(
            sk.hll_build(a, "item"), sk.hll_build(b, "item")
        ).collect()
    }
    direct = {
        (r["bucket"], r["max_rho"])
        for r in sk.hll_build(a.unionByName(b), "item").collect()
    }
    assert merged == direct


def test_hll_estimate_within_error_bound(spark):
    import math

    for n in (100, 5000, 50000):
        df = _tokens(spark, [f"item-{i}" for i in range(n)])
        [row] = sk.hll_estimate(sk.hll_build(df, "item", p=10), p=10).collect()
        # 1.04/sqrt(1024) ~ 3.25% standard error; allow 4 sigma
        assert abs(row["estimate"] - n) / n < 4 * 1.04 / math.sqrt(1024), (
            n, row["estimate"]
        )


def test_hll_duplicates_do_not_move_estimate(spark):
    base = [f"d{i}" for i in range(2000)]
    [once] = sk.hll_estimate(
        sk.hll_build(_tokens(spark, base), "item")
    ).collect()
    [tripled] = sk.hll_estimate(
        sk.hll_build(_tokens(spark, base * 3), "item")
    ).collect()
    assert once["estimate"] == tripled["estimate"]


def test_hll_build_is_partial_aggregate_and_bounded(spark):
    df = _tokens(spark, [f"t{i}" for i in range(10000)])
    regs = sk.hll_build(df, "item", p=6)
    plan = explain_str(regs)
    assert "partial" in plan.lower()
    rows = regs.collect()
    assert len(rows) <= 64
    assert all(1 <= r["max_rho"] <= 55 for r in rows)


def test_hll_rejects_bad_precision(spark):
    import pytest as _pytest

    df = _tokens(spark, ["a"])
    with _pytest.raises(ValueError):
        sk.hll_build(df, "item", p=2)


# -- grouped HLL -------------------------------------------------------------


def test_grouped_hll_estimates_within_bound(spark):
    import math

    from carto_etl_spark.operators.sketch import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    rows = []
    for g, n in [("a", 2000), ("b", 300), ("c", 4)]:
        rows += [(g, f"{g}-{i}") for i in range(n)]
    df = spark.createDataFrame(rows * 3, ["g", "item"])  # duplicates too
    regs = hll_build_grouped(df, ["g"], "item", p=10)
    est = {
        r["g"]: r["estimate"]
        for r in hll_estimate_grouped(regs, ["g"], p=10).collect()
    }
    bound = 4 * 1.04 / math.sqrt(1 << 10)  # 4 sigma
    for g, n in [("a", 2000), ("b", 300), ("c", 4)]:
        assert abs(est[g] - n) <= max(bound * n, 3), (g, est[g], n)


def test_grouped_hll_merge_equals_union_build(spark):
    from carto_etl_spark.operators.sketch import hll_build_grouped

    a = spark.createDataFrame(
        [("x", f"i{i}") for i in range(100)], ["g", "item"]
    )
    b = spark.createDataFrame(
        [("x", f"i{i}") for i in range(50, 200)] + [("y", "only")],
        ["g", "item"],
    )
    merged = (
        hll_build_grouped(a, ["g"], "item", p=8)
        .unionByName(hll_build_grouped(b, ["g"], "item", p=8))
        .groupBy("g", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    oneshot = hll_build_grouped(a.unionByName(b), ["g"], "item", p=8)
    left = {(r["g"], r["bucket"]): r["max_rho"] for r in merged.collect()}
    right = {(r["g"], r["bucket"]): r["max_rho"] for r in oneshot.collect()}
    assert left == right


def test_grouped_hll_groups_are_independent(spark):
    """The same items in two groups must produce identical per-group
    register tables — no cross-group leakage through the bucket keys."""
    from carto_etl_spark.operators.sketch import hll_build_grouped

    items = [f"v{i}" for i in range(64)]
    df = spark.createDataFrame(
        [("g1", v) for v in items] + [("g2", v) for v in items], ["g", "item"]
    )
    regs = hll_build_grouped(df, ["g"], "item", p=8).collect()
    by_g = {}
    for r in regs:
        by_g.setdefault(r["g"], {})[r["bucket"]] = r["max_rho"]
    assert by_g["g1"] == by_g["g2"]
