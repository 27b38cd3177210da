"""SymSpell-style fuzzy matching (operators/fuzzy.py): deletion-neighborhood
completeness for every edit kind, exact verification, the d=2 neighborhood,
and the plan contract (equi-join blocking — no cartesian product, no
Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from carto_etl_spark.operators import fuzzy as fz
from carto_etl_spark.plans.inspect import explain_str


def _pairs(spark, names, d=1):
    df = spark.createDataFrame(
        [Row(id=i, s=s) for i, s in enumerate(names)]
    )
    return {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_pairs(df, "id", "s", max_dist=d).collect()
    }


def test_d1_catches_every_edit_kind(spark):
    # 0=anchor; 1=substitution, 2=insertion, 3=deletion, 4=far away
    got = _pairs(spark, ["gear", "bear", "gears", "ear", "bolt"])
    assert (0, 1, 1) in got  # substitution
    assert (0, 2, 1) in got  # insertion
    assert (0, 3, 1) in got  # deletion
    assert not any(4 in (a, b) for a, b, _ in got)


def test_d1_excludes_distance_two(spark):
    got = _pairs(spark, ["gear", "beer"])  # two substitutions
    assert got == set()


def test_exact_duplicates_pair_at_distance_zero(spark):
    got = _pairs(spark, ["ring", "ring", "rink"])
    assert (0, 1, 0) in got and (0, 2, 1) in got and (1, 2, 1) in got


def test_d2_neighborhood(spark):
    # transposition = 2 (sub+sub under classic Levenshtein), double-delete
    got = _pairs(spark, ["gear", "gera", "ge", "gxxr"], d=2)
    assert (0, 1, 2) in got  # transposition
    assert (0, 2, 2) in got  # two deletions
    assert (0, 3, 2) in got  # two substitutions
    got1 = _pairs(spark, ["gear", "gera"], d=1)
    assert got1 == set()


def test_empty_and_single_char_strings(spark):
    got = _pairs(spark, ["", "a", "ab"])
    assert (0, 1, 1) in got and (1, 2, 1) in got
    assert (0, 2, 1) not in got  # distance 2


def test_fuzzy_join_carries_columns(spark):
    left = spark.createDataFrame([Row(lid=1, lname="widget", tag="L")])
    right = spark.createDataFrame(
        [Row(rid=7, rname="widgets"), Row(rid=8, rname="gadget")]
    )
    out = fz.fuzzy_join(left, right, "lname", "rname", max_dist=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lid"], r["rid"], r["tag"], r["dist"]) == (1, 7, "L", 1)


def test_max_dist_validation(spark):
    df = spark.createDataFrame([Row(id=1, s="x")])
    with pytest.raises(ValueError):
        fz.fuzzy_pairs(df, "id", "s", max_dist=3)


def test_plan_is_equijoin_no_python(spark, tmp_path):
    p = str(tmp_path / "n.parquet")
    spark.createDataFrame(
        [Row(id=i, s=f"name{i:03d}") for i in range(100)]
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(fz.fuzzy_pairs(df, "id", "s"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_completeness_against_brute_force(spark):
    # random-ish word soup: blocking must find EXACTLY the brute-force pairs
    words = [
        "alpha", "alpho", "alpa", "belta", "delta", "delta", "delt",
        "gamma", "gamm", "gama", "epsilon", "epsilons", "zeta", "zetta",
    ]
    df = spark.createDataFrame([Row(id=i, s=s) for i, s in enumerate(words)])
    got = {
        (r["id_a"], r["id_b"])
        for r in fz.fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(words), 2)
        if lev(a, b) <= 1
    }
    assert got == want


def test_dedup_strings_path_identical_on_duplicate_heavy_input(spark):
    from carto_etl_spark.operators.fuzzy import fuzzy_pairs

    # every string appears 3x (distinct ids) + a singleton
    rows = []
    rid = 0
    for s in ["abc", "abd", "xbd", "zzz"]:
        for _ in range(3):
            rows.append((rid, s))
            rid += 1
    rows.append((rid, "abcd"))
    df = spark.createDataFrame(rows, "id long, t string")
    fast = {
        tuple(r)
        for r in fuzzy_pairs(df, "id", "t", max_dist=1).collect()
    }
    slow = {
        tuple(r)
        for r in fuzzy_pairs(
            df, "id", "t", max_dist=1, dedup_strings=False
        ).collect()
    }
    assert fast == slow
    # sanity: same-string pairs present with dist 0, cross pairs verified
    assert (0, "abc", 1, "abc", 0) in fast
    assert any(a == 0 and d == 1 for (a, _, _, _, d) in fast)
