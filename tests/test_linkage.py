"""Fellegi-Sunter linkage scoring (operators/linkage.py): hand-computed
u-statistics and likelihood ratios, NULL-skip semantics, partition
invariance of the bit-exact product, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from carto_etl_spark.operators import linkage as lk
from carto_etl_spark.plans.inspect import explain_str

RECORDS = [
    # id, city, tier
    (1, "A", "x"),
    (2, "A", "y"),
    (3, "A", "x"),
    (4, "B", None),
    (5, "B", "x"),
    (6, "C", "y"),
]


def _recs(spark):
    return spark.createDataFrame(RECORDS, ["id", "city", "tier"])


def _pairs(spark, ps):
    return spark.createDataFrame(ps, ["id_a", "id_b"])


def test_u_stats_exact(spark):
    [r] = lk.field_u_stats(_recs(spark), "city").collect()
    # counts 3,2,1 -> sum c(c-1) = 6+2+0 = 8; N=6 -> 30
    assert int(r["u_num_city"]) == 8 and int(r["u_den_city"]) == 30
    [r] = lk.field_u_stats(_recs(spark), "tier").collect()
    # non-null tiers: x:3, y:2 -> 6+2=8; N=5 -> 20
    assert int(r["u_num_tier"]) == 8 and int(r["u_den_tier"]) == 20


def test_hand_computed_likelihood_ratios(spark):
    out = {
        (r["id_a"], r["id_b"]): r
        for r in lk.fellegi_sunter_scores(
            _recs(spark), "id",
            _pairs(spark, [(1, 2), (1, 6), (1, 4)]),
            {"city": 0.9, "tier": 0.8},
        ).collect()
    }
    u_city, u_tier = 8.0 / 30.0, 8.0 / 20.0
    # (1,2): city agrees (A=A), tier disagrees (x!=y)
    r = out[(1, 2)]
    assert (r["agree_city"], r["agree_tier"]) == (1, 0)
    assert r["lr"] == (1.0 * (0.9 / u_city)) * ((1.0 - 0.8) / (1.0 - u_tier))
    # (1,6): both disagree
    r = out[(1, 6)]
    assert (r["agree_city"], r["agree_tier"]) == (0, 0)
    assert r["lr"] == (1.0 * ((1.0 - 0.9) / (1.0 - u_city))) * (
        (1.0 - 0.8) / (1.0 - u_tier)
    )
    # (1,4): city disagrees, tier NULL on one side -> skipped (ratio 1)
    r = out[(1, 4)]
    assert (r["agree_city"], r["agree_tier"]) == (0, None)
    assert r["lr"] == (1.0 * ((1.0 - 0.9) / (1.0 - u_city))) * 1.0


def test_partition_invariance_bit_exact(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (4, 5), (1, 6)])
    one = lk.fellegi_sunter_scores(
        _recs(spark).coalesce(1), "id", pairs, {"city": 0.9, "tier": 0.8}
    )
    many = lk.fellegi_sunter_scores(
        _recs(spark).repartition(7), "id", pairs, {"city": 0.9, "tier": 0.8}
    )
    key = lambda rows: sorted((r["id_a"], r["id_b"], r["lr"]) for r in rows)
    assert key(one.collect()) == key(many.collect())


def test_u_stats_broadcast_to_pairs(spark):
    plan = explain_str(
        lk.fellegi_sunter_scores(
            _recs(spark), "id", _pairs(spark, [(1, 2)]), {"city": 0.9}
        )
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
