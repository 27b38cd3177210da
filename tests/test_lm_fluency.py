"""Bigram LM fluency scoring (operators/text.py:bigram_lm_scores):
hand-computed smoothed probabilities, OOV-context floor, short-doc
exclusion, and partition invariance of the decimal-summed surprisal."""

from __future__ import annotations

import math
from decimal import Decimal

from carto_etl_spark.operators.text import bigram_lm_scores

TRAIN = [(1, "a b a b c")]
# bigram counts: (a,b)=2, (b,a)=1, (b,c)=1; unigram context: a=2, b=2
# vocab {a,b,c} -> V=3


def _surp(c2, c1, v=3):
    return Decimal(str(round(-math.log2((c2 + 1) / (c1 + v)), 6)))


def _run(spark, score_rows, repartition=None):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    score = spark.createDataFrame(score_rows, ["doc_id", "text"])
    if repartition:
        train, score = train.repartition(repartition), score.repartition(
            repartition
        )
    return {
        r["doc_id"]: r.asDict()
        for r in bigram_lm_scores(train, score).collect()
    }


def test_hand_computed_surprisal(spark):
    out = _run(spark, [(10, "a b x"), (11, "x y")])
    # doc 10: (a,b) p=3/5, (b,x) p=1/5
    exp10 = _surp(2, 2) + _surp(0, 2)
    assert out[10]["n_bigrams"] == 2
    assert out[10]["total_surprisal"] == exp10
    assert out[10]["mean_surprisal"] == float(exp10) / 2.0
    # doc 11: both words OOV -> context count 0 -> p = 1/3 floor
    assert out[11]["total_surprisal"] == _surp(0, 0)


def test_fluent_scores_below_gibberish(spark):
    out = _run(spark, [(10, "a b a b c"), (11, "z q w v k")])
    assert out[10]["mean_surprisal"] < out[11]["mean_surprisal"]


def test_short_docs_excluded(spark):
    out = _run(spark, [(10, "solo"), (11, "a b")])
    assert 10 not in out and 11 in out


def test_partition_invariance(spark):
    rows = [(i, "a b c a b x y") for i in range(20)]
    one = _run(spark, rows)
    many = _run(spark, rows, repartition=13)
    assert one == many
