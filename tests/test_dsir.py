"""DSIR importance resampling (operators/dsir.py): weight math against a
Python replay, domain enrichment on a planted two-domain corpus, Gumbel
determinism/seed behavior, and edge cases (empty docs, disjoint vocab)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators import dsir as ds

DIM = 64


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def domain_corpora(spark):
    """Target: physics-flavored docs.  Pool: 20 physics-flavored docs in a
    sea of 80 cooking-flavored ones, ids 0-99; the physics docs are the
    planted in-domain subset DSIR must surface."""
    target = _corpus(
        spark,
        [(i, "quark lepton boson field tensor gauge entropy") for i in range(10)],
    )
    pool_rows = []
    for i in range(100):
        if i % 5 == 0:
            pool_rows.append((i, "boson field quark entropy gauge flux"))
        else:
            pool_rows.append((i, "butter flour sugar oven whisk dough salt"))
    return target, _corpus(spark, pool_rows)


def _fit(target, pool):
    tc = ds.feature_counts(target, "text", dim=DIM, ngram=1)
    rc = ds.feature_counts(pool, "text", dim=DIM, ngram=1)
    return ds.dsir_weights(tc, rc, dim=DIM)


def test_weights_match_python_replay(spark, domain_corpora):
    """Spark's micro-nat LLR equals a driver-side math.log replay to within
    1 micro-nat (the documented knife-edge-rounding allowance)."""
    target, pool = domain_corpora
    w, tt, rt = _fit(target, pool)

    tcounts = {
        r["feature"]: r["count"]
        for r in ds.feature_counts(target, "text", dim=DIM, ngram=1).collect()
    }
    rcounts = {
        r["feature"]: r["count"]
        for r in ds.feature_counts(pool, "text", dim=DIM, ngram=1).collect()
    }
    got = {r["feature"]: r["llr_micro"] for r in w.collect()}
    assert set(got) == set(tcounts) | set(rcounts)
    for f, llr in got.items():
        want = round(
            (
                math.log(tcounts.get(f, 0) + 1)
                - math.log(tt + DIM)
                - math.log(rcounts.get(f, 0) + 1)
                + math.log(rt + DIM)
            )
            * ds.MICRO
        )
        assert abs(llr - want) <= 1, f"feature {f}: {llr} vs {want}"


def test_scores_rank_in_domain_docs_highest(spark, domain_corpora):
    target, pool = domain_corpora
    w, tt, rt = _fit(target, pool)
    scores = ds.dsir_scores(pool, "text", "doc_id", w, tt, rt, dim=DIM, ngram=1)
    rows = {r["doc_id"]: r["score_micro"] for r in scores.collect()}
    assert len(rows) == 100
    physics = [rows[i] for i in range(0, 100, 5)]
    cooking = [rows[i] for i in range(100) if i % 5 != 0]
    assert min(physics) > max(cooking)


def test_gumbel_topk_enriched_and_deterministic(spark, domain_corpora):
    """With tau=1 the 20 planted in-domain docs dominate the selection;
    the draw replays exactly, and a different salt redraws the tail."""
    target, pool = domain_corpora
    w, tt, rt = _fit(target, pool)
    scores = ds.dsir_scores(pool, "text", "doc_id", w, tt, rt, dim=DIM, ngram=1)
    pick = ds.dsir_select(scores, "doc_id", n=25, salt=3)
    ids = [r["doc_id"] for r in pick.collect()]
    assert len(ids) == 25
    planted = {i for i in range(0, 100, 5)}
    assert planted <= set(ids), "every in-domain doc selected"
    again = [r["doc_id"] for r in ds.dsir_select(scores, "doc_id", n=25, salt=3).collect()]
    assert ids == again
    other = [r["doc_id"] for r in ds.dsir_select(scores, "doc_id", n=25, salt=4).collect()]
    assert set(other) >= planted
    assert other != ids, "salt must redraw the noise tail"


def test_high_tau_washes_out_scores(spark, domain_corpora):
    """tau >> score spread makes selection ~pure noise: the planted docs no
    longer sweep the sample."""
    target, pool = domain_corpora
    w, tt, rt = _fit(target, pool)
    scores = ds.dsir_scores(pool, "text", "doc_id", w, tt, rt, dim=DIM, ngram=1)
    noisy = ds.dsir_select(scores, "doc_id", n=25, salt=3, tau_num=10**6, tau_den=1)
    ids = {r["doc_id"] for r in noisy.collect()}
    assert not ({i for i in range(0, 100, 5)} <= ids)


def test_empty_and_unseen_docs(spark):
    """Zero-token docs score 0 (importance weight 1); docs made of tokens
    unseen by BOTH fits get the smoothed-zero default, not NULL."""
    target = _corpus(spark, [(0, "alpha beta")])
    pool = _corpus(spark, [(1, "gamma delta")])
    w, tt, rt = _fit(target, pool)
    probe = _corpus(spark, [(10, ""), (11, "   "), (12, "zz-novel zz-novel")])
    scores = ds.dsir_scores(probe, "text", "doc_id", w, tt, rt, dim=DIM, ngram=1)
    rows = {r["doc_id"]: r for r in scores.collect()}
    assert rows[10]["score_micro"] == 0 and rows[10]["n_feats"] == 0
    assert rows[11]["score_micro"] == 0
    default = round(
        (math.log(1) - math.log(tt + DIM) - math.log(1) + math.log(rt + DIM))
        * ds.MICRO
    )
    assert abs(rows[12]["score_micro"] - 2 * default) <= 2


def test_bigram_features_change_fit(spark, domain_corpora):
    """ngram=2 adds word-bigram buckets: the weight table grows and in-domain
    ranking still holds (fastText-style shared hash space)."""
    target, pool = domain_corpora
    tc1 = ds.feature_counts(target, "text", dim=DIM, ngram=1)
    tc2 = ds.feature_counts(target, "text", dim=DIM, ngram=2)
    n1 = tc1.agg(F.sum("count")).first()[0]
    n2 = tc2.agg(F.sum("count")).first()[0]
    assert n2 > n1
    rc2 = ds.feature_counts(pool, "text", dim=DIM, ngram=2)
    w, tt, rt = ds.dsir_weights(tc2, rc2, dim=DIM)
    scores = ds.dsir_scores(pool, "text", "doc_id", w, tt, rt, dim=DIM, ngram=2)
    rows = {r["doc_id"]: r["score_micro"] for r in scores.collect()}
    assert min(rows[i] for i in range(0, 100, 5)) > max(
        rows[i] for i in range(100) if i % 5 != 0
    )


def test_arrow_scoring_twin_bit_identical(spark, domain_corpora):
    """dsir_scores_arrow must equal dsir_scores row-for-row — same Java-\\s
    tokens, same md5 buckets, integer sums, engine-evaluated default —
    for both ngram settings and for docs with unseen/odd tokens."""
    target, pool = domain_corpora
    extra = _corpus(
        spark,
        [(900, "zz-unseen zz-unseen boson"), (901, ""), (902, None),
         (903, "tab\tsep\x0bodd\fws tokens here")],
    )
    probe = pool.unionByName(extra)
    for ngram in (1, 2):
        tc = ds.feature_counts(target, "text", dim=DIM, ngram=ngram)
        rc = ds.feature_counts(pool, "text", dim=DIM, ngram=ngram)
        w, tt, rt = ds.dsir_weights(tc, rc, dim=DIM)
        a = sorted(
            tuple(r)
            for r in ds.dsir_scores(
                probe, "text", "doc_id", w, tt, rt, dim=DIM, ngram=ngram
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in ds.dsir_scores_arrow(
                probe, "text", "doc_id", w, tt, rt, dim=DIM, ngram=ngram
            ).collect()
        )
        assert a == b, f"ngram={ngram}"
