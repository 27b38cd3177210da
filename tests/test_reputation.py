"""Domain/source reputation gating (operators/reputation.py): exact mean
comparison without division, min-size fail-closed, broadcast verdict join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.reputation import (
    gate_by_reputation,
    group_reputation,
)
from carto_etl_spark.plans.inspect import explain_str


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # good.com: mean 600 over 3 docs
        (1, "good.com", 500), (2, "good.com", 600), (3, "good.com", 700),
        # spam.net: mean 100 over 3 docs
        (4, "spam.net", 100), (5, "spam.net", 100), (6, "spam.net", 100),
        # edge.org: mean EXACTLY tau (300) — >= passes
        (7, "edge.org", 200), (8, "edge.org", 400),
        # lone.io: one doc, high score — fails min_docs
        (9, "lone.io", 900),
    ]
    return spark.createDataFrame(rows, ["doc_id", "domain", "score"])


def test_group_verdicts(spark, docs):
    rep = {
        r["domain"]: r.asDict()
        for r in group_reputation(docs, "domain", "score", 300, 1, 2).collect()
    }
    assert rep["good.com"]["grp_ok"] and rep["good.com"]["n_docs"] == 3
    assert not rep["spam.net"]["grp_ok"]
    assert rep["edge.org"]["grp_ok"], "mean == tau must pass (>=)"
    assert not rep["lone.io"]["grp_ok"], "under min_docs fails closed"


def test_fractional_tau_no_division(spark, docs):
    """tau = 601/2 = 300.5: edge.org (mean 300) fails, good.com passes —
    the cross-multiplied integer compare resolves fractions exactly."""
    rep = {
        r["domain"]: r["grp_ok"]
        for r in group_reputation(docs, "domain", "score", 601, 2, 2).collect()
    }
    assert rep["good.com"] and not rep["edge.org"]


def test_gate_annotates_every_doc(spark, docs):
    out = gate_by_reputation(docs, "domain", "score", 300, 1, 2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 9
    assert rows[1]["grp_ok"] and not rows[4]["grp_ok"]
    kept = [i for i, r in rows.items() if r["grp_ok"]]
    assert sorted(kept) == [1, 2, 3, 7, 8]


def test_verdict_join_is_broadcast(spark, docs):
    plan = explain_str(gate_by_reputation(docs, "domain", "score", 300, 1, 2))
    assert "BroadcastHashJoin" in plan


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        group_reputation(docs, "domain", "score", 300, 0, 2)
    with pytest.raises(ValueError):
        group_reputation(docs, "domain", "score", 300, 1, 0)
