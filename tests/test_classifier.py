"""Trainable quality classifier (operators/classifier.py): the planted
junk-ratio labels must be genuinely learned (AUC), the driver fast path and
the distributed loop must produce IDENTICAL weights (same exact integer
update rule), truncating division must match engine semantics on negatives,
and the scan-stage score expression must agree with training-time margins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators import classifier as clf
from carto_etl_spark.operators import text as tx

SF = "/root/testdata/sf0.01"


def _labels(d):
    toks = tx.tokens_expr(F.col("text"))
    junk = F.size(F.filter(toks, lambda x: x.isin("slow", "dup", "a")))
    return d.select(
        "doc_id", (junk * 24 <= F.size(toks)).cast("int").alias("label")
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_tdiv_matches_spark_and_duckdb_semantics(spark):
    import duckdb

    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-8, 4), (0, 3), (-1, 16)]
    got_spark = spark.sql(
        "SELECT "
        + ", ".join(f"CAST({a} AS BIGINT) div {b} AS q{i}"
                    for i, (a, b) in enumerate(cases))
    ).first()
    got_duck = duckdb.connect().execute(
        "SELECT " + ", ".join(f"CAST({a} AS BIGINT) // {b}"
                              for a, b in cases)
    ).fetchone()
    for i, (a, b) in enumerate(cases):
        assert clf._tdiv(a, b) == got_spark[i] == got_duck[i], (a, b)


def test_driver_and_distributed_paths_identical(spark, docs):
    feats = tx.hashed_features(docs, "text", ["doc_id"], dim=32)
    labels = _labels(docs)
    kw = dict(dim=32, iterations=4, lr_num=1, lr_den=16)
    w_drv, b_drv = clf.train_quality_classifier(
        feats, labels, **kw, driver_threshold_rows=10**9
    )
    w_dst, b_dst = clf.train_quality_classifier(
        feats, labels, **kw, driver_threshold_rows=0
    )
    assert w_drv == w_dst
    assert b_drv == b_dst
    assert any(w != 0 for w in w_drv)  # training actually moved


def test_classifier_learns_planted_labels(spark, docs):
    feats = tx.hashed_features(docs, "text", ["doc_id"], dim=64)
    labels = _labels(docs)
    w, b = clf.train_quality_classifier(
        feats, labels, dim=64, iterations=12, lr_num=1, lr_den=16
    )
    scored = docs.join(labels, "doc_id").select(
        "label", clf.quality_score_expr("text", w, b).alias("s")
    ).collect()
    # Wilcoxon-Mann-Whitney AUC with midrank ties
    rows = sorted((r["s"], r["label"]) for r in scored)
    n = len(rows)
    i = 0
    rank_sum_pos = 0.0
    n1 = sum(1 for _, y in rows if y == 1)
    n0 = n - n1
    while i < n:
        j = i
        while j + 1 < n and rows[j + 1][0] == rows[i][0]:
            j += 1
        mid = (i + 1 + j + 1) / 2.0
        rank_sum_pos += mid * sum(1 for k in range(i, j + 1) if rows[k][1])
        i = j + 1
    auc = (rank_sum_pos - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    assert n1 > 20 and n0 > 20  # both classes present
    assert auc > 0.9, auc


def test_score_expr_is_hard_sigmoid_of_margin(spark, docs):
    """quality_score_expr's token fold must equal the margin the training
    loop computes from hashed_features — same md5 buckets, same div."""
    feats = tx.hashed_features(docs, "text", ["doc_id"], dim=16)
    w = list(range(-8, 8))  # arbitrary fixed weights, pos and neg
    b = -31
    w_sql = "array(" + ", ".join(f"{x}L" for x in w) + ")"
    margins = {
        r["doc_id"]: r["m"]
        for r in feats.groupBy("doc_id").agg(
            F.sum(F.expr(
                f"count * element_at({w_sql}, feature + 1)"
            )).alias("m")
        ).collect()
    }
    scored = docs.select(
        "doc_id", clf.quality_score_expr("text", w, b, scale=10**6).alias("s")
    ).collect()
    for r in scored:
        z = margins.get(r["doc_id"], 0) + b
        assert r["s"] == max(0, min(10**6, clf._tdiv(z, 4) + 500000))


def test_validation_errors(spark, docs):
    feats = tx.hashed_features(docs.limit(5), "text", ["doc_id"], dim=8)
    with pytest.raises(ValueError, match="positive"):
        clf.train_quality_classifier(feats, _labels(docs.limit(5)), dim=0)
    with pytest.raises(ValueError, match="no labeled rows"):
        clf.train_quality_classifier(
            feats, _labels(docs).limit(0), dim=8
        )


def test_quality_mixture_rates_and_determinism(spark):
    """The mixture entry must keep ALL of 'high', ~half of 'mid', ~1/8 of
    'low', and be bit-reproducible across runs (training and the Lehmer
    sample are both deterministic)."""
    from carto_etl_spark.queries import q_quality_mixture

    a = {(r["doc_id"]): (r["bucket"], r["kept"])
         for r in q_quality_mixture(spark, SF).collect()}
    b = {(r["doc_id"]): (r["bucket"], r["kept"])
         for r in q_quality_mixture(spark, SF).collect()}
    assert a == b
    by_bucket: dict = {}
    for bucket, kept in a.values():
        n, k = by_bucket.get(bucket, (0, 0))
        by_bucket[bucket] = (n + 1, k + int(kept))
    n, k = by_bucket.get("high", (0, 0))
    assert n > 0 and k == n  # rate 1.0: every high doc kept
    for name, rate in (("mid", 0.5), ("low", 0.125)):
        n, k = by_bucket.get(name, (0, 0))
        if n >= 40:  # enough mass for a loose binomial band
            assert abs(k / n - rate) < 0.2, (name, k, n)


def test_arrow_scores_bit_identical_to_expr(spark, docs):
    """quality_scores_arrow must agree with quality_score_expr on every
    document — including whitespace edge cases the Java \\s class defines
    (tabs, newlines, vertical tab, NBSP which is NOT Java \\s, empty and
    NULL text) — because pipeline gates may dispatch either path."""
    feats = tx.hashed_features(docs, "text", ["doc_id"], dim=32)
    labels = _labels(docs)
    w, b = clf.train_quality_classifier(
        feats, labels, dim=32, iterations=4, lr_num=1, lr_den=16
    )
    edge = spark.createDataFrame(
        [
            (10**6, "a\tb\nc\x0bd\fe\rf"),
            (10**6 + 1, "  leading and trailing  "),
            (10**6 + 2, "nbsp is one token in java regex"),
            (10**6 + 3, ""),
            (10**6 + 4, None),
            (10**6 + 5, "unicode tøkens ünd emoji \U0001f600 ok"),
        ],
        "doc_id long, text string",
    )
    d = docs.select("doc_id", "text").unionByName(edge)
    via_expr = {
        r["doc_id"]: r["s"]
        for r in d.select(
            "doc_id",
            clf.quality_score_expr("text", w, b).alias("s"),
        ).collect()
    }
    via_arrow = {
        r["doc_id"]: r["score_scaled"]
        for r in clf.quality_scores_arrow(d, "text", w, b).collect()
    }
    assert via_expr == via_arrow
    assert len(via_arrow) == d.count()


def test_hashed_features_bigrams_match_duckdb(spark, docs):
    """fastText-style ngram=2 features (unigrams + space-joined bigrams in
    one hashing space) must agree row-for-row with the DuckDB oracle twin,
    including single-token and empty documents (zero bigrams)."""
    import duckdb

    edge = spark.createDataFrame(
        [(10**6, "solo"), (10**6 + 1, ""), (10**6 + 2, "a b")],
        "doc_id long, text string",
    )
    d = docs.select("doc_id", "text").unionByName(edge)
    got = {
        (r["doc_id"], r["feature"]): r["count"]
        for r in tx.hashed_features(d, "text", ["doc_id"], dim=32, ngram=2)
        .collect()
    }
    con = duckdb.connect()
    con.register("docs_pd", d.toPandas())
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            tx.hashed_features_oracle_sql(
                "SELECT doc_id, text FROM docs_pd", ["doc_id"],
                dim=32, ngram=2,
            )
        ).fetchall()
    }
    assert got == want
    # bigrams genuinely present: the "a b" doc has its bigram bucket
    two = tx.hashed_features(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string"),
        "text", ["doc_id"], dim=32, ngram=2,
    ).agg(F.sum("count")).first()[0]
    assert two == 3  # 'a', 'b', 'a b'
