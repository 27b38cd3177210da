"""TextRank plumbing (text.py:cooccurrence_edges): hand-checked adjacency
counts, symmetry, self-loop/short-doc handling, and end-to-end keyword
sanity on a corpus with a planted hub word."""

from __future__ import annotations

from pyspark.sql import functions as F

from carto_etl_spark.operators.graph import pagerank
from carto_etl_spark.operators.text import cooccurrence_edges


def _edges(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return {
        (r["src"], r["dst"]): r["w"]
        for r in cooccurrence_edges(df, "text").collect()
    }


def test_hand_counts_and_symmetry(spark):
    got = _edges(spark, ["a b a b c", "b a"])
    # ordered adjacencies: (a,b)x2, (b,a)x1+1, (b,c)x1 -> symmetrized sums
    assert got[("a", "b")] == got[("b", "a")] == 4
    assert got[("b", "c")] == got[("c", "b")] == 1
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def test_self_loops_dropped_and_short_docs_ok(spark):
    got = _edges(spark, ["x x x", "solo", "", "Y! y?"])
    # "x x x" is all self-adjacency; "Y! y?" lowercases to y y -> self too
    assert got == {}


def test_case_and_punctuation_fold_like_bpe(spark):
    got = _edges(spark, ["Alpha, BETA. alpha"])
    assert got[("alpha", "beta")] == got[("beta", "alpha")] == 2


def test_hub_word_ranks_first(spark):
    # 'hub' is adjacent to every other word; TextRank must rank it top
    texts = [f"hub word{i}" for i in range(8)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    pr = pagerank(cooccurrence_edges(df, "text"), iterations=10)
    top = pr.orderBy(F.desc("rank_scaled"), "node").first()
    assert top["node"] == "hub"
