"""Gopher QUALITY rule table (operators/gopher.py, arXiv:2112.11446
§A.1.1): exact signal accounting on handcrafted docs, each rule's flag in
isolation, the toy-scale threshold knobs, expr/arrow bit-identity, and the
zero-shuffle plan contract of the default projection path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.gopher import (
    ALPHA_WORD_FRAC_MIN,
    BULLET_PREFIXES,
    GOPHER_STOPWORDS,
    gopher_quality,
)

# 57 words, mean len in range, 2 distinct stopwords (the, and), fully
# alphabetic: passes.
GOOD = ("the quick brown fox jumps over lazy dogs daily " * 6
        + "and some more")


def _run(spark, rows, method="expr", **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = gopher_quality(df, method=method, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_published_rules_each_fire_alone(spark):
    rows = [
        (0, GOOD),
        # word count: 10 words < 50
        (1, "the of words too few here to pass minimum count"),
        # mean word length > 10 (long pseudo-words), padded to 52 words
        (2, ("extraordinarily overcomplicated " * 26) + "the of"),
        # hash ratio: >10% '#' per word
        (3, GOOD + " " + "# " * 12),
        # ellipsis ratio: >10% '...' per word
        (4, GOOD + " " + "... " * 12),
        # bullet lines: >90% of lines start with bullets
        (5, "\n".join(f"{BULLET_PREFIXES[i % len(BULLET_PREFIXES)]} item"
                      for i in range(30)) + "\n" + GOOD),
        # ellipsis-ended lines: >30%
        (6, "\n".join(["to be continued..."] * 5 + [GOOD])),
        # alpha words: < 80% contain a letter
        (7, GOOD + " " + "123 456 789 000 111 222 333 444 555 666 777 "
            "888 999 101 202"),
        # stopwords: none of the 8
        (8, "quick brown fox jumps high " * 11),
    ]
    got = _run(spark, rows)
    assert got[0]["passes"] is True
    fails = {
        1: "word_count_ok", 3: "hash_ratio_ok", 4: "ellipsis_ratio_ok",
        5: "bullet_lines_ok", 6: "ellipsis_lines_ok",
        7: "alpha_frac_ok", 8: "stopwords_ok",
    }
    for doc, flag in fails.items():
        assert got[doc][flag] is False, (doc, flag, got[doc])
        assert got[doc]["passes"] is False, doc
    assert got[2]["mean_word_len_ok"] is False
    # doc 2's long words are alphabetic and stopworded — only the length
    # rules fire
    assert got[2]["alpha_frac_ok"] is True


def test_exact_signal_accounting(spark):
    # 8 tokens: the THE of## x.... | - bullet | ends here...
    # '#'x2; non-overlapping ellipsis scan: 'x....' -> 1, 'here...' -> 1;
    # 2 DISTINCT stopwords ('the' twice counts once, + 'of##' is NOT
    # 'of'); 3 lines: line 2 bullets after the tab indent, lines 1 AND 3
    # end in '...' (line 3 after trailing-space strip)
    text = "the THE of x....\n\t- bullet\nends here...   "
    got = _run(spark, [(1, text)])[1]
    assert got["n_words"] == 8
    assert got["n_stopwords"] == 2
    assert got["hash_word_ratio"] == 0.0
    assert got["ellipsis_word_ratio"] == round(2 / 8, 6)
    assert got["bullet_line_frac"] == round(1 / 3, 6)
    assert got["ellipsis_line_frac"] == round(2 / 3, 6)
    # alpha words: all except '-' and 'x....'... 'x....' HAS a letter ->
    # only '-' lacks one: 7 of 8
    assert got["alpha_word_frac"] == round(7 / 8, 6)
    # hash accounting on a separate doc: 2 '#'s in one 8-token doc
    got2 = _run(spark, [(1, "the of a# b# c d e f")])[1]
    assert got2["n_words"] == 8
    assert got2["hash_word_ratio"] == round(2 / 8, 6)


def test_degenerate_inputs_zero_not_null(spark):
    got = _run(spark, [(1, ""), (2, None), (3, "   \t  ")])
    for d in (1, 2, 3):
        assert got[d]["n_words"] == 0
        assert got[d]["mean_word_len"] == 0.0
        assert got[d]["alpha_word_frac"] == 0.0
        assert got[d]["passes"] is False


def test_toy_scale_knobs(spark):
    short = "the quick brown fox jumps of ten words here now"
    strict = _run(spark, [(1, short)])[1]
    assert strict["word_count_ok"] is False
    loose = _run(
        spark, [(1, short)], word_count_min=10, min_stopwords=1
    )[1]
    assert loose["word_count_ok"] is True
    assert loose["passes"] is True


def test_stopword_count_is_distinct(spark):
    # 'the' 60 times = ONE distinct stopword -> fails min 2
    got = _run(spark, [(1, "the " * 60)])[1]
    assert got["n_stopwords"] == 1
    assert got["stopwords_ok"] is False
    # every stopword once
    got2 = _run(spark, [(1, " ".join(GOPHER_STOPWORDS * 7))])[1]
    assert got2["n_stopwords"] == len(GOPHER_STOPWORDS)


def test_expr_and_arrow_bit_identical(spark):
    rows = [
        (1, GOOD),
        (2, "x\xa0y stays one token the of"),  # \xa0 is NOT Java \s
        (3, "• ……...\n‣ ▪ ● - *\n#"),
        (4, "Ünïcödé wörds the of " * 13),
        (5, None),
        (6, ""),
    ]
    e = _run(spark, rows, method="expr")
    a = _run(spark, rows, method="arrow")
    assert e == a


def test_unknown_method_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="method"):
        gopher_quality(df, method="pandas")


def test_expr_path_plans_no_shuffle(spark):
    """The flagship 100 TB property: the default path is a pure
    projection — no Exchange anywhere in the physical plan."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(GOOD).alias("text")
    )
    plan = (
        gopher_quality(df, method="expr")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_keep_cols_passthrough_both_methods(spark):
    """keep_cols carries input columns (e.g. the text) through to the
    output on both paths — the fineweb composition gates on ``passes``
    without a semi-join back onto the corpus — and must not disturb the
    quality columns themselves."""
    rows = [(1, GOOD), (2, "too few words"), (3, None)]
    base = _run(spark, rows, method="expr")
    for method in ("expr", "arrow"):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = gopher_quality(df, method=method, keep_cols=["text"])
        assert out.columns[:2] == ["doc_id", "text"]
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
        for doc_id, text in rows:
            row = got[doc_id]
            assert row.pop("text") == text
            assert row == base[doc_id], (method, doc_id)


def test_keep_cols_clash_raises(spark):
    df = spark.createDataFrame([(1, "x", True)], ["doc_id", "text", "passes"])
    with pytest.raises(ValueError, match="collide"):
        gopher_quality(df, keep_cols=["passes"])


def test_keep_cols_expr_path_still_no_shuffle(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(GOOD).alias("text")
    )
    plan = (
        gopher_quality(df, method="expr", keep_cols=["text"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
