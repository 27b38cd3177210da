"""Gopher repetition table (operators/gopher.py): exact char accounting on
handcrafted docs, threshold flags, line signals, degenerate inputs, and the
tagged-gram lambda-arity regression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.gopher import (
    DUP_NGRAM_THRESHOLDS,
    TOP_NGRAM_THRESHOLDS,
    _tagged_grams,
    gopher_repetition,
)


def _run(spark, rows, method="arrow"):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = gopher_repetition(df, method=method)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_arrow_and_expr_paths_identical(spark):
    """The map-only Arrow path and the relational explode path must agree
    row-for-row, including unicode/odd whitespace (Java \\s vs Python \\s
    is the classic divergence) and duplicate lines."""
    rows = [
        (1, "x y x y z"),
        (2, "a b c d e a b c d e"),
        (3, "same line.\nsame line.\n\tTabbed  words nbsp here."),
        (4, ""),
        (5, None),
        (6, "one\x0btwo\fthree  four\r\nfive"),
    ]
    a = _run(spark, rows, method="arrow")
    b = _run(spark, rows, method="expr")
    assert a == b


def test_tagged_grams_tag_n_not_index(spark):
    """Regression: the per-n transform lambda must keep arity 1 — a
    two-parameter closure resolves as (element, index) and the tag column
    silently becomes the array position."""
    df = spark.createDataFrame([(["a", "b", "a", "b", "c"],)], ["t"])
    out = df.select(
        F.explode(_tagged_grams(F.col("t"), [2, 3])).alias("g")
    ).select("g.n", "g.gram")
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [
        (2, "a b"), (2, "a b"), (2, "b a"), (2, "b c"),
        (3, "a b a"), (3, "a b c"), (3, "b a b"),
    ]


def test_top_bigram_char_fraction_exact(spark):
    # tokens: x y x y z  -> joined "x y x y z" (9 chars)
    # 2-grams: "x y"(2), "y x"(1), "y z"(1); top mass = 2*3 = 6
    got = _run(spark, [(1, "x y x y z")])[1]
    assert got["n_chars_joined"] == 9
    assert got["top2gram_char_frac"] == round(6 / 9, 6)
    # 3-grams all distinct -> top3 = 1*5/9
    assert got["top3gram_char_frac"] == round(5 / 9, 6)
    assert got["dup5gram_char_frac"] == 0.0


def test_duplicated_5gram_mass_counts_every_occurrence(spark):
    # "a b c d e" twice -> 5-grams of the 10-token doc: 6 windows, the
    # window "a b c d e" occurs at positions 1 and 6 -> c=2, len 9;
    # all other windows distinct. joined len = 19.
    text = "a b c d e a b c d e"
    got = _run(spark, [(1, text)])[1]
    assert got["dup5gram_char_frac"] == round(2 * 9 / 19, 6)
    assert not got["passes"]  # 18/19 > 0.15


def test_line_signals(spark):
    text = "unique one.\nsame line.\nsame line.\nother."
    got = _run(spark, [(1, text)])[1]
    assert got["dup_line_frac"] == 0.5  # 2 of 4 lines duplicated
    chars = len("unique one.") + 2 * len("same line.") + len("other.")
    assert got["dup_line_char_frac"] == round(2 * len("same line.") / chars, 6)


def test_degenerate_docs(spark):
    got = _run(spark, [(1, ""), (2, "word"), (3, None)])
    for i in (1, 2, 3):
        assert got[i]["dup5gram_char_frac"] == 0.0
        assert got[i]["top2gram_char_frac"] == 0.0
        assert got[i]["passes"]
    assert got[2]["n_chars_joined"] == 4


def test_clean_text_passes_thresholds(spark):
    text = ". ".join(f"w{i} v{i} u{i}" for i in range(30)) + "."
    got = _run(spark, [(1, text)])[1]
    assert got["passes"]
    for n in TOP_NGRAM_THRESHOLDS:
        assert got[f"top{n}gram_char_frac"] <= TOP_NGRAM_THRESHOLDS[n]
    for n in DUP_NGRAM_THRESHOLDS:
        assert got[f"dup{n}gram_char_frac"] == 0.0
