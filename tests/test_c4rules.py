"""C4 heuristic cleaning rules (operators/c4rules.py): line rules, page
rules, trimming, NULL text, unicode quotes, and the blocklist arm."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.c4rules import c4_filter, c4_line_filter

GOOD = "the quick brown fox jumps high."


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = c4_filter(df, "text", ["doc_id"], **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_line_rules(spark):
    text = "\n".join(
        [
            GOOD,                        # kept
            "no terminal punctuation",   # dropped: ending
            "two words.",                # dropped: < 3 words
            "uses javascript heavily.",  # dropped: javascript
            "A fine question indeed?",   # kept: ?
            'He said "stop right there!"',  # kept: ends in quote
            "ends with curly quote”",  # kept: ” terminal
            "",                          # dropped: empty
        ]
    )
    got = _run(spark, [(1, text)], min_sentences=1)[1]
    kept = got["clean_text"].split("\n")
    assert kept == [
        GOOD,
        "A fine question indeed?",
        'He said "stop right there!"',
        "ends with curly quote”",
    ]
    assert got["n_lines"] == 8 and got["n_kept"] == 4
    assert got["doc_kept"]


def test_kept_lines_are_trimmed(spark):
    """Padded kept lines come back trimmed — regression for the point-free
    F.transform(kept, F.trim) resolving to two-parameter trim (a silent
    no-op)."""
    text = "   " + GOOD + "   \n\t one two three four. \t"
    got = _run(spark, [(1, text)], min_sentences=1)[1]
    assert got["clean_text"] == GOOD + "\none two three four."


def test_page_rules(spark):
    five = "\n".join([GOOD] * 5)
    rows = [
        (1, five),                                 # kept
        (2, five + "\nsee lorem ipsum text."),     # lorem -> dropped
        (3, five + "\nhas a { brace inside."),     # brace -> dropped
        (4, "\n".join([GOOD] * 4)),                # only 4 sentences
        (5, None),                                 # NULL text
    ]
    got = _run(spark, rows)
    assert got[1]["doc_kept"]
    assert not got[2]["doc_kept"]
    assert not got[3]["doc_kept"]
    assert not got[4]["doc_kept"] and got[4]["n_sentences"] == 4
    assert not got[5]["doc_kept"] and got[5]["clean_text"] == ""


def test_sentence_count_inside_lines(spark):
    """min_sentences counts terminal marks in the KEPT text, so one line
    holding five sentences passes the page rule."""
    got = _run(spark, [(1, "One. Two. Three. Four. Five.")])
    assert got[1]["n_sentences"] == 5 and got[1]["doc_kept"]


def test_blocklist_arm(spark):
    five = "\n".join([GOOD] * 5)
    rows = [(1, five), (2, five + "\nthe bad word is casino money.")]
    got = _run(spark, rows, blocklist=("casino",))
    assert got[1]["doc_kept"] and not got[2]["doc_kept"]
    # the blocklist is a PAGE rule: the line itself still passes line rules
    assert "casino" in got[2]["clean_text"]


def test_line_filter_expr_standalone(spark):
    df = spark.createDataFrame([("ok line here.\nnope",)], ["t"])
    out = df.select(c4_line_filter("t").alias("c")).first()["c"]
    assert out == "ok line here."
