"""Duplicated token-span removal (operators/dedup.py:drop_repeated_spans,
ExactSubstr-style): hand-computed semantics — cross-doc span cut, overlap
merge into maximal spans, within-doc repeats, short-doc passthrough,
whitespace-insensitive tokenization — plus the plan property that the
duplicate-gram count collapses map-side (partial aggregate before the
exchange)."""

from __future__ import annotations

from carto_etl_spark.operators import dedup as dd
from carto_etl_spark.plans.inspect import explain_str

SHARED = "the quick brown fox jumps over the lazy"  # exactly 8 tokens


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_cross_doc_shared_span_cut(spark):
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {SHARED} gamma delta"),
            (2, f"one two three {SHARED} four five six"),
            (3, "entirely unique text with no duplicated window at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(dd.drop_repeated_spans(docs, k=8))
    assert out[1]["text"] == "alpha beta gamma delta"
    assert out[1]["dup_tokens"] == 8 and out[1]["n_dup_spans"] == 1
    assert out[2]["text"] == "one two three four five six"
    assert out[2]["dup_tokens"] == 8 and out[2]["n_dup_spans"] == 1
    # untouched doc: identical text, zero stats
    assert out[3]["text"].startswith("entirely unique")
    assert out[3]["dup_tokens"] == 0 and out[3]["n_dup_spans"] == 0
    assert out[3]["n_tokens"] == 10


def test_overlapping_windows_merge_into_one_maximal_span(spark):
    # a 10-token duplicated run => three overlapping 8-gram windows =>
    # ONE merged span of 10 tokens, not three spans of 8
    run = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, f"lead1 lead2 {run} tail1"), (2, f"x1 x2 x3 {run} y1 y2")],
        ["doc_id", "text"],
    )
    out = _rows(dd.drop_repeated_spans(docs, k=8))
    for i, expect in ((1, "lead1 lead2 tail1"), (2, "x1 x2 x3 y1 y2")):
        assert out[i]["text"] == expect
        assert out[i]["dup_tokens"] == 10
        assert out[i]["n_dup_spans"] == 1


def test_within_doc_repeat_marks_both_occurrences(spark):
    phrase = "p1 p2 p3 p4 p5 p6 p7 p8"
    docs = spark.createDataFrame(
        [(1, f"{phrase} filler1 filler2 filler3 {phrase}")],
        ["doc_id", "text"],
    )
    out = _rows(dd.drop_repeated_spans(docs, k=8))
    assert out[1]["text"] == "filler1 filler2 filler3"
    assert out[1]["dup_tokens"] == 16
    assert out[1]["n_dup_spans"] == 2


def test_short_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "too short to carry any window"), (2, "tiny doc")],
        ["doc_id", "text"],
    )
    out = _rows(dd.drop_repeated_spans(docs, k=8))
    assert out[1]["text"] == "too short to carry any window"
    assert out[2]["text"] == "tiny doc"
    assert all(v["dup_tokens"] == 0 for v in out.values())


def test_whitespace_collapse_tokenization(spark):
    # same shared sentence, once separated by runs of spaces/newlines:
    # tokenization must collapse separators so the grams still match
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 {SHARED} u3"),
            (2, "v1  v2\n" + SHARED.replace(" ", "  ") + "\tv3 v4"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(dd.drop_repeated_spans(docs, k=8))
    assert out[1]["text"] == "u1 u2 u3"
    assert out[2]["text"] == "v1 v2 v3 v4"


def test_fully_covered_doc_survives_with_empty_text(spark):
    phrase = "q1 q2 q3 q4 q5 q6 q7 q8"
    docs = spark.createDataFrame(
        [(1, phrase), (2, phrase)], ["doc_id", "text"]
    )
    out = _rows(dd.drop_repeated_spans(docs, k=8))
    assert out[1]["text"] == "" and out[2]["text"] == ""
    assert out[1]["dup_tokens"] == 8


def test_dup_gram_count_is_partial_aggregate(spark):
    docs = spark.createDataFrame(
        [(1, f"a b {SHARED}"), (2, f"{SHARED} c d")], ["doc_id", "text"]
    )
    plan = explain_str(dd.drop_repeated_spans(docs, k=8))
    # the gram-count groupBy must collapse map-side: a partial HashAggregate
    # below the exchange (hot boilerplate grams shuffle one row/partition)
    assert "partial_count" in plan or "partial_finalmerge" in plan.lower()
