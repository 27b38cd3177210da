"""Differential tests for the rule-table ORACLE BUILDERS as library
functions: `c4_oracle_sql` and `gopher_repetition_sql` must reproduce
their Spark operators on handcrafted nasty documents (not just the
catalog corpus the driver checks) — quotes, unicode punctuation, tabs,
vertical whitespace, blank lines, braces, NULLs — via in-process DuckDB
(the test_classifier/test_graph pattern)."""

from __future__ import annotations

import duckdb
import pytest

from carto_etl_spark.operators.c4rules import c4_filter, c4_oracle_sql
from carto_etl_spark.operators.gopher import (
    gopher_repetition,
    gopher_repetition_sql,
)

DOCS = [
    (1, "A good first line here.\nno terminal\nshort.\n"
        'quoted "ending" works fine."\ncurly quote ending”\n'
        "Uses JavaScript heavily today.\nlast full sentence stands here."),
    (2, "lorem IPSUM mixed case.\nfive words in this one."),
    (3, "brace { in page.\notherwise a fine line here."),
    (4, ""),
    (5, None),
    (6, "\ttab lead sentence works.\n  spaced line with words.  \n"
        "dup line repeats twice.\ndup line repeats twice."),
    (7, "one. two. three. four. five. six sentences on one line."),
]


def _lit(t: str | None) -> str:
    """DuckDB escape-string literal — plain '...' does NOT interpret \\n,
    so multi-line docs must go through e'...'."""
    if t is None:
        return "NULL"
    s = (
        t.replace("\\", "\\\\")
        .replace("'", "''")
        .replace("\n", "\\n")
        .replace("\t", "\\t")
    )
    return f"e'{s}'"


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {_lit(t)})" for i, t in DOCS)
        + ") AS v(doc_id, text)"
    )
    return con.execute(sql).fetchall()


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_c4_oracle_builder_matches_spark(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = _norm(c4_filter(df, "text", ["doc_id"]).collect())
    want = _norm(_duck(c4_oracle_sql("SELECT doc_id, text FROM docs", ["doc_id"])))
    assert got == want


def test_gopher_oracle_builder_matches_both_paths(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    want = _norm(_duck(gopher_repetition_sql("SELECT doc_id, text FROM docs")))
    for method in ("arrow", "expr"):
        got = _norm(gopher_repetition(df, method=method).collect())
        assert got == want, method


def test_gopher_quality_oracle_builder_matches_both_paths(spark):
    from carto_etl_spark.operators.gopher import (
        gopher_quality,
        gopher_quality_sql,
    )

    extra = DOCS + [
        (8, "• bullet\n- dash\n* star\nnormal the of line."),
        (9, "dots...\nmore…\n##hash the of be"),
        (10, "ünïcöde wörds 漢字 and the " * 12),
    ]
    df = spark.createDataFrame(extra, "doc_id long, text string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {_lit(t)})" for i, t in extra)
        + ") AS v(doc_id, text)"
    )
    want = _norm(
        con.execute(
            gopher_quality_sql("SELECT doc_id, text FROM docs")
        ).fetchall()
    )
    for method in ("arrow", "expr"):
        got = _norm(gopher_quality(df, method=method).collect())
        assert got == want, method
