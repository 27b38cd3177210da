"""Property test for the Gopher repetition paths: for ARBITRARY unicode
text (exotic whitespace, combining marks, astral chars, control chars,
embedded newlines), the map-only Arrow counting path and the relational
tagged-explode path must agree EXACTLY on every emitted column — the
bit-identity the operator's default dispatch rests on.

One hypothesis case evaluates a whole batch of documents in two DataFrame
passes (per-example Spark jobs would be prohibitively slow)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from carto_etl_spark.operators.gopher import gopher_repetition

# full unicode minus surrogates, plus whitespace/newline-rich alphabets
# (newlines exercise the line signals; the \x0b/\f/\xa0 mix probes the
# Java-\s vs Python-\s divergence the Arrow tokenizer must avoid)
_texts = st.one_of(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFFF
        ),
        max_size=60,
    ),
    st.text(alphabet=" \t\n\x0b\f\r\xa0\nabé.\U0001f600", max_size=50),
    st.none(),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=30))
def test_arrow_and_expr_agree_on_arbitrary_unicode(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    a = sorted(tuple(r) for r in gopher_repetition(df, method="arrow").collect())
    b = sorted(tuple(r) for r in gopher_repetition(df, method="expr").collect())
    assert a == b


@settings(max_examples=20, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=30))
def test_quality_arrow_and_expr_agree_on_arbitrary_unicode(spark, docs):
    """Same contract for the QUALITY rule table: the scan-stage projection
    and the mapInPandas twin must agree exactly — including the Java-\\s
    line strips, the L*-letter test (isalpha vs \\p{L}), and the
    non-overlapping ellipsis scan."""
    from carto_etl_spark.operators.gopher import gopher_quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    a = sorted(tuple(r) for r in gopher_quality(df, method="arrow").collect())
    b = sorted(tuple(r) for r in gopher_quality(df, method="expr").collect())
    assert a == b
