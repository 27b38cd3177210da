"""Term-blocklist content filtering: flag/drop documents that match a
list of blocked words or phrases.

Not in the reference (its string surface is strip/lower/replace,
/root/reference/etl/etl.py:70-83); a north-star training-data operator —
the filtering complement to ``scrub.py`` (which redacts in place): corpus
pipelines drop or down-weight documents matching unsafe-term lists, and
the workhorse is ONE compiled alternation ``\\b(?:t1|t2|...)\\b`` evaluated
case-insensitively inside whole-stage codegen — one regex pass per
document no matter how many terms, no UDF, no shuffle.

Terms are validated to word characters, spaces, hyphens and apostrophes
(then regex-escaped where needed), so a term list can never inject regex
syntax.  Pattern dialect is the Java-regex/RE2 common subset; the DuckDB
oracle replays the same alternation.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERM_OK = re.compile(r"^[\w][\w '\-]*$")


def blocklist_pattern(terms: tuple[str, ...] | list[str]) -> str:
    """The shared alternation: case-insensitive, word-boundary-anchored,
    longest-first so a phrase wins over its own prefix word."""
    if not terms:
        raise ValueError("blocklist needs at least one term")
    for t in terms:
        if not _TERM_OK.match(t):
            raise ValueError(f"invalid blocklist term: {t!r}")
    escaped = sorted((re.escape(t.lower()) for t in terms), key=len,
                     reverse=True)
    return r"(?i)\b(?:" + "|".join(escaped) + r")\b"


def match_count_expr(text: Column | str, terms) -> Column:
    """Total blocked-term occurrences in ``text`` — one regex pass."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.regexp_count(c, F.lit(blocklist_pattern(terms)))


def first_match_expr(text: Column | str, terms) -> Column:
    """The first blocked term hit, lowercased ('' when clean) — the audit
    column reviewers ask for before a drop is approved."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.lower(F.regexp_extract(c, blocklist_pattern(terms), 0))


def flag(df: DataFrame, text_col: str, terms) -> DataFrame:
    """Append ``n_blocked`` / ``blocked`` / ``first_term``.  Pure
    projection; compose with ``.where(~F.col('blocked'))`` to drop."""
    n = match_count_expr(text_col, terms)
    return df.withColumns({
        "n_blocked": n,
        "blocked": n > 0,
        "first_term": first_match_expr(text_col, terms),
    })
