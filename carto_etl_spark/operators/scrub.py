"""PII / boilerplate scrubbing for training-data pipelines: regex redaction
of emails, URLs, IPv4 addresses, and phone-shaped numbers, with per-category
match counts.

Not in the reference (its string surface is strip/lower/replace,
/root/reference/etl/etl.py:70-83); a mandated north-star operator — corpus
pipelines scrub obvious PII before training, and the workhorse is exactly
this: a fixed pass of anchored regex replacements, entirely inside
whole-stage codegen (``regexp_replace`` / ``regexp_count``), no UDFs.

Pattern dialect: every pattern is written in the common subset of Java
regex (Spark) and RE2 (duckdb oracle) — character classes, bounded repeats,
``\\b`` word boundaries; NO lookaround, NO backreferences — so the oracle
can replay the scrub value-for-value.  Order matters and is fixed: URL
before email (a URL can embed ``user@host`` path text), email before phone
(digits in mail domains must already be gone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


#: (category, pattern, replacement token) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d \-]{6,}\d\b", "<PHONE>"),
)


def pii_count_exprs(text: Column | str) -> dict[str, Column]:
    """Match count per category, measured on the progressively-scrubbed text
    exactly as the scrub pass sees it (so an email inside a URL counts as the
    URL, not both)."""
    cur = _col(text)
    out: dict[str, Column] = {}
    for cat, pat, token in PII_PATTERNS:
        out[cat] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    return out


def scrub_expr(text: Column | str) -> Column:
    """The scrubbed text: all categories replaced by their tokens, in the
    fixed PII_PATTERNS order."""
    cur = _col(text)
    for _cat, pat, token in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, token)
    return cur


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its scrubbed form and append one
    ``n_<category>`` count column per PII category.  Pure projection — no
    shuffle, no UDF; safe at any scale."""
    counts = pii_count_exprs(text_col)
    return df.select(
        *[c for c in df.columns if c != text_col],
        scrub_expr(text_col).alias(text_col),
        *[counts[cat].alias(f"n_{cat}") for cat, _p, _t in PII_PATTERNS],
    )
