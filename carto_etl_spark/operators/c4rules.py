"""C4 heuristic cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2)
— the line- and page-level filters that turned CommonCrawl into C4, and the
template FineWeb/RefinedWeb-style pipelines still start from:

line level (a page's text is cleaned line by line, then re-joined):
  - keep only lines ending in a terminal punctuation mark (. ! ? " ”);
  - keep only lines with at least ``min_words`` words (paper: 3);
  - drop any line containing the word "javascript" (case-insensitive);
page level (on the ORIGINAL page, per the paper):
  - drop pages containing "lorem ipsum" (case-insensitive);
  - drop pages containing a curly bracket;
  - drop pages whose CLEANED text has fewer than ``min_sentences``
    sentences (paper: 5) — sentence count approximated as the number of
    terminal .!? marks in the kept lines (the paper's own pipeline uses a
    heuristic splitter; this one is engine-portable);
  - optional blocklist terms (the paper's "dirty word" list) via the
    word-boundary matcher in operators/blocklist.py.

Everything is a single scan-stage expression chain: split on newlines,
``F.filter`` the line array with pure string predicates, re-join.  No
shuffle, no UDF — the per-line regexes run inside the JVM row loop, which
is exactly where any engine pays this cost; at 100 TB the operator is
embarrassingly parallel and fuses into whatever scan feeds it (gate +
scrub + dedup-prep in one pass, as pipeline_e2e composes its gates).
The ~10-100 lines/doc array stays far below the interpreted-HOF volumes
SCALING.md prices (per-token folds at 10^2-10^3 elements are the same
order); the whole chain is one projection.

The reference has no text-cleaning surface (it ships rows to PostgreSQL,
/root/reference/etl/etl.py); this module belongs to the LLM-pipeline
extension suite beside blocklist.py / scrub.py / html.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.operators.blocklist import match_count_expr

__all__ = [
    "TERMINAL_PUNCT_RE",
    "keep_line_expr",
    "c4_line_filter",
    "c4_filter",
    "c4_oracle_sql",
]

#: terminal-punctuation line endings the paper keeps: period, exclamation,
#: question mark, and a closing quote.  The published C4 set is
#: {. ? ! "}; we extend it with BOTH curly closers ” (U+201D) and
#: ’ (U+2019) so smart-quoted prose is treated symmetrically with
#: straight-quoted prose — a documented deviation (r8 ADVICE: carrying
#: only ” dropped lines ending in a curly-apostrophe quotation while
#: keeping their straight-quote twins).
TERMINAL_PUNCT_RE = '[.!?"”’]$'

_SENTENCE_RE = "[.!?]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _strip(line: Column) -> Column:
    """Whitespace strip matching the paper pipeline's ``str.strip()`` —
    plain ``trim`` removes only 0x20 spaces (tabs would survive and defeat
    the terminal-punct rule); both engines run the same regex."""
    return F.regexp_replace(line, r"^\s+|\s+$", "")


def keep_line_expr(line: Column, min_words: int = 3) -> Column:
    """C4's line predicate on a raw (untrimmed) line."""
    t = _strip(line)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    return (
        t.rlike(TERMINAL_PUNCT_RE)
        & (F.size(words) >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_line_filter(text: Column | str, min_words: int = 3) -> Column:
    """Cleaned text: newline-split, line rules applied, kept lines trimmed
    and re-joined with newlines."""
    lines = F.split(F.coalesce(_col(text), F.lit("")), "\n")
    kept = F.filter(lines, lambda l: keep_line_expr(l, min_words))
    # NB: the lambda must stay explicit — passing a pyspark builtin
    # point-free (e.g. F.trim) resolves its deprecated two-parameter form
    # against the (element, index) lambda and silently changes semantics.
    return F.array_join(F.transform(kept, lambda l: _strip(l)), "\n")


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    min_words: int = 3,
    min_sentences: int = 5,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the full C4 rule set.  Returns one row per input document:
    (*id_cols, clean_text, n_lines, n_kept, n_sentences, doc_kept) —
    ``doc_kept`` folds in every page rule, and consumers keep
    ``doc_kept AND clean_text`` rows.  Emitting flags instead of
    pre-filtering keeps the operator auditable (kept/dropped counts are
    one aggregation away) and lets the gate fuse into any downstream scan.
    """
    ids = list(id_cols or [])
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(raw, "\n")
    kept = F.filter(lines, lambda l: keep_line_expr(l, min_words))
    clean = F.array_join(F.transform(kept, lambda l: _strip(l)), "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(_SENTENCE_RE), 0))
    page_ok = (
        ~F.lower(raw).contains("lorem ipsum")
        & ~raw.contains("{")
        & (n_sent >= min_sentences)
    )
    if blocklist:
        page_ok = page_ok & (match_count_expr(raw, blocklist) == 0)
    return df.select(
        *ids,
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.cast("long").alias("n_sentences"),
        page_ok.alias("doc_kept"),
    )


def c4_oracle_sql(
    rows_sql: str,
    id_cols: list[str],
    min_words: int = 3,
    min_sentences: int = 5,
) -> str:
    """DuckDB twin of `c4_filter` (no blocklist arm; compose
    blocklist.py's SQL separately if needed).  ``rows_sql`` must yield the
    id columns plus ``text``.

    Parity notes: DuckDB ``string_split`` on newline == Spark ``F.split``
    (both keep trailing empties and both map '' to ['']); the kept-line
    count comes from the filtered LIST, never from re-splitting the joined
    string (which cannot distinguish zero kept lines from one empty
    line)."""
    ids = ", ".join(id_cols)
    st = "regexp_replace(l, '^\\s+|\\s+$', '', 'g')"
    keep = (
        "list_filter(lines, l -> "
        f"regexp_matches({st}, '{TERMINAL_PUNCT_RE}') "
        f"AND len(list_filter(string_split_regex({st}, '\\s+'), "
        f"x -> x != '')) >= {min_words} "
        f"AND NOT contains(lower({st}), 'javascript'))"
    )
    return f"""
WITH base AS (
  SELECT {ids}, COALESCE(text, '') AS raw,
         string_split(COALESCE(text, ''), chr(10)) AS lines
  FROM ({rows_sql}) r
), cleaned AS (
  SELECT {ids}, raw, lines, {keep} AS kept
  FROM base
), joined AS (
  SELECT {ids}, raw, lines, kept,
         -- COALESCE: DuckDB array_to_string([]) is NULL where Spark's
         -- array_join([]) is '' — a doc whose every line is dropped must
         -- come back as empty text, not NULL (caught by the builder
         -- differential test, invisible on corpora where every doc keeps
         -- a line)
         COALESCE(array_to_string(list_transform(kept,
             l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), chr(10)), '')
           AS clean_text
  FROM cleaned
)
SELECT {ids}, clean_text,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(regexp_extract_all(clean_text, '{_SENTENCE_RE}'))
            AS BIGINT) AS n_sentences,
       (NOT contains(lower(raw), 'lorem ipsum')
        AND NOT contains(raw, '{{')
        AND len(regexp_extract_all(clean_text, '{_SENTENCE_RE}'))
            >= {min_sentences}) AS doc_kept
FROM joined
"""
