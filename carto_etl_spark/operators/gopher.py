"""Gopher repetition filters (Rae et al. 2021, arXiv:2112.11446 Table A1)
— the within-document repetition rule table that Gopher/MassiveText
introduced and FineWeb/Dolma-style pipelines still apply:

- fraction of characters in the MOST FREQUENT word n-gram, n in {2,3,4}
  (thresholds 0.20 / 0.18 / 0.16);
- fraction of characters in DUPLICATED word n-grams (n-grams occurring
  more than once), n in {5..10} (thresholds 0.15 down to 0.10);
- fraction of duplicate lines (0.30) and of characters in duplicate
  lines (0.20).

Character accounting (documented because published implementations vary):
tokens are whitespace-split, a gram's char length is the length of its
space-joined string (internal spaces count), and the denominator is the
length of the space-joined token stream — so every ratio is a quotient of
two exact integers, one IEEE division on both engines, no libm anywhere;
rounded to 6dp for display only, thresholds compared on the raw quotient.
Duplicated-gram char mass counts every occurrence (overlaps between
different n are inherent to the published rule; each n is its own signal).

Distributed shape: ONE explode of per-n tagged gram structs (sum over n
of L-n+1 rows/doc, ~9L), ``groupBy(doc, n, gram)`` with map-side combine,
then a conditional-aggregation pivot down to one row per doc; lines take
the same two-step shape at lines/doc volume.  No windows, no per-doc
quadratic HOFs (an array-side count-within-array is O(L^2) interpreted —
fine at 10 lines/doc, lethal at 10^4); shuffle volume is bounded by the
distinct (doc, n, gram) count.  At 100 TB every stage partial-aggregates
before the exchange, and AQE splits skewed hot documents.

The reference has no text-analysis surface (/root/reference/etl/etl.py
delegates to PostgreSQL); this module extends the LLM-pipeline suite
beside c4rules.py (line/page rules) and text.py (occurrence-level
repetition, dup_ngram_fraction_expr).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.operators.text import tokens_expr

__all__ = [
    "TOP_NGRAM_THRESHOLDS",
    "DUP_NGRAM_THRESHOLDS",
    "DUP_LINE_FRAC_MAX",
    "DUP_LINE_CHAR_FRAC_MAX",
    "gopher_repetition",
    "gopher_repetition_sql",
    "GOPHER_STOPWORDS",
    "BULLET_PREFIXES",
    "gopher_quality",
    "gopher_quality_sql",
]

#: Table A1 thresholds: max char-fraction of the top n-gram.
TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
#: Table A1 thresholds: max char-fraction in duplicated n-grams.
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20


def _tagged_grams(toks: Column, ns: list[int]) -> Column:
    """array<struct<n:int, gram:string>> of all word n-grams for every n in
    ``ns`` — one flatten feeds one explode, so all 9 gram families ride a
    single shuffle."""
    # NB: the per-n closure must come from a factory so the lambda keeps
    # arity 1 — `lambda i, n=n: ...` has two parameters, which pyspark
    # resolves as the (element, index) form and silently feeds the ARRAY
    # INDEX into `n` (cousin of the point-free F.trim trap in c4rules.py).
    def gram_fn(n: int):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice(toks, i, n)).alias("gram"),
        )

    per_n = [
        F.when(
            F.size(toks) - F.lit(n - 1) <= 0,
            F.array().cast("array<struct<n:int,gram:string>>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
                gram_fn(n),
            )
        )
        for n in ns
    ]
    return F.flatten(F.array(*per_n))


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "arrow",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher repetition signals + the overall ``passes``
    flag.  Empty / gram-less documents report 0.0 fractions (they carry no
    repeated mass; Gopher's word-count bound, not this filter, is what
    removes them).

    ``method="arrow"`` (default) counts per doc in one map-only
    ``mapInPandas`` pass; ``method="expr"`` is the all-relational twin
    (tagged explode + two keyed aggregations) — bit-identical by
    construction (both end in `_ratio_projection`; equality-tested), and
    6x slower at sf0.1 (9.4 s vs 1.5 s: within-doc counting pays an
    exchange plus interpreted slice/concat HOFs to be expressed
    relationally).

    ``keep_cols`` (arrow path only) passes input columns through to the
    output — same contract as ``gopher_quality``: a composition gating on
    ``passes`` keeps the text in the same map stage instead of semi-
    joining back onto the corpus.  The declarative twin aggregates an
    exploded gram stream, so a passthrough there would need its own join;
    it stays the oracle-shaped reference and rejects the knob."""
    if method == "arrow":
        return gopher_repetition_arrow(df, text_col, id_col, keep_cols)
    if method != "expr":
        raise ValueError(f"method must be 'arrow' or 'expr', got {method!r}")
    if keep_cols:
        raise ValueError("keep_cols is only supported with method='arrow'")
    ns_top = sorted(TOP_NGRAM_THRESHOLDS)
    ns_dup = sorted(DUP_NGRAM_THRESHOLDS)

    # ONE wide scan: tokens ride the tagged explode as 1-grams (their
    # aggregate recovers both the joined-char denominator and the word
    # count), lines ride it tagged n = -1 — so every signal shares a
    # single exchange instead of re-scanning the corpus per family.  A
    # second, id-column-only scan backstops documents that explode to
    # nothing (empty text).
    toks = df.select(
        id_col,
        tokens_expr(F.col(text_col)).alias("__t"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias("__lines"),
    )
    tagged = F.concat(
        _tagged_grams(F.col("__t"), [1] + ns_top + ns_dup),
        F.transform(
            F.col("__lines"),
            lambda l: F.struct(F.lit(-1).alias("n"), l.alias("gram")),
        ),
    )
    # Group on the 64-bit xxhash of (n, gram), not the gram string: the
    # shuffle row shrinks from an ~n-word string to (hash, len) longs and
    # the aggregate compares longs — the md5-fingerprint trick the dedup
    # family uses, with the same negligible within-doc collision odds
    # (~1e-12 at 10^4 grams/doc); the gram's char length rides as max()
    # since equal grams have equal lengths.
    rows = toks.select(id_col, F.explode(tagged).alias("g")).select(
        id_col,
        F.col("g.n").alias("n"),
        F.xxhash64("g.n", "g.gram").alias("__h"),
        F.length("g.gram").alias("__glen"),
    )
    counts = rows.groupBy(id_col, "n", "__h").agg(
        F.count(F.lit(1)).alias("__c"), F.max("__glen").alias("__len")
    )

    is_n = lambda n: F.col("n") == n  # noqa: E731
    mass = F.col("__c") * F.col("__len")
    dup = F.col("__c") >= 2
    per_doc = counts.groupBy(id_col).agg(
        # joined-char denominator: token chars + (L-1) separating spaces
        (
            F.sum(F.when(is_n(1), mass).otherwise(0))
            + F.greatest(F.sum(F.when(is_n(1), F.col("__c")).otherwise(0)) - 1, F.lit(0))
        ).alias("__chars"),
        *[F.max(F.when(is_n(n), mass)).alias(f"__top{n}") for n in ns_top],
        *[
            F.sum(F.when(is_n(n) & dup, mass).otherwise(0)).alias(f"__dup{n}")
            for n in ns_dup
        ],
        F.sum(F.when(is_n(-1), F.col("__c")).otherwise(0)).alias("__nlines"),
        F.sum(F.when(is_n(-1) & dup, F.col("__c")).otherwise(0)).alias("__duplines"),
        F.sum(F.when(is_n(-1), mass).otherwise(0)).alias("__linechars"),
        F.sum(F.when(is_n(-1) & dup, mass).otherwise(0)).alias("__duplinechars"),
    )
    out = df.select(id_col).join(per_doc, [id_col], "left")
    return _ratio_projection(out, id_col)


def _ratio_projection(
    int_df: DataFrame, id_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Shared final projection: integer signal columns (__chars, __top{n},
    __dup{n}, __nlines, __duplines, __linechars, __duplinechars — nullable)
    -> rounded fractions + the pass flag.  BOTH the declarative and the
    Arrow path end here, so every double division and round() is the same
    engine expression — the two paths can only agree or both be wrong."""
    ns_top = sorted(TOP_NGRAM_THRESHOLDS)
    ns_dup = sorted(DUP_NGRAM_THRESHOLDS)

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        )

    chars = F.coalesce(F.col("__chars"), F.lit(0))
    cols, ok = [], F.lit(True)
    for n in ns_top:
        f = frac(F.coalesce(F.col(f"__top{n}"), F.lit(0)), chars)
        cols.append(F.round(f, 6).alias(f"top{n}gram_char_frac"))
        ok = ok & (f <= F.lit(TOP_NGRAM_THRESHOLDS[n]))
    for n in ns_dup:
        f = frac(F.coalesce(F.col(f"__dup{n}"), F.lit(0)), chars)
        cols.append(F.round(f, 6).alias(f"dup{n}gram_char_frac"))
        ok = ok & (f <= F.lit(DUP_NGRAM_THRESHOLDS[n]))
    lf = frac(F.coalesce(F.col("__duplines"), F.lit(0)),
              F.coalesce(F.col("__nlines"), F.lit(0)))
    lcf = frac(F.coalesce(F.col("__duplinechars"), F.lit(0)),
               F.coalesce(F.col("__linechars"), F.lit(0)))
    cols += [
        F.round(lf, 6).alias("dup_line_frac"),
        F.round(lcf, 6).alias("dup_line_char_frac"),
    ]
    ok = ok & (lf <= F.lit(DUP_LINE_FRAC_MAX)) & (lcf <= F.lit(DUP_LINE_CHAR_FRAC_MAX))
    return int_df.select(id_col, *(keep_cols or []),
                         chars.cast("long").alias("n_chars_joined"),
                         *cols, ok.alias("passes"))


#: Java \s — the token/line splitting the engine expressions perform
#: (classifier.py quality_scores_arrow parity note).
_JAVA_WS = "[ \t\n\x0b\f\r]+"


def gopher_repetition_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Arrow twin of `gopher_repetition`: per-document integer counting in
    ONE ``mapInPandas`` pass — the within-doc Counter needs no exchange at
    all (every gram of a doc is already in the doc), so the shuffle the
    declarative path pays purely to express per-doc counting in relational
    algebra disappears.  The Python side produces ONLY exact integers
    (arbitrary precision, order-independent); the fractions come from the
    shared `_ratio_projection`, so results are bit-identical to the
    declarative path (equality-tested, including unicode whitespace).

    Scale posture: map-only (no exchange, no join); the per-batch cost is
    ~10 dict operations per token at C speed vs the interpreted
    slice/concat HOF chain — measured 5000 docs sf0.1: 11.8 s declarative
    vs ~1 s Arrow.  This is the default path; the declarative twin remains
    the oracle-shaped reference implementation."""
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    ns_top = sorted(TOP_NGRAM_THRESHOLDS)
    ns_dup = sorted(DUP_NGRAM_THRESHOLDS)
    int_cols = (
        ["__chars"]
        + [f"__top{n}" for n in ns_top]
        + [f"__dup{n}" for n in ns_dup]
        + ["__nlines", "__duplines", "__linechars", "__duplinechars"]
    )
    keep = list(keep_cols or [])
    out_names = (
        {id_col, "n_chars_joined", "passes", "dup_line_frac",
         "dup_line_char_frac"}
        | {f"top{n}gram_char_frac" for n in ns_top}
        | {f"dup{n}gram_char_frac" for n in ns_dup}
        | set(int_cols)
    )
    clash = [c for c in keep if c in out_names]
    if clash:
        raise ValueError(f"keep_cols collide with output columns: {clash}")
    id_field = df.schema[id_col]
    out_schema = StructType(
        [id_field]
        + [df.schema[c] for c in keep]
        + [StructField(c, LongType(), False) for c in int_cols]
    )
    split = re.compile(_JAVA_WS).split

    def _count_batches(batches):
        from collections import Counter

        for pdf in batches:
            rows = {c: [] for c in int_cols}
            for text in pdf[text_col]:
                toks = [t for t in split(text)] if text is not None else []
                toks = [t for t in toks if t]
                L = len(toks)
                tlens = [len(t) for t in toks]
                chars = sum(tlens) + max(L - 1, 0)
                rows["__chars"].append(chars)
                for n in ns_top:
                    best = 0
                    if L >= n:
                        cnt = Counter(
                            tuple(toks[i : i + n]) for i in range(L - n + 1)
                        )
                        for g, c in cnt.items():
                            glen = sum(map(len, g)) + n - 1
                            m = c * glen
                            if m > best:
                                best = m
                    rows[f"__top{n}"].append(best)
                for n in ns_dup:
                    tot = 0
                    if L >= n:
                        cnt = Counter(
                            tuple(toks[i : i + n]) for i in range(L - n + 1)
                        )
                        for g, c in cnt.items():
                            if c >= 2:
                                tot += c * (sum(map(len, g)) + n - 1)
                    rows[f"__dup{n}"].append(tot)
                lines = (text if text is not None else "").split("\n")
                lcnt = Counter(lines)
                rows["__nlines"].append(len(lines))
                rows["__duplines"].append(
                    sum(c for c in lcnt.values() if c >= 2)
                )
                rows["__linechars"].append(
                    sum(c * len(l) for l, c in lcnt.items())
                )
                rows["__duplinechars"].append(
                    sum(c * len(l) for l, c in lcnt.items() if c >= 2)
                )
            out = pdf[[id_col] + keep].copy()
            for c in int_cols:
                out[c] = rows[c]
            yield out

    ints = df.mapInPandas(_count_batches, schema=out_schema)
    return _ratio_projection(ints, id_col, keep)


def gopher_repetition_sql(rows_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin; ``rows_sql`` must yield (id, text).  Same char
    accounting, same conditional-aggregation pivot."""
    ns_top = sorted(TOP_NGRAM_THRESHOLDS)
    ns_dup = sorted(DUP_NGRAM_THRESHOLDS)
    all_ns = ", ".join(str(n) for n in ns_top + ns_dup)

    gram_aggs = ",\n         ".join(
        [
            f"max(CASE WHEN n = {n} THEN c * length(gram) END) AS top{n}"
            for n in ns_top
        ]
        + [
            f"COALESCE(sum(CASE WHEN n = {n} AND c >= 2 THEN c * length(gram) "
            f"ELSE 0 END), 0) AS dup{n}"
            for n in ns_dup
        ]
    )
    out_cols, ok_terms = [], []
    for n in ns_top:
        f = f"CASE WHEN chars > 0 THEN CAST(COALESCE(top{n}, 0) AS DOUBLE) / chars ELSE 0.0 END"
        out_cols.append(f"round({f}, 6) AS top{n}gram_char_frac")
        ok_terms.append(f"({f}) <= {TOP_NGRAM_THRESHOLDS[n]}")
    for n in ns_dup:
        f = f"CASE WHEN chars > 0 THEN CAST(COALESCE(dup{n}, 0) AS DOUBLE) / chars ELSE 0.0 END"
        out_cols.append(f"round({f}, 6) AS dup{n}gram_char_frac")
        ok_terms.append(f"({f}) <= {DUP_NGRAM_THRESHOLDS[n]}")
    lf = "CASE WHEN nlines > 0 THEN CAST(COALESCE(duplines, 0) AS DOUBLE) / nlines ELSE 0.0 END"
    lcf = "CASE WHEN linechars > 0 THEN CAST(COALESCE(duplinechars, 0) AS DOUBLE) / linechars ELSE 0.0 END"
    out_cols += [
        f"round({lf}, 6) AS dup_line_frac",
        f"round({lcf}, 6) AS dup_line_char_frac",
    ]
    ok_terms += [f"({lf}) <= {DUP_LINE_FRAC_MAX}", f"({lcf}) <= {DUP_LINE_CHAR_FRAC_MAX}"]
    ok = " AND ".join(ok_terms)
    sel = ",\n       ".join(out_cols)

    return rf"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
                     x -> x != '') AS t,
         COALESCE(text, '') AS raw
  FROM ({rows_sql}) r
), base AS (
  SELECT {id_col}, t,
         -- COALESCE: DuckDB array_to_string([]) is NULL (Spark joins []
         -- to ''), so a token-less doc must report 0 chars, not NULL
         -- (builder differential test)
         CAST(COALESCE(length(array_to_string(t, ' ')), 0) AS BIGINT)
           AS chars,
         string_split(raw, chr(10)) AS lines
  FROM toks
), grams AS (
  SELECT {id_col}, nn.n AS n, array_to_string(t[ii.i:ii.i+nn.n-1], ' ') AS gram
  FROM base,
       unnest([{all_ns}]) AS nn(n),
       unnest(range(1, greatest(len(t) - nn.n + 1, 0) + 1)) AS ii(i)
), gcounts AS (
  SELECT {id_col}, n, gram, count(*) AS c FROM grams GROUP BY {id_col}, n, gram
), per_doc_grams AS (
  SELECT {id_col},
         {gram_aggs}
  FROM gcounts GROUP BY {id_col}
), lrows AS (
  SELECT {id_col}, unnest(lines) AS line FROM base
), lcounts AS (
  SELECT {id_col}, line, count(*) AS c FROM lrows GROUP BY {id_col}, line
), per_doc_lines AS (
  SELECT {id_col},
         sum(c) AS nlines,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS duplines,
         sum(c * length(line)) AS linechars,
         sum(CASE WHEN c >= 2 THEN c * length(line) ELSE 0 END) AS duplinechars
  FROM lcounts GROUP BY {id_col}
), joined AS (
  SELECT b.{id_col}, b.chars,
         g.top2, g.top3, g.top4, g.dup5, g.dup6, g.dup7, g.dup8, g.dup9,
         g.dup10, l.nlines, l.duplines, l.linechars, l.duplinechars
  FROM base b
  LEFT JOIN per_doc_grams g ON b.{id_col} = g.{id_col}
  LEFT JOIN per_doc_lines l ON b.{id_col} = l.{id_col}
)
SELECT {id_col}, CAST(chars AS BIGINT) AS n_chars_joined,
       {sel},
       ({ok}) AS passes
FROM joined
"""


# ---------------------------------------------------------------------------
# Gopher QUALITY rule table (Rae et al. 2021, arXiv:2112.11446 §A.1.1)
# ---------------------------------------------------------------------------
#
# The non-repetition half of the published MassiveWeb filter; FineWeb
# applies BOTH halves.  Rules (document removed when violated):
#   - word count outside [50, 100_000]
#   - mean word length outside [3, 10]
#   - symbol-to-word ratio > 0.1 for EITHER '#' or the ellipsis
#   - > 90% of lines start with a bullet point
#   - > 30% of lines end with an ellipsis
#   - < 80% of words contain at least one alphabetic character
#   - fewer than 2 distinct words from the 8-word stop list
#     (the, be, to, of, and, that, have, with)
#
# Accounting pinned (published implementations vary): words are
# whitespace tokens (same split as the repetition table); symbol counts
# scan the RAW text left-to-right non-overlapping with '...' and the
# one-char '…' as ellipsis forms; a "bullet line" is one whose first
# char after leading whitespace is in BULLET_PREFIXES; an "ellipsis
# line" ends (after trailing-whitespace strip) in an ellipsis form;
# "alphabetic" is Unicode letter category L*; the stop-word rule counts
# DISTINCT lowercase-token hits.  Every ratio is a quotient of two exact
# integers — one IEEE division on every engine — with 0-denominator
# ratios defined as 0.0 (such documents already fail the word-count
# rule).

#: Published thresholds.
WORD_COUNT_MIN = 50
WORD_COUNT_MAX = 100_000
MEAN_WORD_LEN_MIN = 3.0
MEAN_WORD_LEN_MAX = 10.0
SYMBOL_WORD_RATIO_MAX = 0.1
BULLET_LINE_FRAC_MAX = 0.90
ELLIPSIS_LINE_FRAC_MAX = 0.30
ALPHA_WORD_FRAC_MIN = 0.80
MIN_STOPWORDS = 2

#: Gopher's 8-word stop list (§A.1.1, verbatim).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: First-character bullet markers (the paper says "bullet point" without
#: enumerating; this set — the common typographic bullets plus the two
#: markdown markers — is pinned here and mirrored by the SQL twin).
BULLET_PREFIXES = ("•", "‣", "▪", "●", "-", "*")

#: Non-overlapping left-to-right ellipsis scan: three dots or U+2026.
_ELLIPSIS_RE = r"\.\.\.|…"

_QUALITY_INT_COLS = [
    "__words", "__wchars", "__hash", "__ellipsis", "__alpha_words",
    "__stops", "__nlines", "__bullet_lines", "__ellipsis_lines",
]


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "expr",
    *,
    word_count_min: int = WORD_COUNT_MIN,
    word_count_max: int = WORD_COUNT_MAX,
    min_stopwords: int = MIN_STOPWORDS,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher quality signals + per-rule flags + ``passes``.

    Unlike the repetition table there is NO within-document n-gram
    counting here, so the default path is the pure projection
    (``method="expr"``): every signal is scan-stage column math — no
    explode, no aggregation, NO SHUFFLE AT ALL; at 100 TB this is a
    map-only pass whatever the corpus size.  ``method="arrow"`` is the
    mapInPandas twin kept to the repetition table's bit-identity
    contract: both paths produce the same exact integers and share
    `_quality_projection`, so they can only agree or both be wrong
    (equality-tested, including over arbitrary unicode).

    ``word_count_min`` / ``word_count_max`` / ``min_stopwords`` are
    data-scale knobs (published defaults); toy corpora with synthetic
    vocabularies override them the way pipeline compositions override
    C4's ``min_words`` — the rule SHAPE is what is pinned.

    ``keep_cols`` passes input columns (e.g. the text itself) through to
    the output, turning ``table.where("passes")`` into a single
    scan-stage filter-projection — a composition that gates on quality
    (pipeline.py fineweb) then needs NO semi-join back onto the corpus
    and no extra materialization boundary."""
    keep = list(keep_cols or [])
    reserved = {id_col, "n_words", "mean_word_len", "hash_word_ratio",
                "ellipsis_word_ratio", "alpha_word_frac", "n_stopwords",
                "bullet_line_frac", "ellipsis_line_frac", "passes",
                "word_count_ok", "mean_word_len_ok", "hash_ratio_ok",
                "ellipsis_ratio_ok", "bullet_lines_ok", "ellipsis_lines_ok",
                "alpha_frac_ok", "stopwords_ok"}
    clash = [
        c for c in keep
        if c in reserved or c in _QUALITY_INT_COLS or c in ("__t", "__l")
    ]
    if clash:
        raise ValueError(f"keep_cols collide with output columns: {clash}")
    if method == "arrow":
        ints = _quality_ints_arrow(df, text_col, id_col, keep)
    elif method == "expr":
        ints = _quality_ints_expr(df, text_col, id_col, keep)
    else:
        raise ValueError(f"method must be 'expr' or 'arrow', got {method!r}")
    return _quality_projection(
        ints, id_col,
        word_count_min=word_count_min,
        word_count_max=word_count_max,
        min_stopwords=min_stopwords,
        keep_cols=keep,
    )


def _quality_ints_expr(
    df: DataFrame, text_col: str, id_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Integer signals as pure column expressions (whole-stage codegen).

    Tokens and lines are staged in their own projection so CollapseProject
    does not rebuild the split chain once per referencing signal (the
    word_ngrams_expr lesson, text.py)."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    keep = list(keep_cols or [])
    staged = df.select(
        id_col,
        *keep,
        # tokenize the COALESCED text: NULL must report 0 words like the
        # Arrow twin, not size(NULL)=NULL
        tokens_expr(raw).alias("__t"),
        F.split(raw, "\n").alias("__lines"),
        raw.alias("__raw"),
    )
    toks = F.col("__t")
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    bullets = F.array(*[F.lit(b) for b in BULLET_PREFIXES])
    lstripped = lambda l: F.regexp_replace(l, r"^\s+", "")  # noqa: E731
    rstripped = lambda l: F.regexp_replace(l, r"\s+$", "")  # noqa: E731
    ends_ellipsis = lambda l: (  # noqa: E731
        rstripped(l).endswith("...") | rstripped(l).endswith("…")
    )
    return staged.select(
        id_col,
        *keep,
        F.size(toks).cast("long").alias("__words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("__wchars"),
        F.regexp_count(F.col("__raw"), F.lit("#")).cast("long").alias("__hash"),
        F.regexp_count(F.col("__raw"), F.lit(_ELLIPSIS_RE))
        .cast("long").alias("__ellipsis"),
        F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}")))
        .cast("long").alias("__alpha_words"),
        F.size(
            F.array_intersect(F.transform(toks, F.lower), stops)
        ).cast("long").alias("__stops"),
        F.size(F.col("__lines")).cast("long").alias("__nlines"),
        F.size(
            F.filter(
                F.col("__lines"),
                lambda l: F.array_contains(
                    bullets, F.substring(lstripped(l), 1, 1)
                ),
            )
        ).cast("long").alias("__bullet_lines"),
        F.size(F.filter(F.col("__lines"), ends_ellipsis))
        .cast("long").alias("__ellipsis_lines"),
    )


def _quality_ints_arrow(
    df: DataFrame, text_col: str, id_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Arrow twin: same exact integers, one map-only ``mapInPandas`` pass."""
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    keep = list(keep_cols or [])
    id_field = df.schema[id_col]
    out_schema = StructType(
        [id_field]
        + [df.schema[c] for c in keep]
        + [StructField(c, LongType(), False) for c in _QUALITY_INT_COLS]
    )
    split = re.compile(_JAVA_WS).split
    lstrip_re = re.compile(r"^[ \t\n\x0b\f\r]+")
    rstrip_re = re.compile(r"[ \t\n\x0b\f\r]+$")
    ell_re = re.compile(_ELLIPSIS_RE)
    stopset = set(GOPHER_STOPWORDS)
    bulletset = set(BULLET_PREFIXES)

    def _count_batches(batches):
        for pdf in batches:
            rows = {c: [] for c in _QUALITY_INT_COLS}
            for text in pdf[text_col]:
                raw = text if text is not None else ""
                toks = [t for t in split(raw) if t]
                rows["__words"].append(len(toks))
                rows["__wchars"].append(sum(len(t) for t in toks))
                rows["__hash"].append(raw.count("#"))
                rows["__ellipsis"].append(len(ell_re.findall(raw)))
                rows["__alpha_words"].append(
                    sum(1 for t in toks if any(ch.isalpha() for ch in t))
                )
                rows["__stops"].append(
                    len({t.lower() for t in toks} & stopset)
                )
                lines = raw.split("\n")
                rows["__nlines"].append(len(lines))
                rows["__bullet_lines"].append(
                    sum(
                        1
                        for l in lines
                        if lstrip_re.sub("", l)[:1] in bulletset
                    )
                )
                rows["__ellipsis_lines"].append(
                    sum(
                        1
                        for l in lines
                        if rstrip_re.sub("", l).endswith(("...", "…"))
                    )
                )
            out = pdf[[id_col] + keep].copy()
            for c in _QUALITY_INT_COLS:
                out[c] = rows[c]
            yield out

    return df.mapInPandas(_count_batches, schema=out_schema)


def _quality_projection(
    int_df: DataFrame,
    id_col: str,
    *,
    word_count_min: int,
    word_count_max: int,
    min_stopwords: int,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Shared final projection (both paths end here — the repetition
    table's bit-identity contract): integer signals -> rounded ratios,
    per-rule flags, and the conjunction ``passes``.  Thresholds compare
    the RAW quotient; round(6) is display-only."""

    def frac(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).otherwise(F.lit(0.0))

    words = F.col("__words")
    mwl = frac(F.col("__wchars"), words)
    hashr = frac(F.col("__hash"), words)
    ellr = frac(F.col("__ellipsis"), words)
    alphaf = frac(F.col("__alpha_words"), words)
    bulletf = frac(F.col("__bullet_lines"), F.col("__nlines"))
    elllf = frac(F.col("__ellipsis_lines"), F.col("__nlines"))
    flags = {
        "word_count_ok": (words >= word_count_min) & (words <= word_count_max),
        "mean_word_len_ok": (mwl >= MEAN_WORD_LEN_MIN) & (mwl <= MEAN_WORD_LEN_MAX),
        "hash_ratio_ok": hashr <= SYMBOL_WORD_RATIO_MAX,
        "ellipsis_ratio_ok": ellr <= SYMBOL_WORD_RATIO_MAX,
        "bullet_lines_ok": bulletf <= BULLET_LINE_FRAC_MAX,
        "ellipsis_lines_ok": elllf <= ELLIPSIS_LINE_FRAC_MAX,
        "alpha_frac_ok": alphaf >= ALPHA_WORD_FRAC_MIN,
        "stopwords_ok": F.col("__stops") >= min_stopwords,
    }
    passes = F.lit(True)
    for f in flags.values():
        passes = passes & f
    return int_df.select(
        id_col,
        *(keep_cols or []),
        words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(hashr, 6).alias("hash_word_ratio"),
        F.round(ellr, 6).alias("ellipsis_word_ratio"),
        F.round(alphaf, 6).alias("alpha_word_frac"),
        F.col("__stops").alias("n_stopwords"),
        F.round(bulletf, 6).alias("bullet_line_frac"),
        F.round(elllf, 6).alias("ellipsis_line_frac"),
        *[c.alias(n) for n, c in flags.items()],
        passes.alias("passes"),
    )


def gopher_quality_sql(
    rows_sql: str,
    id_col: str = "doc_id",
    *,
    word_count_min: int = WORD_COUNT_MIN,
    word_count_max: int = WORD_COUNT_MAX,
    min_stopwords: int = MIN_STOPWORDS,
) -> str:
    """DuckDB twin; ``rows_sql`` must yield (id, text).  Same token split,
    same non-overlapping ellipsis scan (RE2 and Java agree on the
    alternation), same ASCII-\\s line strips, same L*-letter test
    (RE2 ``\\pL`` == Java ``\\p{L}``), same distinct-stop-word count."""
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    bullets = ", ".join(f"'{b}'" for b in BULLET_PREFIXES)

    def ratio(num: str, den: str) -> str:
        return (
            f"CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE) / {den} "
            "ELSE 0.0 END"
        )

    mwl = ratio("wchars", "words")
    hashr = ratio("hashes", "words")
    ellr = ratio("ellipses", "words")
    alphaf = ratio("alpha_words", "words")
    bulletf = ratio("bullet_lines", "nlines")
    elllf = ratio("ellipsis_lines", "nlines")
    flags = {
        "word_count_ok": f"(words >= {word_count_min} AND words <= {word_count_max})",
        "mean_word_len_ok": f"(({mwl}) >= {MEAN_WORD_LEN_MIN} AND ({mwl}) <= {MEAN_WORD_LEN_MAX})",
        "hash_ratio_ok": f"(({hashr}) <= {SYMBOL_WORD_RATIO_MAX})",
        "ellipsis_ratio_ok": f"(({ellr}) <= {SYMBOL_WORD_RATIO_MAX})",
        "bullet_lines_ok": f"(({bulletf}) <= {BULLET_LINE_FRAC_MAX})",
        "ellipsis_lines_ok": f"(({elllf}) <= {ELLIPSIS_LINE_FRAC_MAX})",
        "alpha_frac_ok": f"(({alphaf}) >= {ALPHA_WORD_FRAC_MIN})",
        "stopwords_ok": f"(stops >= {min_stopwords})",
    }
    flag_sel = ",\n       ".join(f"{sql} AS {name}" for name, sql in flags.items())
    passes = " AND ".join(flags.values())
    return rf"""
WITH __q_base AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
                     x -> x != '') AS t,
         COALESCE(text, '') AS raw
  FROM ({rows_sql}) r
), __q_ints AS (
  SELECT {id_col},
         CAST(len(t) AS BIGINT) AS words,
         CAST(COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
              AS BIGINT) AS wchars,
         CAST(length(raw) - length(replace(raw, '#', '')) AS BIGINT)
           AS hashes,
         CAST(len(regexp_extract_all(raw, '\.\.\.|…')) AS BIGINT)
           AS ellipses,
         CAST(len(list_filter(t, x -> regexp_matches(x, '\pL'))) AS BIGINT)
           AS alpha_words,
         CAST(len(list_intersect(list_transform(t, x -> lower(x)),
                                 [{stops}])) AS BIGINT) AS stops,
         CAST(len(string_split(raw, chr(10))) AS BIGINT) AS nlines,
         CAST(len(list_filter(string_split(raw, chr(10)),
              l -> list_contains([{bullets}],
                     substr(regexp_replace(l, '^\s+', ''), 1, 1))))
              AS BIGINT) AS bullet_lines,
         CAST(len(list_filter(string_split(raw, chr(10)),
              l -> ends_with(regexp_replace(l, '\s+$', ''), '...')
                   OR ends_with(regexp_replace(l, '\s+$', ''), '…')))
              AS BIGINT) AS ellipsis_lines
  FROM __q_base
)
SELECT {id_col},
       words AS n_words,
       round({mwl}, 6) AS mean_word_len,
       round({hashr}, 6) AS hash_word_ratio,
       round({ellr}, 6) AS ellipsis_word_ratio,
       round({alphaf}, 6) AS alpha_word_frac,
       stops AS n_stopwords,
       round({bulletf}, 6) AS bullet_line_frac,
       round({elllf}, 6) AS ellipsis_line_frac,
       {flag_sel},
       ({passes}) AS passes
FROM __q_ints
"""
