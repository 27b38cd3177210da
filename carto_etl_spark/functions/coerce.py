"""Typed coercion expressions (reference F1-F4) + the SQL-literal render layer.

The reference coerces **per value, dynamically** (/root/reference/etl/etl.py:194-217):
date-column -> dual-format timestamp; else float (locale separators, "INFINITY"
forbidden); else quoted string; missing/blank/non-string -> NULL.  A columnar engine
types the **column**, so this module provides two layers:

1. *Typed* expression builders (``float_expr``, ``timestamp_expr``) returning real
   Spark types — the engine's hot path, all JVM-side, whole-stage-codegen friendly.
2. A *render* layer (``render_value_expr``, mirroring ``parse_column_value``
   etl/etl.py:194-217) that reproduces the reference's rendered SQL literal for
   every value, used by the golden-compat tests and the optional SQL-text sink.
   Here per-value dispatch is fine because the output type is uniformly string.

Everything is built from `pyspark.sql.functions` — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.config import (
    CARTO_DATE_FORMAT,
    FORBIDDEN_FLOAT_VALUES,
    JobConfig,
)

NULL_RENDER = "NULL,"


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# ---------------------------------------------------------------------------
# strptime -> Spark datetime pattern translation
# ---------------------------------------------------------------------------

#: Python strptime directive -> Spark (java.time) pattern.  Single-letter Spark
#: fields accept 1-2 digits, matching strptime's tolerance for non-zero-padded
#: values (e.g. "1/9/2017 2:47:25" parses with both systems).
_STRPTIME_MAP = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "M",
    "%d": "d",
    "%H": "H",
    "%I": "h",
    "%M": "m",
    "%S": "s",
    "%f": "SSSSSS",
    "%p": "a",
    "%j": "DDD",
    "%z": "xx",
    "%%": "'%'",
}


def strptime_to_spark(fmt: str) -> str:
    """Translate a Python strptime format (the reference's config dialect,
    e.g. ``%d/%m/%Y %H:%M:%S``) to a Spark datetime pattern."""
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            text = "".join(literal)
            if any(ch.isalpha() for ch in text):
                text = "'" + text.replace("'", "''") + "'"
            out.append(text)
            literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            directive = fmt[i : i + 2]
            if directive not in _STRPTIME_MAP:
                raise ValueError(f"unsupported strptime directive {directive!r}")
            flush_literal()
            out.append(_STRPTIME_MAP[directive])
            i += 2
        else:
            literal.append(fmt[i])
            i += 1
    flush_literal()
    return "".join(out)


# ---------------------------------------------------------------------------
# Typed expression builders (engine hot path)
# ---------------------------------------------------------------------------

def normalized_float_string(
    col: Column | str,
    comma_separator: str | None = None,
    thousand_separator: str | None = None,
) -> Column:
    """Apply the locale separator rewrites of ``parse_float_value``
    (etl/etl.py:264-271): drop thousand separators, then map the decimal comma
    to ``.``.  Order matters and matches the reference."""
    s = _col(col)
    if thousand_separator:
        s = F.replace(s, F.lit(thousand_separator), F.lit(""))
    if comma_separator:
        s = F.replace(s, F.lit(comma_separator), F.lit("."))
    return s


def float_expr(
    col: Column | str,
    comma_separator: str | None = None,
    thousand_separator: str | None = None,
) -> Column:
    """Locale-aware float parse -> DoubleType (reference F2).

    ``"INFINITY"`` (case-insensitive, full match on the *unstripped* value,
    etl/etl.py:32,265-266) is a forbidden float and yields NULL here; the
    render layer routes it to the string path instead.  Python's ``float()``
    spellings for specials ("inf", "-infinity", "nan", any case) are accepted
    like the reference's float() call; unparseable -> NULL (``try_cast``
    semantics, safe under ANSI mode).  Known divergence: Python's
    digit-group underscores ("1_0") are not accepted.
    """
    raw = _col(col)
    forbidden = F.upper(raw).isin([v.upper() for v in FORBIDDEN_FLOAT_VALUES])
    s = normalized_float_string(raw, comma_separator, thousand_separator)
    up = F.upper(F.trim(s))
    special = (
        F.when(
            up.isin("INF", "INFINITY", "+INF", "+INFINITY"),
            F.lit(float("inf")),
        )
        .when(up.isin("-INF", "-INFINITY"), F.lit(float("-inf")))
        .when(up.isin("NAN", "+NAN", "-NAN"), F.lit(float("nan")))
    )
    return F.when(forbidden, F.lit(None).cast("double")).otherwise(
        F.coalesce(special, s.try_cast("double"))
    )


def timestamp_expr(
    col: Column | str,
    datetime_format: str | None,
    date_format: str | None,
) -> Column:
    """Dual-format timestamp parse (reference F3, etl/etl.py:222-231): try the
    datetime format first, then the date format; NULL when neither matches.
    The reference raises ValueError (-> NULL) unless BOTH formats are
    configured — preserved here."""
    if not datetime_format or not date_format:
        return F.lit(None).cast("timestamp")
    c = _col(col)
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(strptime_to_spark(datetime_format))),
        F.try_to_timestamp(c, F.lit(strptime_to_spark(date_format))),
    )


def typed_value_expr(cfg: JobConfig, column: str) -> Column:
    """Typed coercion for one configured column: timestamp if listed in
    ``date_columns``, else double-if-parseable falling back to string is a
    *render* concern — the typed layer emits double for float-like columns and
    leaves strings alone.  Used by jobs after type inference."""
    if cfg.is_date_column(column):
        return timestamp_expr(column, cfg.datetime_format, cfg.date_format).alias(column)
    return F.col(column)


# ---------------------------------------------------------------------------
# Render layer — reference-golden SQL literals (compat tests + SQL-text sink)
# ---------------------------------------------------------------------------

def escape_expr(col: Column | str) -> Column:
    """SQL single-quote doubling (reference F4, etl/etl.py:233-234)."""
    return F.replace(_col(col), F.lit("'"), F.lit("''"))


_py_float_repr = None


def _python_float_repr() -> "Column":
    """Arrow-vectorized Python ``str(float)`` — the reference renders floats
    with Python's repr ("99999999.0", "1e+20", "nan"), which Spark's
    double->string cast does NOT match (Java switches to "9.9999999E7"-style
    scientific at 1e7).  Only the golden-compat render layer and the optional
    SQL-text sink pay this UDF; the typed hot path never does."""
    global _py_float_repr
    if _py_float_repr is None:
        # explicit-functionType form: `from __future__ import annotations`
        # stringifies hints, which pandas_udf type inference can't resolve
        _py_float_repr = F.pandas_udf(lambda s: s.map(str), "string")
    return _py_float_repr


def render_float_part(value: Column) -> Column:
    """Render a parsed double exactly as Python ``str(float)`` does."""
    return F.concat(_python_float_repr()(value), F.lit(","))


def render_value_expr(
    df: DataFrame,
    column: str,
    cfg: JobConfig,
    parse_float: bool = True,
) -> Column:
    """Column expression reproducing ``parse_column_value``
    (etl/etl.py:194-217) exactly, per value:

    1. column absent from the DataFrame, or not string-typed ("unescapable"
       non-string cell, tests/test_etl.py:40-41) -> ``NULL,``
    2. date column: dual-format parse -> ``'yyyy-MM-dd HH:mm:ss+00',`` else ``NULL,``
    3. float parse (quote-escaped first, separators applied, INFINITY forbidden)
       -> ``<float>,``
    4. string: ``'<escaped>',``; NULL/blank -> ``NULL,``
    """
    dtypes = dict(df.dtypes)
    if column not in dtypes or dtypes[column] != "string":
        return F.lit(NULL_RENDER)

    raw = F.col(column)
    escaped = escape_expr(raw)

    # blank = whitespace-only (the reference's value.strip(), etl/etl.py:213;
    # \s covers ASCII whitespace incl. tabs — exotic unicode spaces diverge)
    string_render = F.when(
        raw.isNull() | raw.rlike(r"^\s*$"), F.lit(NULL_RENDER)
    ).otherwise(F.concat(F.lit("'"), escaped, F.lit("',")))

    if cfg.is_date_column(column):
        ts = timestamp_expr(raw, cfg.datetime_format, cfg.date_format)
        return F.when(
            ts.isNotNull(),
            F.concat(F.lit("'"), F.date_format(ts, CARTO_DATE_FORMAT), F.lit("',")),
        ).otherwise(F.lit(NULL_RENDER))

    if parse_float:
        parsed = float_expr(
            escaped, cfg.float_comma_separator, cfg.float_thousand_separator
        )
        return F.when(parsed.isNotNull(), render_float_part(parsed)).otherwise(
            string_render
        )

    return string_render
