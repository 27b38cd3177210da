"""Property test for the coercion matrix: arbitrary CSV cells -> engine render
must equal a Python model of the reference's ``parse_column_value`` semantics
(/root/reference/etl/etl.py:194-217).

One hypothesis case generates a whole batch of cells, evaluated in a single
DataFrame pass (per-example Spark jobs would be prohibitively slow)."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from carto_etl_spark.config import JobConfig
from carto_etl_spark.functions.coerce import render_value_expr

CFG = JobConfig.from_kwargs(
    columns="v",
    date_columns="d",
    date_format="%d/%m/%Y",
    datetime_format="%d/%m/%Y %H:%M:%S",
)


def model_render(value: str | None, is_date: bool) -> str:
    """Reference semantics, restated from the spec (not copied): escape ->
    date-column dual parse -> float (INFINITY forbidden) -> quoted string;
    None/blank -> NULL."""
    if value is None:
        return "NULL,"
    escaped = value.replace("'", "''")
    if is_date:
        for fmt in ("%d/%m/%Y %H:%M:%S", "%d/%m/%Y"):
            try:
                ts = datetime.strptime(value, fmt)
                return "'" + ts.strftime("%Y-%m-%d %H:%M:%S+00") + "',"
            except ValueError:
                continue
        return "NULL,"
    if escaped.upper() != "INFINITY":
        try:
            return f"{float(escaped)},"
        except ValueError:
            pass
    if not escaped.strip():
        return "NULL,"
    return f"'{escaped}',"


# Printable cells incl. quotes/blank; plus float-looking and date-looking
# pools.  Excluded (documented engine divergences): digit-group underscores
# ("1_0"), exponent letters in free text (Python "9e+99" vs Java "9.0E99"
# rendering is handled via the repr UDF, but bare "9e99"-ish strings in the
# random-text pool are covered by the explicit float pool), unicode spaces.
cell = st.one_of(
    st.text(
        alphabet=st.characters(
            codec="ascii", categories=("L", "N", "P"),
            exclude_characters="_",
        ),
        max_size=12,
    ),
    st.from_regex(r"-?[0-9]{1,8}(\.[0-9]{1,4})?", fullmatch=True),
    st.from_regex(r"[0-3][0-9]/[0-1][0-9]/20[0-2][0-9]", fullmatch=True),
    st.from_regex(
        r"[0-3][0-9]/[0-1][0-9]/20[0-2][0-9] [0-9]{1,2}:[0-5][0-9]:[0-5][0-9]",
        fullmatch=True,
    ),
    st.sampled_from(["", "  ", "INFINITY", "infinity", "NULL", "1e3", "nan"]),
)


def spark_renders(spark, values: list[str | None], column: str) -> list[str]:
    schema = T.StructType(
        [T.StructField("i", T.IntegerType()), T.StructField(column, T.StringType())]
    )
    df = spark.createDataFrame(list(enumerate(values)), schema)
    out = df.select(
        "i", render_value_expr(df, column, CFG).alias("r")
    ).collect()
    return [r["r"] for r in sorted(out, key=lambda r: r["i"])]


def check_batch(spark, values, column, is_date):
    got = spark_renders(spark, values, column)
    want = [model_render(v, is_date) for v in values]
    mism = [
        (v, g, w) for v, g, w in zip(values, got, want) if g != w
    ]
    assert not mism, f"mismatches: {mism[:5]}"


@settings(max_examples=12, deadline=None)
@given(st.lists(cell, min_size=1, max_size=60))
def test_string_float_column_matches_model(spark, values):
    check_batch(spark, values, "v", is_date=False)


@settings(max_examples=12, deadline=None)
@given(st.lists(cell, min_size=1, max_size=60))
def test_date_column_matches_model(spark, values):
    check_batch(spark, values, "d", is_date=True)
